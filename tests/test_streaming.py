"""Batch/stream equivalence for the structured-streaming window forms:
the streaming tumbling aggregation over a file source must produce
exactly the batch ``tumbling_hourly`` result on the same data, and
append-mode watermarking must emit precisely the watermark-closed
windows.
"""

from __future__ import annotations

import datetime as dt

import pytest

from twitter_followers_patterns_mapreduce_spark.operators.events import tumbling_hourly
from twitter_followers_patterns_mapreduce_spark.streaming.windows import (
    events_file_stream,
    run_available_now,
    tumbling_hourly_stream,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def event_rows():
    """~90 deterministic events over 3 hours, two event types."""
    rows = []
    for i in range(90):
        rows.append(
            (
                i,
                T0 + dt.timedelta(minutes=2 * i, seconds=i % 7),
                i % 5,
                "click" if i % 3 else "view",
                float(i) / 4.0,
                '{"k": %d}' % (i % 10),
            )
        )
    return rows


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory, event_rows):
    """Events parquet split into 3 files → 3 streaming micro-batches."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    from twitter_followers_patterns_mapreduce_spark.streaming.windows import EVENT_STREAM_SCHEMA

    df = spark.createDataFrame(event_rows, schema=EVENT_STREAM_SCHEMA)
    df.repartition(3).write.mode("overwrite").parquet(path)
    return path


def test_stream_complete_equals_batch(spark, events_dir, event_rows):
    from twitter_followers_patterns_mapreduce_spark.streaming.windows import EVENT_STREAM_SCHEMA

    stream = events_file_stream(spark, events_dir)
    assert stream.isStreaming
    run_available_now(tumbling_hourly_stream(stream), "tumbling_complete", "complete")
    got = sorted(map(tuple, spark.table("tumbling_complete").collect()))

    batch_df = spark.createDataFrame(event_rows, schema=EVENT_STREAM_SCHEMA)
    want = sorted(map(tuple, tumbling_hourly(batch_df).collect()))
    assert got == want


def test_stream_append_emits_watermark_closed_windows(spark, events_dir, event_rows):
    """Append mode + 1h watermark: max ts ≈ 02:58 → watermark ≈ 01:58 →
    only windows ending ≤ 01:58 (the 00:xx and 01:xx hours... end 01:00,
    02:00 > 01:58? no — window [00:00,01:00) ends 01:00 ≤ 01:58 emits;
    [01:00,02:00) ends 02:00 > 01:58 stays open).  So exactly the first
    hour's windows emit."""
    from twitter_followers_patterns_mapreduce_spark.streaming.windows import EVENT_STREAM_SCHEMA

    stream = events_file_stream(spark, events_dir)
    run_available_now(
        tumbling_hourly_stream(stream, watermark="1 hour"), "tumbling_append", "append"
    )
    got = sorted(map(tuple, spark.table("tumbling_append").collect()))

    batch_df = spark.createDataFrame(event_rows, schema=EVENT_STREAM_SCHEMA)
    closed = [
        t
        for t in map(tuple, tumbling_hourly(batch_df).collect())
        if t[0] == "2024-01-01 00:00:00"
    ]
    assert got == sorted(closed)
    assert len(got) == 2  # click + view rows for hour 0


def test_stream_static_join_equals_batch(spark, events_dir, event_rows):
    from twitter_followers_patterns_mapreduce_spark.streaming.windows import (
        segment_window_stream,
    )

    segs = spark.createDataFrame(
        [(u, f"seg{u % 2}") for u in {r[2] for r in event_rows}],
        schema="user_id LONG, segment STRING",
    )
    stream = events_file_stream(spark, events_dir)
    run_available_now(segment_window_stream(stream, segs), "seg_windows", "complete")
    got = {
        (r["window_start"], r["segment"]): r["n_events"]
        for r in spark.sql("SELECT * FROM seg_windows").collect()
    }
    from twitter_followers_patterns_mapreduce_spark.streaming.windows import (
        EVENT_STREAM_SCHEMA,
    )

    batch = spark.createDataFrame(event_rows, schema=EVENT_STREAM_SCHEMA)
    expected = {
        (r["window_start"], r["segment"]): r["n_events"]
        for r in segment_window_stream(batch, segs).collect()
    }
    assert got == expected and len(got) > 0


def test_stream_drops_event_after_window_state_evicted(spark, tmp_path):
    """Spark's late-data guarantee demonstrated precisely: a late event
    merging into STILL-LIVE window state is accepted (watermark is an
    eviction bound, not an input filter), but once the watermark has
    EVICTED a window's state — the window emitted in a prior batch — a
    later too-late arrival is dropped: no duplicate window row, count
    unchanged."""
    import time

    from twitter_followers_patterns_mapreduce_spark.streaming.windows import (
        EVENT_STREAM_SCHEMA,
        run_available_now,
        tumbling_hourly_stream,
    )

    path = tmp_path / "late_events"
    path.mkdir()
    # batch 0: hour-0 event + 03:00 event → watermark after batch = 02:00
    b1 = [
        (1, T0 + dt.timedelta(minutes=10), 1, "click", 1.0, "{}"),
        (2, T0 + dt.timedelta(hours=3), 1, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(b1, schema=EVENT_STREAM_SCHEMA).coalesce(1).write.parquet(
        str(path / "b1")
    )
    time.sleep(1.1)  # file mtime orders the micro-batches
    # batch 1: fresh event; watermark 02:00 now EVICTS the hour-0 window
    # (emitted with n=1, state gone)
    b2 = [(3, T0 + dt.timedelta(hours=3, minutes=10), 1, "click", 1.0, "{}")]
    spark.createDataFrame(b2, schema=EVENT_STREAM_SCHEMA).coalesce(1).write.parquet(
        str(path / "b2")
    )
    time.sleep(1.1)
    # batch 2: too-late event for the evicted hour-0 window → dropped
    b3 = [(4, T0 + dt.timedelta(minutes=20), 1, "click", 1.0, "{}")]
    spark.createDataFrame(b3, schema=EVENT_STREAM_SCHEMA).coalesce(1).write.parquet(
        str(path / "b3")
    )

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(path / "*"))
    )
    run_available_now(
        tumbling_hourly_stream(stream, watermark="1 hour"), "late_drop", "append"
    )
    rows = [
        r
        for r in spark.table("late_drop").collect()
        if str(r["window_start"]).startswith("2024-01-01 00:")
    ]
    assert len(rows) == 1  # emitted once, never re-emitted for the late row
    assert rows[0]["n_events"] == 1  # the too-late event (id 4) was dropped


def test_staged_events_dir_relative_path_resolves(tmp_path):
    """Regression: a RELATIVE sf_dir must still stage a resolvable
    symlink — the relative form once produced a dangling link that
    FileStreamSource read as an empty directory (zero-row stream)."""
    import os

    from twitter_followers_patterns_mapreduce_spark.plans.event_queries import (
        _staged_events_dir,
    )

    os.makedirs(tmp_path / "sfX", exist_ok=True)
    (tmp_path / "sfX" / "events.parquet").write_bytes(b"stub")
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        d = _staged_events_dir("sfX")  # relative on purpose
    finally:
        os.chdir(cwd)
    link = os.path.join(d, "events.parquet")
    assert os.path.islink(link)
    assert os.path.isabs(os.readlink(link))
    assert os.path.exists(link)  # resolves regardless of cwd


def test_top_users_stream_multibatch_equals_batch(spark, tmp_path):
    """The leaderboard must survive incremental arrival: drain the same
    events as 2 micro-batches and as 1, both must equal the batch
    ranking (complete mode re-emits from aggregate state)."""
    import os

    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.streaming.windows import (
        run_available_now,
        top_users_stream,
    )

    rows = [(i, f"2024-01-01 0{i % 10}:00:00", i % 7, "click", float(i % 13), "{}")
            for i in range(200)]
    batch = spark.createDataFrame(
        rows, schema="event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    batch.where("event_id % 2 = 0").coalesce(1).write.parquet(feed + "/f0")
    batch.where("event_id % 2 = 1").coalesce(1).write.parquet(feed + "/f1")
    # file stream over the two subdirs' files
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/*")
    )
    run_available_now(top_users_stream(stream, k=5), "tus_test_sink",
                      output_mode="complete", state_partitions=4)
    got = [(r["user_id"], r["n_events"], r["total_value"])
           for r in spark.table("tus_test_sink").collect()]
    want = [
        (r["user_id"], r["n_events"], r["total_value"])
        for r in top_users_stream(batch, k=5).collect()  # same body, batch df
    ]
    assert got == want and len(got) == 5
    # leaderboard is sorted desc with id tiebreak
    assert got == sorted(got, key=lambda t: (-t[2], t[0]))
