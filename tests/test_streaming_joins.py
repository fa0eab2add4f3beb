"""Stream-stream interval join: the streaming attribution join over two
file-source streams must equal the identical batch join on the same
data, and the interval predicate must actually bound matches."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.streaming.joins import attribution_stream_join
from twitter_followers_patterns_mapreduce_spark.streaming.windows import (
    EVENT_STREAM_SCHEMA,
    events_file_stream,
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def rows():
    """Clicks every 10 min for 5 users; purchases at offsets that land
    inside (minutes) and outside (hours) the 4-hour window."""
    out = []
    eid = 0
    for i in range(60):
        out.append((eid, T0 + dt.timedelta(minutes=10 * i), i % 5, "click", 0.0, "{}"))
        eid += 1
    for i in range(20):
        out.append(
            (eid, T0 + dt.timedelta(minutes=37 * i + 5), i % 5, "purchase", float(i), "{}")
        )
        eid += 1
    return out


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory, rows):
    path = str(tmp_path_factory.mktemp("ss_join"))
    df = spark.createDataFrame(rows, schema=EVENT_STREAM_SCHEMA)
    df.repartition(3).write.mode("overwrite").parquet(path)
    return path


def _batch_expected(spark, rows):
    df = spark.createDataFrame(rows, schema=EVENT_STREAM_SCHEMA)
    c = df.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    p = df.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 4 hours"))
    )
    return c.join(p, cond).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "purchase_value"
    )


def test_stream_stream_join_equals_batch(spark, events_dir, rows):
    clicks = events_file_stream(spark, events_dir).where(F.col("event_type") == "click")
    purchases = events_file_stream(spark, events_dir).where(
        F.col("event_type") == "purchase"
    )
    joined = attribution_stream_join(clicks, purchases)
    assert joined.isStreaming
    run_available_now(joined, "ss_attrib", "append")
    got = sorted(map(tuple, spark.table("ss_attrib").collect()))
    want = sorted(map(tuple, _batch_expected(spark, rows).collect()))
    assert len(want) > 0
    assert got == want


def test_interval_condition_binds(spark, rows):
    # every match respects the window; at least one purchase has a
    # click outside it (proving the predicate excludes something)
    want = _batch_expected(spark, rows).collect()
    for r in want:
        delta = r["purchase_ts"] - r["click_ts"]
        assert dt.timedelta(0) <= delta < dt.timedelta(hours=4)
    n_clicks_per_user = 60 // 5
    assert len(want) < 20 * n_clicks_per_user  # strictly fewer than all-pairs


def test_stream_stream_left_outer_emits_unmatched_after_watermark(
    spark, tmp_path, rows
):
    """LEFT OUTER: clicks with no purchase in-window must emit with
    nulls once the watermark proves no match can arrive.  Outer
    emission is watermark-driven, so the fixture appends two far-future
    sentinel click batches: the first advances the watermark, the
    second gives the evicted-unmatched rows a batch to emit in."""
    from twitter_followers_patterns_mapreduce_spark.streaming.joins import (
        attribution_stream_join_outer,
    )

    path = str(tmp_path / "events")
    # user 7 clicks but never purchases -> guaranteed unmatched rows
    rows = rows + [
        (90000 + i, T0 + dt.timedelta(minutes=15 * i), 7, "click", 0.0, "{}")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, schema=EVENT_STREAM_SCHEMA)
    df.repartition(2).write.mode("overwrite").parquet(path)
    far = T0 + dt.timedelta(days=10)
    for i, off in enumerate((0, 1)):
        sent = spark.createDataFrame(
            [(100000 + i, far + dt.timedelta(hours=off), 999, "click", 0.0, "{}")],
            schema=EVENT_STREAM_SCHEMA,
        )
        sent.coalesce(1).write.mode("append").parquet(path)

    clicks = events_file_stream(spark, path).where(F.col("event_type") == "click")
    purchases = events_file_stream(spark, path).where(
        F.col("event_type") == "purchase"
    )
    joined = attribution_stream_join_outer(clicks, purchases)
    run_available_now(joined, "ss_attrib_outer", "append")
    got = spark.table("ss_attrib_outer").where(F.col("click_id") < 100000)

    # matched rows == the batch inner join
    matched = got.where(F.col("purchase_id").isNotNull())
    want_inner = sorted(map(tuple, _batch_expected(spark, rows).collect()))
    assert sorted(map(tuple, matched.collect())) == want_inner

    # null rows are exactly the batch left-anti clicks (all real clicks
    # are older than watermark once the sentinels land)
    batch_clicks = (
        spark.createDataFrame(rows, schema=EVENT_STREAM_SCHEMA)
        .where(F.col("event_type") == "click")
        .select("event_id")
    )
    matched_ids = {r["click_id"] for r in matched.select("click_id").distinct().collect()}
    unmatched_want = {
        r["event_id"] for r in batch_clicks.collect() if r["event_id"] not in matched_ids
    }
    unmatched_got = {
        r["click_id"] for r in got.where(F.col("purchase_id").isNull()).collect()
    }
    assert unmatched_got == unmatched_want
    assert len(unmatched_want) > 0  # the fixture really exercises the null path
