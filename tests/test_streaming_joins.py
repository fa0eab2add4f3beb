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
