"""transformWithStateInPandas: state carries across micro-batches (the
last Update-mode emission per user equals the whole-batch totals),
proving the ValueState accumulator really is cumulative.

The TWS runtime speaks protobuf to its Python driver worker; the whole
module skips where ``google.protobuf`` is absent (this container) —
``applyInPandasWithState`` (tests/test_streaming_stateful.py) is the
stateful path exercised everywhere.
"""

from __future__ import annotations

import datetime as dt

import pytest

pytest.importorskip("google.protobuf", reason="TWS runtime requires protobuf")
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.streaming.tws import running_totals_stream
from twitter_followers_patterns_mapreduce_spark.streaming.windows import EVENT_STREAM_SCHEMA

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def rows():
    return [
        (i, T0 + dt.timedelta(minutes=i), i % 3, "click", float(i), "{}")
        for i in range(60)
    ]


def test_tws_running_totals_accumulate_across_batches(spark, tmp_path_factory, rows):
    path = str(tmp_path_factory.mktemp("tws_events"))
    df = spark.createDataFrame(rows, schema=EVENT_STREAM_SCHEMA)
    # 3 files → with maxFilesPerTrigger=1, three separate micro-batches
    df.repartition(3).write.mode("overwrite").parquet(path)

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        running_totals_stream(stream)
        .writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # memory sink accretes one row per (user, batch); the LAST row per
    # user is the final running total — compare against the batch truth
    got = spark.sql(
        """SELECT user_id, n_events, sum_value FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
             FROM tws_totals) WHERE rn = 1"""
    ).collect()
    want = {
        r["user_id"]: r
        for r in spark.createDataFrame(rows, schema=EVENT_STREAM_SCHEMA)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    assert len(got) == 3
    for r in got:
        assert r["n_events"] == want[r["user_id"]]["n"]
        assert r["sum_value"] == pytest.approx(want[r["user_id"]]["sv"])

    # state accumulated over MULTIPLE emissions per user (≥2 batches saw
    # each user), not a single catch-all batch
    n_emissions = spark.table("tws_totals").count()
    assert n_emissions > 3
