"""Streaming dedup (dropDuplicatesWithinWatermark): duplicates across
micro-batches within the watermark horizon are dropped and the surviving
key-set equals batch dropDuplicates on the same replayed input."""

from __future__ import annotations

import datetime as dt

import pytest

from twitter_followers_patterns_mapreduce_spark.streaming.dedup import dedup_events_stream
from twitter_followers_patterns_mapreduce_spark.streaming.windows import (
    events_file_stream,
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"


def at(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def dup_rows():
    return [
        # batch 1
        [(1, at(0), 7, "click", 1.0, "{}"), (2, at(5), 7, "click", 2.0, "{}")],
        # batch 2: event 1 replayed 10 min later (inside 2h horizon) + new
        [(1, at(10), 7, "click", 1.0, "{}"), (3, at(12), 8, "view", 3.0, "{}")],
        # batch 3: events 2 and 3 replayed, one new
        [(2, at(20), 7, "click", 2.0, "{}"), (3, at(25), 8, "view", 3.0, "{}"),
         (4, at(30), 9, "purchase", 4.0, "{}")],
    ]


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory, dup_rows):
    d = tmp_path_factory.mktemp("dup_stream")
    for i, rows in enumerate(dup_rows):
        spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.parquet(
            str(d / f"batch_{i}")
        )
    return str(d) + "/batch_*"


def test_stream_dedup_matches_batch(spark, dup_dir, dup_rows):
    stream = events_file_stream(spark, dup_dir)
    run_available_now(dedup_events_stream(stream), "dedup_stream_t", output_mode="append")
    got = spark.sql("SELECT event_id FROM dedup_stream_t").collect()
    ids = sorted(r["event_id"] for r in got)
    assert ids == [1, 2, 3, 4]  # every duplicate dropped, each key once

    flat = [r for b in dup_rows for r in b]
    batch = spark.createDataFrame(flat, schema=SCHEMA).dropDuplicates(["event_id"])
    assert ids == sorted(r["event_id"] for r in batch.select("event_id").collect())


def test_foreach_batch_ingest_dedups_across_batches(spark, tmp_path):
    """Streaming corpus ingestion: batch 2's near-duplicate of a batch-1
    doc is rejected, its genuinely-new doc admitted — cross-batch state
    is the corpus parquet itself."""
    import time

    from twitter_followers_patterns_mapreduce_spark.streaming.dedup import (
        ingest_dedup_foreach_batch,
    )

    base = "the quick brown fox jumps over the lazy dog again and again every day"
    near = base.replace("day", "night")  # high 3-shingle jaccard vs base
    fresh = "completely different content about spark engines and parquet files here"

    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id LONG, text STRING"

    # batch 1 lands first
    spark.createDataFrame([(1, base), (2, fresh)], schema=schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(in_dir / "b1"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q = ingest_dedup_foreach_batch(spark, stream, corpus, ckpt)
    q.awaitTermination()

    # batch 2: one near-dup of doc 1, one new doc
    spark.createDataFrame([(3, near), (4, "fully novel text with nothing shared")],
                          schema=schema).coalesce(1).write.mode("overwrite").parquet(
        str(in_dir / "b2")
    )
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q2 = ingest_dedup_foreach_batch(spark, stream2, corpus, ckpt)
    q2.awaitTermination()
    time.sleep(0.2)

    ids = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert ids == [1, 2, 4], ids


def test_self_union_stream_dedups_to_base(spark, tmp_path):
    """The registered events_dedup_streamed shape: the same dir read by
    two file sources unioned (every event arrives twice) collapses back
    to the singleton base set."""
    rows = [(i, at(i), i % 3, "click", float(i), "{}") for i in range(6)]
    d = tmp_path / "base"
    spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.parquet(str(d))
    doubled = events_file_stream(spark, str(d)).unionByName(
        events_file_stream(spark, str(d))
    )
    run_available_now(
        dedup_events_stream(doubled), "dedup_union_t", output_mode="append"
    )
    got = sorted(r["event_id"] for r in spark.table("dedup_union_t").collect())
    assert got == list(range(6))
