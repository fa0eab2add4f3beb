"""Observability + streaming exactly-once guarantees.

1. ``observed``/``funnel`` collect ingest metrics as a side effect of
   the single action the job already runs — no second scan.
2. A checkpointed file-to-file streaming query restarted over a grown
   source directory processes each input file exactly once (offsets in
   the checkpoint), so the sink never double-counts — the production
   incremental-ingest contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.sources.observe import funnel, observed

DOCS_SCHEMA = "doc_id LONG, text STRING"


def test_observed_metrics_ride_the_single_action(spark):
    df = spark.createDataFrame(
        [(1, "keep"), (2, None), (3, "keep too"), (4, None)], schema=DOCS_SCHEMA
    )
    inst, obs = observed(df, "ingest", null_check="text")
    kept = inst.where(F.col("text").isNotNull())
    assert kept.count() == 2  # the one and only action
    assert obs.get == {"rows": 4, "null_text": 2}


def test_funnel_reports_per_stage_survival(spark):
    df = spark.createDataFrame(
        [(i, "x" * i) for i in range(1, 11)], schema=DOCS_SCHEMA
    )
    s1 = df.where(F.length("text") >= 3)        # 8 survive
    s2 = s1.where(F.length("text") >= 8)        # 3 survive
    (d0, d1, d2), (o0, o1, o2) = funnel(("raw", df), ("len3", s1), ("len8", s2))
    # funnel() instruments each stage lazily; drive each frame once
    assert d0.count() == 10 and d1.count() == 8 and d2.count() == 3
    assert (o0.get["rows"], o1.get["rows"], o2.get["rows"]) == (10, 8, 3)


# ---------------------------------------------------------------------------
# checkpointed restart: exactly-once over a growing file source
# ---------------------------------------------------------------------------


def _run_stream(spark, src, sink, ckpt):
    q = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("text_len", F.length("text"))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpointed_restart_is_exactly_once(spark, tmp_path):
    src, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    batch1 = spark.createDataFrame([(i, f"doc {i}") for i in range(5)], schema=DOCS_SCHEMA)
    batch1.coalesce(1).write.mode("append").parquet(src)

    _run_stream(spark, src, sink, ckpt)
    assert spark.read.parquet(sink).count() == 5

    # source grows; restart from the SAME checkpoint
    batch2 = spark.createDataFrame([(i, f"doc {i}") for i in range(5, 8)], schema=DOCS_SCHEMA)
    batch2.coalesce(1).write.mode("append").parquet(src)
    _run_stream(spark, src, sink, ckpt)

    out = spark.read.parquet(sink)
    # exactly once: 8 rows total, no re-processing of batch1's file
    assert out.count() == 8
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(8))

    # idempotent: a restart with NO new data emits nothing new
    _run_stream(spark, src, sink, ckpt)
    assert spark.read.parquet(sink).count() == 8
