"""Streaming deduplication — the streaming form of the exact-dedup
family in ``operators/dedup.py``.

``dropDuplicatesWithinWatermark`` keeps dedup state only for the
watermark horizon: a duplicate arriving within the horizon is dropped,
and state for keys older than the watermark is evicted — bounded
memory on an unbounded stream.  Plain ``dropDuplicates`` on a stream
would grow state forever (every key seen since the epoch); the
watermarked form is the only shape that survives at 100 TB/day ingest.

Batch/stream parity: on a replayed bounded input whose duplicates all
arrive within the horizon, the output key-set equals batch
``dropDuplicates`` — pinned by tests/test_streaming_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exact streaming dedup on ``event_id`` within the watermark
    horizon.  First arrival wins; later duplicates inside the horizon
    are dropped; state is evicted as the watermark advances."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def ingest_dedup_foreach_batch(
    spark,
    stream: DataFrame,
    corpus_path: str,
    checkpoint: str,
    threshold: float = 0.5,
):
    """Streaming corpus ingestion with cross-batch near-dedup — the
    canonical ``foreachBatch`` production pattern: each micro-batch of
    candidate documents is admitted against the corpus ACCUMULATED SO
    FAR (exact md5 + MinHash-LSH band candidates, the same admit rule
    as ``operators/dedup.py::dedup_incremental``), and only kept docs
    append to the corpus parquet.

    Why ``foreachBatch`` and not a stateful operator: the admit check
    needs an arbitrary batch join (bands ⋈ accumulated corpus bands),
    which streaming state stores cannot express — ``foreachBatch``
    hands each micro-batch to the full batch engine where every
    operator (and its plan properties) works unchanged.  State is the
    corpus itself: no store to size, restart-safe via the checkpoint +
    idempotent parquet append semantics at the batch boundary.

    Scale: per batch, cost is |batch| shingling + an equi-join against
    the corpus band index — the corpus side prunes to matching bands,
    never a full rescan of history (and the band projection can be
    bucketed/Z-ordered on disk; see sources/writers.py).

    Returns the StreamingQuery.
    """
    import os

    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        dedup_incremental,
    )

    def admit(batch: DataFrame, batch_id: int) -> None:
        b = batch.persist()
        if not os.path.exists(corpus_path):
            # first batch bootstraps the corpus: self-dedup by keeping
            # the lowest doc_id per exact hash
            first = b.withColumn("_h", F.md5("text"))
            keep = first.groupBy("_h").agg(F.min("doc_id").alias("doc_id"))
            (
                first.join(keep, ["_h", "doc_id"], "left_semi")
                .drop("_h")
                .write.mode("overwrite")
                .parquet(corpus_path)
            )
            b.unpersist()
            return
        corpus = spark.read.parquet(corpus_path)
        # dedup_incremental's contract: one frame, even ids = existing /
        # odd = new.  Here the split is real (corpus vs batch), so tag
        # via a union with disjoint surrogate parity — simplest: reuse
        # its band/verify rule directly through a temp union where the
        # batch ids are guaranteed distinct from corpus ids.
        tagged = corpus.select("doc_id", "text").withColumn("_new", F.lit(False)).unionByName(
            b.select("doc_id", "text").withColumn("_new", F.lit(True))
        )
        verdict = dedup_incremental(
            tagged, threshold=threshold, new_predicate=F.col("_new")
        )
        kept_ids = verdict.where(F.col("status") == "kept").select("doc_id")
        b.join(kept_ids, "doc_id", "left_semi").write.mode("append").parquet(corpus_path)
        b.unpersist()

    return (
        stream.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
