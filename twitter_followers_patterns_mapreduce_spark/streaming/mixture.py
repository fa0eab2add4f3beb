"""Streaming domain-mixture IVM — per-source corpus totals maintained
as versioned micro-batch state (seventeenth gated streaming class).

``operators/corpus.py::corpus_mixture_ivm`` proves delta maintenance ≡
full recompute for ONE base+delta step; this module runs the same
mergeable state through a real micro-batch stream: each batch
aggregates its slice to |sources| rows and folds them into the standing
(source, n_docs, n_chars) table by union → re-aggregate (the additive
-state rule shared with ``orders_monthly_ivm`` / ``join_delta_ivm``).
Per-batch cost is |batch| + |sources|; state is |sources| rows
regardless of stream length — the cheapest possible standing mixture.

State follows the keep-2 replay-idempotent version discipline of
``streaming/scd2.py``: each batch merges against the version strictly
below its own id and overwrites its own ``v=<batch_id>``, so a
crash-replayed batch re-derives (never double-counts) its slice.

The gate: per-source totals form a commutative monoid, so the streamed
state is ORDER-FREE and equals the one-shot aggregate over the full
table — the registered query therefore shares
``corpus_mixture_ivm_oracle``'s full-recompute SQL directly, with no
staged-recursion unroll (contrast ``dedup_admit.py``, whose greedy
admission IS order-dependent and needs the per-stage CTE oracle).

Reference parity note: the reference (Twitter-Followers-Patterns
MapReduce) is batch-only; this is extension surface (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.streaming.graph import (
    _latest_version,
    _prune_versions,
)

#: Schema of staged document-feed files (the mixture needs no text).
DOCS_MIX_SCHEMA = "doc_id LONG, source STRING, n_chars LONG"


def docs_mix_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source document-metadata stream, one staged file per batch."""
    return (
        spark.readStream.schema(DOCS_MIX_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _source_counts(df: DataFrame) -> DataFrame:
    return df.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )


def mixture_apply_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    batch_ids: list[int] | None = None,
) -> None:
    """Drain ``stream`` (availableNow) into the versioned per-source
    state: per batch, one |batch| aggregation + a 2·|sources|-row
    merge aggregation.  Blocks until drained."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_ids is not None:
            batch_ids.append(batch_id)
        bstate = _source_counts(batch_df)
        prev = _latest_version(state_dir, below=batch_id)
        if prev is not None:
            old = spark.read.parquet(f"{state_dir}/v={prev}")
            merged = (
                old.unionByName(bstate)
                .groupBy("source")
                .agg(
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.sum("n_chars").cast("long").alias("n_chars"),
                )
            )
        else:
            merged = bstate
        merged.write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")
        _prune_versions(state_dir)

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def mixture_recipe_from_state(
    spark: SparkSession, state_dir: str, keep_div: int = 2
) -> DataFrame:
    """The temperature recipe recomputed from the standing |sources|-row
    state — latest committed version, O(|sources|) refresh."""
    from twitter_followers_patterns_mapreduce_spark.operators.corpus import (
        mixture_recipe_from_counts,
    )

    v = _latest_version(state_dir)
    if v is None:
        raise FileNotFoundError(f"no mixture state at {state_dir}")
    return mixture_recipe_from_counts(
        spark.read.parquet(f"{state_dir}/v={v}"), keep_div
    )
