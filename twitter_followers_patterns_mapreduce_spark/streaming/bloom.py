"""Streamed Bloom runtime-filter maintenance (twentieth gated
streaming class) — the ``join_bloom_prefilter`` word table kept
continuously fresh as dim-table rows arrive, so the fact-side prune is
always ready without ever rebuilding the filter from the full dim
history.

Pattern: ``foreachBatch`` + mergeable-state IVM.  ``bit_or`` over
word-packed lanes is a COMMUTATIVE MONOID (``operators/planner.py::
bloom_build_words``), so per batch the filter update is: anti-join the
batch's predicate-passing keys against the standing key set (genuinely
new keys only — re-arrivals are no-ops), build probe words for the
|Δ| new keys alone, and fold them into the standing word table by
union → re-aggregate ``bit_or``.  Per-batch cost is |Δ|·k_hash probe
rows + a ≤m/32-row merge; the word table is fixed-size regardless of
stream length.  Deletions would need a counting filter — inserts-only
here, like every Bloom filter in production join pruning.

State follows the keep-2 replay-idempotent version discipline of
``streaming/graph.py`` (two sub-tables, ``dkeys`` + ``words``, written
in parallel threads like ``streaming/triangles.py``).

Order-independence gate: set union and bit_or are both commutative, so
the drained state equals the one-shot build under ANY chunking and the
registered query shares ``bloom_prefilter_oracle``'s full-recompute
SQL directly — the fact-side scoring (``bloom_score``) runs against
the standing state, and the no-false-negative soundness boolean is the
gate companion.

Reference parity note: the reference (Twitter-Followers-Patterns
MapReduce) is batch-only; this is extension surface (SURVEY.md §2.7).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators.planner import (
    bloom_build_words,
    bloom_score,
)
from twitter_followers_patterns_mapreduce_spark.streaming.graph import (
    _latest_version,
    _prune_versions,
)

#: Schema of staged dim-feed files (part-key + the predicate column).
DIM_FEED_SCHEMA = "p_partkey LONG, p_size LONG"


def dim_file_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source dim-arrival stream, one staged file per micro-batch."""
    return (
        spark.readStream.schema(DIM_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def bloom_apply_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    dim_pred: str = "p_size < 15",
    dim_key: str = "p_partkey",
    m_bits: int = 16384,
    k_hash: int = 4,
    batch_ids: list[int] | None = None,
) -> None:
    """Drain ``stream`` (availableNow) into the versioned key-set +
    word-table state: per batch one anti-join, a |Δ|-key probe build,
    and a ≤m/32-row bit_or merge.  Blocks until drained."""
    dkeys_dir = os.path.join(state_dir, "dkeys")
    words_dir = os.path.join(state_dir, "words")

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_ids is not None:
            batch_ids.append(batch_id)
        bkeys = (
            batch_df.where(dim_pred)
            .selectExpr(f"CAST({dim_key} AS BIGINT) AS k")
            .distinct()
        )
        prev = _latest_version(dkeys_dir, below=batch_id)
        if prev is None:
            old_keys = None
            new_keys = bkeys.localCheckpoint(eager=False)
        else:
            old_keys = spark.read.parquet(f"{dkeys_dir}/v={prev}")
            new_keys = bkeys.join(old_keys, "k", "left_anti").localCheckpoint(
                eager=False
            )
        delta_words = bloom_build_words(new_keys, m_bits, k_hash)
        if prev is None:
            merged_keys, merged_words = new_keys, delta_words
        else:
            old_words = spark.read.parquet(
                f"{words_dir}/v={_latest_version(words_dir, below=batch_id)}"
            )
            merged_keys = old_keys.unionByName(new_keys)
            merged_words = (
                old_words.unionByName(delta_words)
                .groupBy("word_idx")
                .agg(F.expr("bit_or(word)").alias("word"))
            )

        def _write(args: tuple) -> None:
            df, path = args
            df.write.mode("overwrite").parquet(path)

        writes = [
            (merged_keys, f"{dkeys_dir}/v={batch_id}"),
            (merged_words, f"{words_dir}/v={batch_id}"),
        ]
        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            for fut in [pool.submit(_write, w) for w in writes]:
                fut.result()
        _prune_versions(dkeys_dir)
        _prune_versions(words_dir)

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def bloom_state(spark: SparkSession, state_dir: str) -> tuple[DataFrame, DataFrame]:
    """(dkeys, words) — latest committed versions of the standing filter."""
    dkeys_dir = os.path.join(state_dir, "dkeys")
    words_dir = os.path.join(state_dir, "words")
    vk = _latest_version(dkeys_dir)
    vw = _latest_version(words_dir)
    if vk is None or vw is None:
        raise FileNotFoundError(f"no bloom state at {state_dir}")
    return (
        spark.read.parquet(f"{dkeys_dir}/v={vk}"),
        spark.read.parquet(f"{words_dir}/v={vw}"),
    )


def bloom_score_from_state(
    spark: SparkSession,
    state_dir: str,
    fact: DataFrame,
    fact_key: str,
    m_bits: int = 16384,
    k_hash: int = 4,
) -> DataFrame:
    """The 1-row prefilter summary of ``fact`` probed against the
    STANDING filter state — identical contract to the batch twin."""
    dkeys, words = bloom_state(spark, state_dir)
    return bloom_score(fact, dkeys, words, fact_key, m_bits, k_hash)
