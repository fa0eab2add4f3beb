"""Incremental SCD2 maintenance from a change-feed stream.

The batch build (`operators/relational.py::orders_scd2_history`) folds
the WHOLE feed at once; a warehouse ingests the feed in arrivals.  This
module applies each micro-batch with a ``foreachBatch`` merge that
rebuilds ONLY the affected keys' validity intervals against the
accumulated dimension state — the engine-side semantics of ``MERGE
INTO`` on a dimension table, expressed with vanilla parquet state (a
table format with ACID upserts replaces the versioned-directory step at
scale, nothing else changes).

Order-insensitive by construction: versions ride IN the feed rows, and
the merge re-folds ``old versions ∪ batch versions`` per affected key,
so any batching of the same feed converges to the same table — pinned
by the shared DuckDB oracle (stream == batch == oracle) and by
``tests/test_streaming_scd2.py``.

Replay-idempotent by construction (same contract as ``counts.py`` /
``graph.py``): state lives in versioned ``v=<batch_id>`` dirs gated by
parquet ``_SUCCESS`` markers.  A batch merges against the latest
version STRICTLY BELOW its own batch_id and overwrites its own version
dir — so a batch replayed after a crash between state write and
checkpoint commit re-derives from the same predecessor and re-produces
(not duplicates) its output.  Retention: after each committed write
only the newest two versions are kept (``_prune_versions`` — the new
version plus the predecessor a crash-replay merges against), so disk
stays O(2 × dimension), not O(batches).  The previous
delete-``current``-then-rename scheme was not replay-idempotent: a replayed batch would re-unfold already-merged
rows and union the batch rows a second time, and a crash inside the
rmtree/rename window could lose the state dir entirely.

Why ``foreachBatch`` and not a stateful operator: interval folding
needs a per-key window over ALL versions accumulated so far — streaming
state stores can't express the rewrite of previously-emitted rows
(closing an interval), while a merge against batch-engine state can.
The reference is batch-only (SURVEY.md §2.7); its closest analogue is
re-running the whole job on the grown input.

Scale shape per batch: one broadcast semi/anti-join of the state
against the batch's (small) key set + the interval window over affected
keys only — cost ∝ |batch| + |touched history|, never ∝ |dimension|
(with a table format the anti-join side becomes the format's
deletion-vector write; here the untouched rows are rewritten because
parquet has no in-place delete, which is the documented local stand-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators.relational import fold_scd2
from twitter_followers_patterns_mapreduce_spark.streaming.graph import _latest_version, _prune_versions

#: Schema of staged feed files (vf matches the parquet o_orderdate type).
FEED_SCHEMA = "o_orderkey LONG, version INT, priority STRING, vf TIMESTAMP_NTZ"


def scd2_feed_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source change-feed stream: one staged file per micro-batch
    (``maxFilesPerTrigger=1``), the incremental-ingest replay shape."""
    return (
        spark.readStream.schema(FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def read_scd2_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current SCD2 dimension — latest committed ``v=<id>`` dir."""
    v = _latest_version(state_dir)
    if v is None:
        raise FileNotFoundError(f"no SCD2 state at {state_dir}")
    return spark.read.parquet(f"{state_dir}/v={v}")


def scd2_apply_stream(
    spark: SparkSession,
    feed: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    batch_ids: list[int] | None = None,
) -> None:
    """Drain ``feed`` (availableNow) into the SCD2 state under
    ``state_dir/v=<batch_id>`` via per-batch incremental merges.  Blocks
    until drained.  ``batch_ids`` (if given) collects the micro-batch
    ids that ran — test hook proving multi-batch incrementality."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_ids is not None:
            batch_ids.append(batch_id)
        new_rows = batch_df.select(
            "o_orderkey", "version", "priority", F.col("vf").cast("timestamp_ntz")
        )
        # strictly-below: a RETRIED batch (state written, checkpoint not
        # yet committed, crash, replay with the same batch_id) must merge
        # against its predecessor, never read its own half-committed
        # output — that replay is exactly what makes the version idempotent
        prev = _latest_version(state_dir, below=batch_id)
        if prev is not None:
            state = spark.read.parquet(f"{state_dir}/v={prev}")
            keys = new_rows.select("o_orderkey").distinct()
            untouched = state.join(F.broadcast(keys), "o_orderkey", "left_anti")
            # un-fold touched keys' intervals back to feed rows; the
            # re-fold recomputes their valid_to/is_current from scratch
            old_feed = state.join(F.broadcast(keys), "o_orderkey", "left_semi").select(
                "o_orderkey",
                "version",
                "priority",
                F.col("valid_from").cast("timestamp_ntz").alias("vf"),
            )
            out = untouched.unionByName(fold_scd2(old_feed.unionByName(new_rows)))
        else:
            out = fold_scd2(new_rows)
        out.write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")
        _prune_versions(state_dir)

    q = (
        feed.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
