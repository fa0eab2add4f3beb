"""Incremental streaming SCD2 apply — multi-batch incrementality,
batch/stream parity, and replay idempotency (streaming/scd2.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators.relational import (
    orders_scd2_history,
)
from twitter_followers_patterns_mapreduce_spark.plans.relational_queries import (
    _stage_scd2_feed,
)
from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table
from twitter_followers_patterns_mapreduce_spark.streaming.scd2 import (
    read_scd2_state,
    scd2_apply_stream,
    scd2_feed_stream,
)

SF = "/root/testdata/sf0.001"


def _rows(df, cols=None):
    cols = cols or [
        "o_orderkey", "version", "priority", "valid_from", "valid_to", "is_current"
    ]
    return sorted(tuple(r) for r in df.select(cols).collect())


def test_streamed_scd2_runs_incrementally_and_matches_batch(spark, tmp_path):
    """The replay must run as exactly 2 micro-batches (one per staged
    tier, maxFilesPerTrigger=1) and the final state must equal the
    one-shot batch fold — i.e. batch 1's merge correctly re-folded the
    intervals batch 0 had already written."""
    feed_dir, _, _ = _stage_scd2_feed(spark, SF)
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    batch_ids: list[int] = []
    stream = (
        spark.readStream.schema(
            "o_orderkey LONG, version INT, priority STRING, vf TIMESTAMP_NTZ"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    scd2_apply_stream(spark, stream, state_dir, ckpt, batch_ids=batch_ids)
    assert batch_ids == [0, 1]

    final = read_scd2_state(spark, state_dir)
    batch = orders_scd2_history(load_table(spark, SF, "orders"))
    got, want = _rows(final), _rows(batch)
    assert got == want and len(got) > 0
    # updated keys must show the merge's rewrite-of-emitted-rows: a
    # CLOSED version-0 interval (batch 0 wrote it open; batch 1's merge
    # closed it)
    assert final.where((F.col("version") == 0) & ~F.col("is_current")).count() > 0


def test_streamed_scd2_restart_resumes_from_checkpoint(spark, tmp_path):
    """The real ingest lifecycle: the base file arrives, the query
    drains and STOPS; the update file arrives later and a NEW query
    (same checkpoint) drains again.  The second drain must process
    ONLY the new file (checkpoint-tracked progress, batch ids resume
    at 1) and converge to the batch fold."""
    import shutil

    staged, _, _ = _stage_scd2_feed(spark, SF)
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    shutil.copy(os.path.join(staged, "f0.parquet"), feed_dir)

    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")  # SHARED across both drains
    ids_a: list[int] = []
    scd2_apply_stream(spark, scd2_feed_stream(spark, feed_dir), state_dir, ckpt, ids_a)
    assert ids_a == [0]
    mid = read_scd2_state(spark, state_dir)
    # base-only state: every interval open, nothing versioned yet
    assert mid.where("version != 0 OR NOT is_current").count() == 0

    shutil.copy(os.path.join(staged, "f1.parquet"), feed_dir)
    ids_b: list[int] = []
    scd2_apply_stream(spark, scd2_feed_stream(spark, feed_dir), state_dir, ckpt, ids_b)
    assert ids_b == [1]  # resumed, not replayed

    final = read_scd2_state(spark, state_dir)
    batch = orders_scd2_history(load_table(spark, SF, "orders"))
    assert _rows(final) == _rows(batch)


def test_streamed_scd2_merge_is_batching_invariant(spark, tmp_path):
    """Replaying the same feed as ONE batch (no maxFilesPerTrigger)
    converges to the same table — the merge is order/batching
    insensitive by construction."""
    feed_dir, _, _ = _stage_scd2_feed(spark, SF)
    one = spark.readStream.schema(
        "o_orderkey LONG, version INT, priority STRING, vf TIMESTAMP_NTZ"
    ).parquet(feed_dir)
    state_dir = str(tmp_path / "state1")
    batch_ids: list[int] = []
    scd2_apply_stream(spark, one, state_dir, str(tmp_path / "c1"), batch_ids=batch_ids)
    assert batch_ids == [0]  # single batch this time
    final = read_scd2_state(spark, state_dir)
    batch = orders_scd2_history(load_table(spark, SF, "orders"))
    assert _rows(final) == _rows(batch)


def test_streamed_scd2_replayed_batch_is_idempotent(spark, tmp_path):
    """The crash window ADVICE flagged: state write committed, streaming
    checkpoint NOT committed → the same batch replays with the same
    batch_id.  Simulated by draining the base file twice with a LOST
    checkpoint (fresh dir, same state) — the replayed batch 0 must
    merge against its predecessor (none strictly below 0), overwrite
    v=0 in place, and produce zero duplicate (key, version) rows."""
    import shutil

    staged, _, _ = _stage_scd2_feed(spark, SF)
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    shutil.copy(os.path.join(staged, "f0.parquet"), feed_dir)

    state_dir = str(tmp_path / "state")
    scd2_apply_stream(
        spark, scd2_feed_stream(spark, feed_dir), state_dir, str(tmp_path / "c_lost")
    )
    first = _rows(read_scd2_state(spark, state_dir))

    # checkpoint lost → replay of batch 0 against the already-written state
    ids: list[int] = []
    scd2_apply_stream(
        spark, scd2_feed_stream(spark, feed_dir), state_dir, str(tmp_path / "c_new"), ids
    )
    assert ids == [0]
    replayed = read_scd2_state(spark, state_dir)
    assert _rows(replayed) == first  # byte-identical state, no duplicates
    dupes = (
        replayed.groupBy("o_orderkey", "version").count().where("count > 1").count()
    )
    assert dupes == 0

    # the update file then lands; the continued drain must still converge
    shutil.copy(os.path.join(staged, "f1.parquet"), feed_dir)
    scd2_apply_stream(
        spark, scd2_feed_stream(spark, feed_dir), state_dir, str(tmp_path / "c_new")
    )
    batch = orders_scd2_history(load_table(spark, SF, "orders"))
    assert _rows(read_scd2_state(spark, state_dir)) == _rows(batch)
