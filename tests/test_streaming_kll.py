"""Streaming KLL quantile view (streaming/kll.py): the drained state
sketch satisfies the batch rank-error gate regardless of chunking,
state is one fixed-size row, versions prune to keep-2, and a
restarted drain resumes instead of re-merging."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.streaming.kll import (
    kll_apply_stream,
    kll_profile_from_state,
    value_stream,
)

N = 2000


def _values(spark):
    # deterministic skewed values: quantiles are hand-checkable
    return spark.range(N).selectExpr(
        "id AS event_id", "CAST(id * id AS DOUBLE) / 1000.0 AS value"
    )


def _stage(spark, feed, n_batches, upto=None):
    os.makedirs(feed, exist_ok=True)
    vals = _values(spark)
    for b in range(upto if upto is not None else n_batches):
        dst = os.path.join(feed, f"b{b}.parquet")
        if os.path.exists(dst):
            continue
        tmp = feed + f"_stage_{b}"
        vals.where(F.col("event_id") % n_batches == b).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
        shutil.rmtree(tmp)
    return feed


@pytest.mark.parametrize("n_batches", [1, 4])
def test_streamed_kll_passes_batch_gate_any_chunking(spark, tmp_path, n_batches):
    feed = _stage(spark, str(tmp_path / "feed"), n_batches)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    ids: list[int] = []
    kll_apply_stream(spark, value_stream(spark, feed), state, ckpt, batch_ids=ids)
    assert len(ids) == n_batches
    # state is ONE row per version, keep-2 retention
    vdirs = sorted(glob.glob(os.path.join(state, "v=*")))
    assert len(vdirs) <= 2
    last = spark.read.parquet(vdirs[-1])
    assert last.count() == 1
    assert last.first()["n"] == N

    out = kll_profile_from_state(spark, state, _values(spark), "value").collect()
    assert len(out) == 5
    assert all(r["kll_ok"] for r in out)
    assert all(r["n"] == N for r in out)


def test_streamed_kll_restart_resumes(spark, tmp_path):
    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _stage(spark, feed, 4, upto=2)
    ids1: list[int] = []
    kll_apply_stream(spark, value_stream(spark, feed), state, ckpt, batch_ids=ids1)
    assert ids1 == [0, 1]
    _stage(spark, feed, 4)  # stage the remaining two files
    ids2: list[int] = []
    kll_apply_stream(spark, value_stream(spark, feed), state, ckpt, batch_ids=ids2)
    assert ids2 == [2, 3]  # resumed, not re-run
    out = kll_profile_from_state(spark, state, _values(spark), "value").collect()
    assert all(r["kll_ok"] for r in out)
    assert all(r["n"] == N for r in out)


# ---------------------------------------------------------------------------
# Streamed theta distinct view (streaming/theta.py) — same staging shapes
# ---------------------------------------------------------------------------


def _keys(spark):
    # 400 events over 97 distinct users
    return spark.range(400).selectExpr("id AS event_id", "id % 97 AS user_id")


def _stage_keys(spark, feed, n_batches):
    os.makedirs(feed, exist_ok=True)
    for b in range(n_batches):
        dst = os.path.join(feed, f"b{b}.parquet")
        tmp = feed + f"_stage_{b}"
        _keys(spark).where(F.col("event_id") % n_batches == b).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
        shutil.rmtree(tmp)
    return feed


@pytest.mark.parametrize("n_batches", [1, 4])
def test_streamed_theta_distinct_any_chunking(spark, tmp_path, n_batches):
    from twitter_followers_patterns_mapreduce_spark.streaming.theta import (
        distinct_from_state,
        key_stream,
        theta_apply_stream,
    )

    feed = _stage_keys(spark, str(tmp_path / "feed"), n_batches)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    ids: list[int] = []
    theta_apply_stream(spark, key_stream(spark, feed), state, ckpt, batch_ids=ids)
    assert len(ids) == n_batches
    vdirs = sorted(glob.glob(os.path.join(state, "v=*")))
    assert len(vdirs) <= 2  # keep-2 retention
    assert spark.read.parquet(vdirs[-1]).count() == 1  # one sketch row

    row = distinct_from_state(spark, state, _keys(spark), "user_id").first()
    # 97 distinct users fit the lgK=14 exact mode: the estimate is exact
    # and the 8%-band boolean is trivially TRUE
    assert row["n_users"] == 97
    assert bool(row["ok"]) is True
