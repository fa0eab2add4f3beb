"""Streamed domain-mixture IVM (streaming/mixture.py): the drained
per-source state equals the one-shot aggregate under any chunking, the
recipe from state equals the batch IVM's recipe, versions prune to
keep-2, and a restarted drain resumes instead of re-counting."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.streaming.mixture import (
    docs_mix_stream,
    mixture_apply_stream,
    mixture_recipe_from_state,
)

N = 600
SOURCES = ("web", "code", "wiki")


def _docs(spark):
    # deterministic skewed mixture: source i gets ~N·(i+1)/6 docs
    return spark.range(N).selectExpr(
        "id AS doc_id",
        f"element_at(array{SOURCES!r}, CAST(pmod(id * id, 6) div 2 AS INT) + 1)"
        " AS source",
        "CAST(100 + pmod(id, 37) AS LONG) AS n_chars",
    )


def _stage(spark, feed, n_batches, upto=None):
    os.makedirs(feed, exist_ok=True)
    docs = _docs(spark)
    for b in range(upto if upto is not None else n_batches):
        dst = os.path.join(feed, f"b{b}.parquet")
        if os.path.exists(dst):
            continue
        tmp = feed + f"_stage_{b}"
        docs.where(F.col("doc_id") % n_batches == b).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
        shutil.rmtree(tmp)
    return feed


def _batch_state(spark):
    return {
        r["source"]: (r["n_docs"], r["n_chars"])
        for r in _docs(spark)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .collect()
    }


@pytest.mark.parametrize("n_batches", [1, 4])
def test_streamed_mixture_state_equals_batch_any_chunking(spark, tmp_path, n_batches):
    feed = _stage(spark, str(tmp_path / "feed"), n_batches)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    ids: list[int] = []
    mixture_apply_stream(spark, docs_mix_stream(spark, feed), state, ckpt, batch_ids=ids)
    assert len(ids) == n_batches
    vdirs = sorted(glob.glob(os.path.join(state, "v=*")))
    assert len(vdirs) <= 2  # keep-2 retention
    got = {
        r["source"]: (r["n_docs"], r["n_chars"])
        for r in spark.read.parquet(vdirs[-1]).collect()
    }
    assert got == _batch_state(spark)
    # the recipe from state carries every source with exact totals
    recipe = {r["source"]: r for r in mixture_recipe_from_state(spark, state).collect()}
    assert set(recipe) == set(got)
    for s, (nd, nc) in got.items():
        assert (recipe[s]["n_docs"], recipe[s]["n_chars"]) == (nd, nc)


def test_streamed_mixture_restart_resumes(spark, tmp_path):
    """Drain 2 of 4 batches, stop, stage the rest, restart on the SAME
    checkpoint + state: the resumed stream continues from batch 2 and
    the final state equals the one-shot aggregate (never double-counts
    the replayed half)."""
    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _stage(spark, feed, 4, upto=2)
    ids1: list[int] = []
    mixture_apply_stream(spark, docs_mix_stream(spark, feed), state, ckpt, batch_ids=ids1)
    assert ids1 == [0, 1]
    _stage(spark, feed, 4)
    ids2: list[int] = []
    mixture_apply_stream(spark, docs_mix_stream(spark, feed), state, ckpt, batch_ids=ids2)
    assert ids2 == [2, 3]  # resumed, batches 0/1 NOT re-run
    vdirs = sorted(glob.glob(os.path.join(state, "v=*")))
    got = {
        r["source"]: (r["n_docs"], r["n_chars"])
        for r in spark.read.parquet(vdirs[-1]).collect()
    }
    assert got == _batch_state(spark)
