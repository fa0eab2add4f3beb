"""Streaming exact heavy hitters (streaming/counts.py): stream == batch
== oracle, batching invariance, and checkpoint restart-resume."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators.events import heavy_hitters
from twitter_followers_patterns_mapreduce_spark.streaming.counts import (
    counts_apply_stream,
    heavy_hitters_from_view,
    user_event_stream,
)

PHI = 0.05


def _events(spark):
    # user 1 heavy (40%), user 2 heavy (12%), 30 users of 8 events each
    counts = {1: 200, 2: 60}
    counts.update({u: 8 for u in range(10, 40)})
    rows = []
    for u, c in counts.items():
        rows += [(len(rows) + i, u) for i in range(c)]
    return spark.createDataFrame(rows, schema="event_id LONG, user_id LONG")


def _stage(spark, tmp_path, n_batches):
    ev = _events(spark)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    import glob

    for b in range(n_batches):
        tmp = str(tmp_path / f"stage_{b}")
        ev.where(F.col("event_id") % n_batches == b).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.rename(part, os.path.join(feed, f"b{b}.parquet"))
        shutil.rmtree(tmp)
    return feed


def _hh(df):
    return sorted((r["user_id"], r["n_events"], r["share"]) for r in df.collect())


@pytest.mark.parametrize("n_batches", [1, 4])
def test_streamed_heavy_hitters_match_batch(spark, tmp_path, n_batches):
    feed = _stage(spark, tmp_path, n_batches)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    ids: list[int] = []
    counts_apply_stream(spark, user_event_stream(spark, feed), state, ckpt, ids)
    assert ids == list(range(n_batches))  # one micro-batch per staged file
    got = _hh(heavy_hitters_from_view(spark, state, PHI))
    want = _hh(heavy_hitters(_events(spark), phi=PHI))
    assert got == want and len(got) == 2


def test_streamed_counts_restart_resumes(spark, tmp_path):
    feed_all = _stage(spark, tmp_path, 2)
    feed = str(tmp_path / "live")
    os.makedirs(feed)
    shutil.copy(os.path.join(feed_all, "b0.parquet"), feed)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    ids_a: list[int] = []
    counts_apply_stream(spark, user_event_stream(spark, feed), state, ckpt, ids_a)
    assert ids_a == [0]
    shutil.copy(os.path.join(feed_all, "b1.parquet"), feed)
    ids_b: list[int] = []
    counts_apply_stream(spark, user_event_stream(spark, feed), state, ckpt, ids_b)
    assert ids_b == [1]  # resumed from checkpoint, batch 0 not replayed
    got = _hh(heavy_hitters_from_view(spark, state, PHI))
    assert got == _hh(heavy_hitters(_events(spark), phi=PHI))
