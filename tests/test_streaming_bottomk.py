"""Streaming bottom-k uniform sample (streaming/bottomk.py): stream ==
batch == oracle regardless of chunking, state never exceeds k rows."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators.events import bottomk_sample
from twitter_followers_patterns_mapreduce_spark.streaming.bottomk import (
    bottomk_apply_stream,
    bottomk_from_view,
    sample_event_stream,
)

K = 25


def _events(spark):
    return spark.createDataFrame(
        [(i, i % 7, "click" if i % 3 else "view") for i in range(500)],
        schema="event_id LONG, user_id LONG, event_type STRING",
    )


def _stage(spark, tmp_path, n_batches):
    ev = _events(spark)
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for b in range(n_batches):
        tmp = str(tmp_path / f"stage_{b}")
        ev.where(F.col("event_id") % n_batches == b).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        os.rename(part, os.path.join(feed, f"b{b}.parquet"))
        shutil.rmtree(tmp)
    return feed


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("n_batches", [1, 4])
def test_stream_equals_batch_any_chunking(spark, tmp_path, n_batches):
    feed = _stage(spark, tmp_path, n_batches)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    ids: list[int] = []
    bottomk_apply_stream(
        spark, sample_event_stream(spark, feed), state, ckpt, k=K, batch_ids=ids
    )
    assert len(ids) == n_batches
    got = bottomk_from_view(spark, state)
    assert got.count() == K  # state capped at k
    assert _rows(got) == _rows(bottomk_sample(_events(spark), k=K))


def test_restart_resumes_and_is_idempotent(spark, tmp_path):
    feed = _stage(spark, tmp_path, 4)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    bottomk_apply_stream(spark, sample_event_stream(spark, feed), state, ckpt, k=K)
    want = _rows(bottomk_from_view(spark, state))
    # drain again with the same checkpoint: no new batches, state intact
    bottomk_apply_stream(spark, sample_event_stream(spark, feed), state, ckpt, k=K)
    assert _rows(bottomk_from_view(spark, state)) == want
