"""Incrementally-maintained EWMA (streaming/ewma.py): stream == batch,
batching invariance, version pruning, and restart-resume."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators.events import ewma_hourly
from twitter_followers_patterns_mapreduce_spark.streaming.ewma import (
    ewma_apply_stream,
    ewma_event_stream,
    read_ewma_view,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark):
    # two types, 72 hours with gaps (every 5th hour missing), values
    # exercising the 1e-6 floor path
    rows = []
    for i in range(72):
        if i % 5 == 4:
            continue
        for et in ("click", "view"):
            rows.append(
                (len(rows), T0 + dt.timedelta(hours=i, minutes=7), i % 9,
                 et, 10.5 + i * 0.123456, "{}")
            )
    return spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING"
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
    return sorted(
        (r["event_type"], r["window_start"], r["n_events"], r["sum_value"], r["ewma"])
        for r in df.collect()
    )


@pytest.mark.parametrize("n_batches", [1, 3])
def test_streamed_ewma_matches_batch(spark, tmp_path, n_batches):
    feed = _stage(spark, tmp_path, n_batches)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    ids: list[int] = []
    ewma_apply_stream(spark, ewma_event_stream(spark, feed), state, ckpt, ids)
    assert ids == list(range(n_batches))  # one micro-batch per staged file
    got = _rows(read_ewma_view(spark, state))
    want = _rows(ewma_hourly(_events(spark)))
    assert got == want and len(got) > 0


def test_streamed_ewma_prunes_versions(spark, tmp_path):
    feed = _stage(spark, tmp_path, 4)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    ewma_apply_stream(spark, ewma_event_stream(spark, feed), state, ckpt)
    versions = sorted(
        d for d in os.listdir(state)
        if d.startswith("v=") and os.path.exists(os.path.join(state, d, "_SUCCESS"))
    )
    # retention: newest two committed versions only (current + replay pred)
    assert versions == ["v=2", "v=3"]


def test_streamed_ewma_restart_resumes(spark, tmp_path):
    # drain the first 2 of 4 files, "crash", re-open the stream on the
    # same checkpoint: the remaining files merge into existing state and
    # the final view equals the batch answer
    feed_all = _stage(spark, tmp_path, 4)
    held = str(tmp_path / "held")
    os.makedirs(held)
    for b in (2, 3):
        os.rename(os.path.join(feed_all, f"b{b}.parquet"), os.path.join(held, f"b{b}.parquet"))
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    ewma_apply_stream(spark, ewma_event_stream(spark, feed_all), state, ckpt)
    for b in (2, 3):
        os.rename(os.path.join(held, f"b{b}.parquet"), os.path.join(feed_all, f"b{b}.parquet"))
    ids: list[int] = []
    ewma_apply_stream(spark, ewma_event_stream(spark, feed_all), state, ckpt, ids)
    assert ids and ids[0] >= 2  # resumed from the checkpoint, not batch 0
    got = _rows(read_ewma_view(spark, state))
    assert got == _rows(ewma_hourly(_events(spark)))
