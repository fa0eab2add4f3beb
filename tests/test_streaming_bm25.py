"""Streamed BM25 index maintenance (streaming/bm25.py): top-k served
from the drained state equals the one-shot batch operator under any
chunking, versions prune to keep-2, and a restarted drain resumes
instead of double-counting."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators.corpus import doc_bm25_topk
from twitter_followers_patterns_mapreduce_spark.streaming.bm25 import (
    bm25_apply_stream,
    bm25_topk_from_state,
    docs_text_stream,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


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


def _topk_rows(df):
    return [(r["doc_id"], r["n_terms"], r["bm25"]) for r in df.collect()]


@pytest.mark.parametrize("n_batches", [1, 4])
def test_streamed_bm25_equals_batch_any_chunking(spark, tmp_path, n_batches):
    feed = _stage(spark, str(tmp_path / "feed"), n_batches)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    ids: list[int] = []
    bm25_apply_stream(spark, docs_text_stream(spark, feed), state, ckpt, batch_ids=ids)
    assert len(ids) == n_batches
    for sub in ("postings", "totals"):
        vdirs = sorted(glob.glob(os.path.join(state, sub, "v=*")))
        assert 1 <= len(vdirs) <= 2  # keep-2 retention
    got = _topk_rows(bm25_topk_from_state(spark, state, k=20))
    want = _topk_rows(doc_bm25_topk(_docs(spark), k=20))
    assert got == want


def test_streamed_bm25_restart_resumes(spark, tmp_path):
    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _stage(spark, feed, 4, upto=2)
    ids1: list[int] = []
    bm25_apply_stream(spark, docs_text_stream(spark, feed), state, ckpt, batch_ids=ids1)
    assert ids1 == [0, 1]
    _stage(spark, feed, 4)
    ids2: list[int] = []
    bm25_apply_stream(spark, docs_text_stream(spark, feed), state, ckpt, batch_ids=ids2)
    assert ids2 == [2, 3]  # resumed, batches 0/1 NOT re-run
    got = _topk_rows(bm25_topk_from_state(spark, state, k=20))
    want = _topk_rows(doc_bm25_topk(_docs(spark), k=20))
    assert got == want
