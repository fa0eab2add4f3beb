"""Deterministic split assignment: membership is a pure function of the
key — invariant to partitioning, row order, and dataset growth — and
the holdout fraction lands near the requested percentage."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators import splits as SP


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, "en", 100) for i in ids], schema="doc_id LONG, lang STRING, n_chars LONG"
    )


def test_split_invariant_to_partitioning_and_growth(spark):
    small = SP.assign_split(_docs(spark, range(200)))
    grown = SP.assign_split(_docs(spark, range(1000)).repartition(17))
    a = {r["doc_id"]: r["split"] for r in small.collect()}
    b = {r["doc_id"]: r["split"] for r in grown.collect()}
    assert all(b[k] == v for k, v in a.items())  # growth never reassigns


def test_holdout_fraction_near_target(spark):
    r = SP.assign_split(_docs(spark, range(5000)), holdout_pct=10)
    n_hold = r.where(F.col("split") == "holdout").count()
    assert 0.06 < n_hold / 5000 < 0.14  # 100-bucket quantization around 10%


def test_split_is_exhaustive_and_exclusive(spark):
    r = SP.assign_split(_docs(spark, range(500)))
    assert r.where(~F.col("split").isin("train", "holdout")).count() == 0
    assert r.count() == 500
