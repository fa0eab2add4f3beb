"""MERGE-style CDC apply and incremental aggregate maintenance:
upsert/delete/insert semantics on a hand-built base+delta, and
delta-merge == full-recompute for the degree view."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import make_edges
from twitter_followers_patterns_mapreduce_spark.operators import cdc as CDC
from twitter_followers_patterns_mapreduce_spark.operators.graph import degrees


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        schema="k LONG, price DOUBLE, tag STRING",
    )
    delta = spark.createDataFrame(
        [(2, "U", 99.0, "b2"), (3, "D", 0.0, ""), (4, "I", 40.0, "d")],
        schema="k LONG, op STRING, price DOUBLE, tag STRING",
    )
    got = {r["k"]: r for r in CDC.merge_upsert(base, delta, "k", ["price", "tag"]).collect()}
    assert set(got) == {1, 2, 4}  # 3 deleted
    assert got[1]["price"] == 10.0 and got[1]["row_origin"] == "base"
    assert got[2]["price"] == 99.0 and got[2]["tag"] == "b2" and got[2]["row_origin"] == "upsert"
    assert got[4]["price"] == 40.0 and got[4]["row_origin"] == "upsert"


def test_degrees_incremental_equals_recompute(spark):
    all_edges = make_edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (5, 6)])
    base = all_edges.where((F.col("src") + F.col("dst")) % 3 != 0)
    delta = all_edges.where((F.col("src") + F.col("dst")) % 3 == 0)
    assert 0 < delta.count() < all_edges.count()  # both sides non-trivial
    inc = sorted(map(tuple, CDC.degrees_incremental(base, delta).collect()))
    full = sorted(map(tuple, degrees(all_edges).collect()))
    assert inc == full


def test_degrees_incremental_empty_delta(spark):
    all_edges = make_edges(spark, [(1, 2), (2, 3)])
    empty = all_edges.where(F.lit(False))
    inc = sorted(map(tuple, CDC.degrees_incremental(all_edges, empty).collect()))
    full = sorted(map(tuple, degrees(all_edges).collect()))
    assert inc == full


def test_snapshot_diff_recovers_delta_classes(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.cdc import orders_snapshot_diff

    rows = [
        (k, 100.0 + k, "1-URGENT", ) for k in range(1, 41)
    ]
    df = spark.createDataFrame(
        rows, schema="o_orderkey LONG, o_totalprice DOUBLE, o_orderpriority STRING"
    )
    out = {r["change_type"]: r for r in orders_snapshot_diff(df).collect()}
    # delta: %10==3 updated (4 keys), %10==3 inserted at +10M (4), %10==7 deleted (4)
    assert out["changed"]["n_rows"] == 4 and out["changed"]["min_key"] == 3
    assert out["added"]["n_rows"] == 4 and out["added"]["min_key"] == 10_000_003
    assert out["removed"]["n_rows"] == 4 and out["removed"]["max_key"] == 37
    assert out["unchanged"]["n_rows"] == 40 - 8
