"""Bucketed-table co-location: the write-once-shuffle-never layout.

Proves the claim physically: a sort-merge join of two tables bucketed
on the join key plans ZERO Exchange nodes, while the identical join on
plain parquet plans one per side — the delta is exactly the shuffle
bucketing pre-pays at write time."""

from __future__ import annotations

import pytest

from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table
from twitter_followers_patterns_mapreduce_spark.sources.writers import write_bucketed

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "custkey")
    write_bucketed(orders, "orders_b", "custkey", N_BUCKETS, path=str(base / "orders_b"))
    write_bucketed(cust, "customer_b", "custkey", N_BUCKETS, path=str(base / "customer_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def _merge_join_plan(spark, left, right):
    df = left.hint("merge").join(right, "custkey")
    return df, df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    df, plan = _merge_join_plan(spark, spark.table("orders_b"), spark.table("customer_b"))
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan
    assert df.count() > 0


def test_plain_parquet_join_needs_exchanges(spark):
    orders = load_table(spark, SF, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "custkey")
    _, plan = _merge_join_plan(spark, orders, cust)
    assert plan.count("Exchange") >= 2  # the control: same join, shuffle both sides


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    bucketed, _ = _merge_join_plan(spark, spark.table("orders_b"), spark.table("customer_b"))
    orders = load_table(spark, SF, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "custkey")
    plain = orders.join(cust, "custkey")
    assert bucketed.count() == plain.count()
    a = {tuple(r) for r in bucketed.select("custkey", "o_orderkey").collect()}
    b = {tuple(r) for r in plain.select("custkey", "o_orderkey").collect()}
    assert a == b


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    # pre-bucketed layout also kills the aggregation shuffle on the key
    df = spark.table("orders_b").groupBy("custkey").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
