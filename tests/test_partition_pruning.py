"""Partition pruning: a split-partitioned layout read with a split
filter must prune at the directory level (PartitionFilters in the scan,
train files never touched) — the write-side contract that makes the
holdout read O(holdout) instead of O(corpus)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators.splits import assign_split
from twitter_followers_patterns_mapreduce_spark.sources.writers import write_result


@pytest.fixture(scope="module")
def split_layout(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("parts") / "docs")
    docs = spark.createDataFrame(
        [(i, "en", 100) for i in range(500)], schema="doc_id LONG, lang STRING, n_chars LONG"
    )
    write_result(assign_split(docs), out, format="parquet", partition_by=["split"])
    return out


def test_layout_is_hive_partitioned(split_layout):
    subdirs = sorted(d for d in os.listdir(split_layout) if d.startswith("split="))
    assert subdirs == ["split=holdout", "split=train"]


def test_split_filter_prunes_partitions(spark, split_layout):
    df = spark.read.parquet(split_layout).where(F.col("split") == "holdout")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the split predicate must land in PartitionFilters (directory-level
    # pruning), NOT PushedFilters (row-group level) — and no row-level
    # Filter node should remain for it
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "holdout" in pf.group(1)


def test_pruned_read_matches_full_filter(spark, split_layout):
    pruned = spark.read.parquet(split_layout).where(F.col("split") == "holdout")
    full = spark.read.parquet(split_layout)
    assert pruned.count() == full.where("split = 'holdout'").count()
    assert pruned.count() + full.where("split = 'train'").count() == 500


@pytest.fixture(scope="module")
def year_layout(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("parts") / "orders_by_year")
    rows = [(i, 1995 + i % 4, float(i)) for i in range(400)]
    df = spark.createDataFrame(rows, schema="o_orderkey LONG, o_year INT, o_total DOUBLE")
    df.write.partitionBy("o_year").parquet(out)
    return out


def test_dynamic_partition_pruning_fires_on_dim_filter(spark, year_layout):
    """Runtime counterpart of the static test above: when the filter
    lives on the DIMENSION side of a join against a partition column,
    Spark must inject a dynamicpruning subquery into the fact scan's
    PartitionFilters — reading only the years the filtered dim can
    reach, decided at runtime.  At 100 TB this is the difference
    between scanning one partition and scanning the fact table."""
    fact = spark.read.parquet(year_layout)
    dim = spark.createDataFrame(
        [(1995, "keep"), (1996, "drop"), (1997, "drop"), (1998, "drop")],
        schema="d_year INT, d_tag STRING",
    )
    joined = fact.join(dim.where(F.col("d_tag") == "keep"), fact["o_year"] == dim["d_year"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the join result really only contains the kept year
    years = {r["o_year"] for r in joined.select("o_year").distinct().collect()}
    assert years == {1995}
