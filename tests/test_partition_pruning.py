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
