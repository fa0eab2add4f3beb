"""Deterministic train/holdout splitting — the contamination-control
primitive of a training-data pipeline.

Membership is a pure function of the row KEY (md5-derived h64 bucket,
``functions/hashing.py``), never of partitioning, row order, or sample
randomness: a document keeps its split across reruns, repartitions,
and dataset growth — the property that makes eval-set leakage
impossible by construction.  ``spark.sql.functions.rand``-based splits
have none of these guarantees (seed × partitioning dependent).

Scale: the bucket is one scan-side md5 per row inside whole-stage
codegen — no shuffle, no state; the split column then behaves like any
partition-pruning key (write with ``partitionBy("split")`` and the
holdout read never scans train files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

N_BUCKETS = 100


def _bucket_sql(key: str, dialect: str) -> str:
    h = h64_sql(f"cast({key} as string)" if dialect == "spark" else f"CAST({key} AS VARCHAR)",
                dialect)
    return f"({h} % {N_BUCKETS})"


def assign_split(df: DataFrame, key: str = "doc_id", holdout_pct: int = 10) -> DataFrame:
    """Add a ``split`` column: 'holdout' for the ``holdout_pct`` h64
    buckets of ``key``, else 'train'."""
    bucket = F.expr(_bucket_sql(key, "spark"))
    return df.withColumn(
        "split", F.when(bucket < holdout_pct, F.lit("holdout")).otherwise(F.lit("train"))
    )


def split_summary(documents: DataFrame, holdout_pct: int = 10) -> DataFrame:
    """Per (split, lang) doc counts and char mass — the aggregate view
    that verifies every row landed in exactly one deterministic split."""
    return (
        assign_split(documents, "doc_id", holdout_pct)
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


def split_summary_oracle(holdout_pct: int = 10) -> str:
    bucket = _bucket_sql("doc_id", "duckdb")
    return f"""SELECT
  CASE WHEN {bucket} < {holdout_pct} THEN 'holdout' ELSE 'train' END AS split,
  lang,
  COUNT(*) AS n_docs,
  SUM(n_chars) AS sum_chars
FROM documents GROUP BY 1, 2"""
