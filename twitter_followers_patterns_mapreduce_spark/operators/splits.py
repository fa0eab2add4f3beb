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


def stratified_sample(documents: DataFrame, per_stratum: int = 20,
                      stratum: str = "lang") -> DataFrame:
    """Deterministic per-stratum sample: the ``per_stratum`` docs with
    the smallest h64(doc_id) in each stratum — a fixed-size training-mix
    builder with the same rerun/partitioning/growth-stability guarantees
    as :func:`assign_split` (rank by a content key, never ``rand()``).

    Plan: one partitioned window (never global) over scan-side hashes;
    at 100 TB the stratum is the shuffle key and each partition keeps a
    ``per_stratum``-row heap."""
    from pyspark.sql import Window

    h = F.expr(h64_sql("cast(doc_id as string)", "spark"))
    w = Window.partitionBy(stratum).orderBy(F.col("_h").asc(), F.col("doc_id").asc())
    return (
        documents.withColumn("_h", h)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= per_stratum)
        .select(F.col(stratum), "sample_rank", "doc_id", "n_chars")
    )


def stratified_sample_oracle(per_stratum: int = 20, stratum: str = "lang") -> str:
    h = h64_sql("CAST(doc_id AS VARCHAR)", "duckdb")
    return f"""SELECT {stratum}, sample_rank, doc_id, n_chars
FROM (
  SELECT {stratum}, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY {stratum}
                            ORDER BY {h} ASC, doc_id ASC) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {per_stratum}"""
