"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in
``twitter_followers_patterns_mapreduce_spark.plans`` — each operator
module registers its named queries plus the DuckDB oracle SQL next to
the Spark plan, so this file stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from twitter_followers_patterns_mapreduce_spark.plans.registry import all_oracles, all_queries

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Rep-join-style triangle count (broadcast semi-join)
    on the derived edge view at sf0.001 — the reference's headline job
    (``rsjoin/RSJoinTriangleCount.java`` + the missing Rep-join,
    ``README.md:79-81``) as one lazy Spark plan."""
    from twitter_followers_patterns_mapreduce_spark.operators.graph import triangle_count_raw
    from twitter_followers_patterns_mapreduce_spark.sources.readers import derived_edges

    return triangle_count_raw(derived_edges(spark, SF_SMOKE_DIR), max_limit=997, strategy="broadcast")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+extensions)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys get a rows-only check."""
    return all_oracles()
