"""Skew handling for power-law keys — the hot-key problem the reference
dodges with its compile-time MAX filter (``README.md:77`` "The MAX
filter is applied to limit the input size"; SURVEY.md §4).

First line of defense is AQE (``spark.sql.adaptive.skewJoin.enabled``,
on in ``session.py``), which splits oversized post-shuffle partitions at
runtime.  This module is the EXPLICIT fallback for cases AQE cannot fix:

  * ``salted_count`` — two-stage aggregation: spray each hot key across
    ``n_salts`` reducers (partial counts), then a second tiny aggregate
    merges the salt shards.  Use when a single group's rows exceed one
    executor's memory — AQE splits partitions, not groups.
  * ``salted_broadcast_join`` — replicate the small side per salt so a
    skewed fact key spreads over ``n_salts`` tasks while staying a hash
    join.  (With a broadcast join Spark never shuffles the fact side, so
    this is only needed for the sort-merge case; kept general.)

Salting trades one extra narrow shuffle for bounded per-task state —
the classic 100 TB pattern, kept out of the hot path until measurements
demand it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """groupBy(key).count() resistant to a single hot key: stage 1
    aggregates (key, salt) with salt = crc32(monotonic row id) % n,
    stage 2 merges the ≤ n_salts shards per key."""
    salted = df.withColumn(
        "_salt", F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(n_salts))
    )
    partial = salted.groupBy(F.col(key), F.col("_salt")).agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("long").alias("count"))


def salted_broadcast_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Inner equi-join on ``key`` with the fact side salted and the dim
    side exploded once per salt, so a skewed fact key spreads across
    ``n_salts`` tasks under a sort-merge join."""
    f = fact.withColumn(
        "_salt", F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(n_salts))
    )
    d = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    joined = f.join(d, [key, "_salt"]).drop("_salt")
    return joined
