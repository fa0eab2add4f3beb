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


def _row_salt(df: DataFrame, n_salts: int, salt_col: str | None = None) -> F.Column:
    """Deterministic per-row salt in [0, n_salts): ``pmod(xxhash64(...),
    n)`` over a caller-supplied unique key column, or over ALL columns
    when none is given.  NEVER derived from ``monotonically_increasing_id``
    / ``rand()``: a non-deterministic expression used as a JOIN or GROUP
    sub-key means a stage retry after a shuffle fetch failure can
    re-assign salts to rows whose earlier output was already consumed —
    duplicating or losing rows (the rerun-instability class the
    negative-sampler docstring documents).  Content-derived salts replay
    identically on any recompute.  Caveat a caller tunes ``salt_col``
    for: rows identical in every hashed column share a salt, so a hot
    key whose rows are full duplicates needs a unique id column to
    spread."""
    cols = [salt_col] if salt_col is not None else df.columns
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_count(
    df: DataFrame, key: str, n_salts: int = 16, salt_col: str | None = None
) -> DataFrame:
    """groupBy(key).count() resistant to a single hot key: stage 1
    aggregates (key, salt) with a deterministic content-derived salt
    (see :func:`_row_salt`), stage 2 merges the ≤ n_salts shards."""
    salted = df.withColumn("_salt", _row_salt(df, n_salts, salt_col))
    partial = salted.groupBy(F.col(key), F.col("_salt")).agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("long").alias("count"))


def skew_split(
    fact: DataFrame, fact_key: str, hot_threshold: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Measure-then-split: per-key counts on the fact side, keys whose
    row count exceeds ``hot_threshold`` are HOT.  Returns
    ``(hot_keys, fact_hot, fact_cold)`` where ``hot_keys`` is the
    bounded (≤ |keys|-row) key table, ``fact_hot`` the hot-key rows,
    and ``fact_cold`` the rest.  The split is one degree aggregation
    (the same |keys|-sized shuffle :func:`planner.join_skew_planner`
    already prescribes salting from) plus two broadcast semi/anti joins
    against the hot-key table — the fact side is never shuffled to
    decide its own fate."""
    hot_keys = (
        fact.groupBy(fact_key)
        .agg(F.count("*").alias("_key_rows"))
        .filter(F.col("_key_rows") > hot_threshold)
        .select(fact_key)
    )
    hot_b = F.broadcast(hot_keys)
    fact_hot = fact.join(hot_b, fact_key, "left_semi")
    fact_cold = fact.join(hot_b, fact_key, "left_anti")
    return hot_keys, fact_hot, fact_cold


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    hot_threshold: int = 70,
    n_salts: int = 8,
    salt_col: str | None = None,
) -> DataFrame:
    """EXECUTION twin of :func:`planner.join_skew_planner`'s
    prescription: an inner equi-join ``fact.key = dim.key`` where keys
    hotter than ``hot_threshold`` fact rows are salted — hot fact rows
    spread across ``n_salts`` sub-keys, the matching dim rows replicate
    once per salt — and everything else joins plainly; the two halves
    UNION ALL.  Output == the plain equi-join (salt columns are
    internal), which is exactly what the registered oracle checks.

    100 TB shape: the planner measures per-key degrees and picks the
    salt factor; this operator applies it.  The hot-key table is tiny
    (keys above threshold) and broadcasts; the dim side replicates only
    for hot keys (cold dim rows ship once); each hot key's join work
    lands on ``n_salts`` tasks instead of one — the bounded-per-task
    guarantee AQE's partition splitting cannot give a single
    monster GROUP/join key."""
    if dim_key == fact_key:  # disambiguate: the dim key column is dropped anyway
        dim = dim.withColumnRenamed(dim_key, "_dim_key")
        dim_key = "_dim_key"
    hot_keys, fact_hot, fact_cold = skew_split(fact, fact_key, hot_threshold)
    # salt is distribution-only state (any assignment yields the same
    # join OUTPUT under one consistent evaluation) but it IS a join key,
    # so it must be deterministic across stage retries — content-derived
    fact_hot = fact_hot.withColumn("_fs", _row_salt(fact, n_salts, salt_col))
    hot_dim_keys = F.broadcast(hot_keys.withColumnRenamed(fact_key, dim_key))
    dim_hot = (
        dim.join(hot_dim_keys, dim_key, "left_semi")
        .withColumn("_ds", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    )
    dim_cold = dim.join(hot_dim_keys, dim_key, "left_anti")
    hot_half = fact_hot.join(
        dim_hot,
        (fact_hot[fact_key] == dim_hot[dim_key]) & (fact_hot["_fs"] == dim_hot["_ds"]),
    ).drop("_fs", "_ds", dim_key)
    cold_half = fact_cold.join(
        dim_cold, fact_cold[fact_key] == dim_cold[dim_key]
    ).drop(dim_key)
    return hot_half.unionByName(cold_half)


def salted_broadcast_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Inner equi-join on ``key`` with the fact side salted and the dim
    side exploded once per salt, so a skewed fact key spreads across
    ``n_salts`` tasks under a sort-merge join."""
    f = fact.withColumn("_salt", _row_salt(fact, n_salts, salt_col))
    d = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    joined = f.join(d, [key, "_salt"]).drop("_salt")
    return joined
