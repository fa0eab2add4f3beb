"""Change-data-capture application — MERGE-style upsert/delete as a
pure DataFrame composition, and incremental maintenance of a
materialized aggregate.

The reference recomputes everything from the full edge file on every
run (SURVEY.md §3: each job is a cold scan of ``input/edges.csv``);
a 100 TB pipeline cannot — it applies deltas.  Vanilla Spark has no
``MERGE INTO`` (that is a table-format feature: Delta/Iceberg); the
engine expresses the same semantics as a full-outer join + conditional
projection, which also IS the scale shape: the delta side is small and
broadcasts, the base side never rewrites untouched partitions when the
result is written partition-aligned.

Semantics pinned for the oracle (one delta row per key; op ∈ U/I/D):
  * op = 'D'        → key dropped from the result
  * op = 'U' or 'I' → delta row wins over the base row
  * base key with no delta → carried through unchanged
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame, delta: DataFrame, key: str, payload_cols: list[str]
) -> DataFrame:
    """Apply a CDC delta (``key``, ``op``, payload columns) onto
    ``base``.  Returns the merged table plus ``row_origin``
    ('base' | 'upsert') for auditability.

    Plan: one full-outer equi-join on the key — Catalyst broadcasts the
    delta when it is small (the common CDC case), so the base side is
    never shuffled; with both sides large it is a single sort-merge
    join.  No window, no distinct, no second pass.

    Every delta-side column is renamed under the reserved ``_d_``
    prefix before the join, so a base table that itself carries an
    ``op`` column (CDC-sourced bases often do) can never collide; a
    base column starting with ``_d_`` is rejected loudly.
    """
    clash = [c for c in base.columns if c.startswith("_d_")]
    if clash:
        raise ValueError(f"base columns collide with the reserved _d_ prefix: {clash}")
    d = delta.select(
        F.col(key),
        F.col("op").alias("_d_op"),
        *[F.col(c).alias(f"_d_{c}") for c in payload_cols],
    )
    joined = base.join(d, on=key, how="full_outer")
    kept = joined.where(F.col("_d_op").isNull() | (F.col("_d_op") != "D"))
    return kept.select(
        F.col(key),
        *[
            F.when(F.col("_d_op").isNotNull(), F.col(f"_d_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload_cols
        ],
        F.when(F.col("_d_op").isNotNull(), F.lit("upsert"))
        .otherwise(F.lit("base"))
        .alias("row_origin"),
    )


#: Deterministic synthetic delta over ``orders`` for the harness run:
#: every key ≡ 3 (mod 10) is updated (+10% price), every key ≡ 7 is
#: deleted, and one insert per updated key at key+10_000_000 (outside
#: the base key space at any harness SF).
def orders_delta(orders: DataFrame) -> DataFrame:
    upd = orders.where(F.col("o_orderkey") % 10 == 3).select(
        F.col("o_orderkey"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
        F.col("o_orderpriority"),
    )
    ins = orders.where(F.col("o_orderkey") % 10 == 3).select(
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
        F.lit("I").alias("op"),
        F.col("o_totalprice"),
        F.lit("5-LOW").alias("o_orderpriority"),
    )
    dele = orders.where(F.col("o_orderkey") % 10 == 7).select(
        F.col("o_orderkey"),
        F.lit("D").alias("op"),
        F.col("o_totalprice"),
        F.col("o_orderpriority"),
    )
    return upd.unionAll(ins).unionAll(dele)


def orders_cdc_merge(orders: DataFrame) -> DataFrame:
    """Named-query body: apply the synthetic delta to ``orders`` and
    return the merged table (key, payload, row_origin)."""
    base = orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
    return merge_upsert(
        base, orders_delta(orders), "o_orderkey", ["o_totalprice", "o_orderpriority"]
    )


ORDERS_CDC_MERGE_ORACLE = """WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
),
delta AS (
  SELECT o_orderkey, 'U' AS op, o_totalprice * 1.1 AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey + 10000000, 'I', o_totalprice, '5-LOW'
  FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey, 'D', o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 7
)
SELECT COALESCE(b.o_orderkey, d.o_orderkey) AS o_orderkey,
       CASE WHEN d.op IS NOT NULL THEN d.o_totalprice ELSE b.o_totalprice END
         AS o_totalprice,
       CASE WHEN d.op IS NOT NULL THEN d.o_orderpriority ELSE b.o_orderpriority END
         AS o_orderpriority,
       CASE WHEN d.op IS NOT NULL THEN 'upsert' ELSE 'base' END AS row_origin
FROM base b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
WHERE d.op IS NULL OR d.op <> 'D'"""


# ---------------------------------------------------------------------------
# Incremental maintenance of a materialized aggregate (degree view)
# ---------------------------------------------------------------------------

def degrees_incremental(base_edges: DataFrame, delta_edges: DataFrame) -> DataFrame:
    """Maintain the per-node degree view under an edge-batch append
    WITHOUT rescanning the base graph: aggregate ONLY the delta, then
    merge the two aggregates by summing (degree is a self-maintainable
    view under inserts — the classic incremental-view-maintenance case).

    In production the base aggregate is read back from its sink (it is
    |V| rows, not |E|); here it is computed once from ``base_edges`` so
    the operator stays self-contained.  The merge is a full-outer join
    on the node id: new nodes appear, untouched nodes carry through.
    """
    from twitter_followers_patterns_mapreduce_spark.operators.graph import degrees

    return merge_degrees(degrees(base_edges), degrees(delta_edges))


def merge_degrees(base_agg: DataFrame, delta_agg: DataFrame) -> DataFrame:
    """Merge two (id, out_deg, in_deg) degree AGGREGATES by summing —
    the reusable half of :func:`degrees_incremental` (the streaming
    maintainer feeds it the persisted view directly, |V| rows, so the
    base graph is never re-aggregated)."""
    d = delta_agg.select(
        F.col("id"), F.col("out_deg").alias("d_out"), F.col("in_deg").alias("d_in")
    )
    return (
        base_agg.join(d, on="id", how="full_outer")
        .select(
            "id",
            (F.coalesce("out_deg", F.lit(0)) + F.coalesce("d_out", F.lit(0)))
            .cast("long")
            .alias("out_deg"),
            (F.coalesce("in_deg", F.lit(0)) + F.coalesce("d_in", F.lit(0)))
            .cast("long")
            .alias("in_deg"),
        )
    )


def snapshot_diff(
    v1: DataFrame, v2: DataFrame, key: str, payload_hash_expr: str
) -> DataFrame:
    """Table-version diff — the data-diff audit every pipeline runs
    before promoting a new snapshot: classify every key as
    added / removed / changed / unchanged by comparing a payload hash
    across versions (one full-outer equi-join on the key; the hash is
    computed scan-side on each version, so wide payloads never travel
    through the join).

    ``payload_hash_expr`` must render values engine-portably (integers
    / exact-scaled strings — raw doubles stringify differently across
    engines).  Output: (change_type, n_rows, min_key, max_key) — the
    min/max keys bind the summary to content, so a misclassified key
    moves a bucket's bounds, not just its count.
    """
    a = v1.selectExpr(f"{key} AS k", f"{payload_hash_expr} AS h1")
    b = v2.selectExpr(f"{key} AS k", f"{payload_hash_expr} AS h2")
    cls = (
        a.join(b, "k", "full_outer")
        .selectExpr(
            "k",
            "CASE WHEN h1 IS NULL THEN 'added' "
            "WHEN h2 IS NULL THEN 'removed' "
            "WHEN h1 = h2 THEN 'unchanged' ELSE 'changed' END AS change_type",
        )
    )
    return cls.groupBy("change_type").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


def orders_snapshot_diff(orders: DataFrame) -> DataFrame:
    """Named-query body: diff the base orders snapshot against the
    CDC-merged one — the diff must recover exactly the delta's change
    classes (update keys → changed, inserts → added, deletes → removed),
    closing the loop on :func:`orders_cdc_merge`."""
    base = orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
    merged = orders_cdc_merge(orders).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    payload = (
        "md5(concat_ws('|', CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING),"
        " o_orderpriority))"
    )
    return snapshot_diff(base, merged, "o_orderkey", payload)


ORDERS_SNAPSHOT_DIFF_ORACLE = f"""WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
),
merged AS ({ORDERS_CDC_MERGE_ORACLE}),
a AS (SELECT o_orderkey AS k,
  md5(concat_ws('|', CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
    o_orderpriority)) AS h1 FROM base),
b AS (SELECT o_orderkey AS k,
  md5(concat_ws('|', CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
    o_orderpriority)) AS h2 FROM merged),
cls AS (
  SELECT COALESCE(a.k, b.k) AS k,
    CASE WHEN h1 IS NULL THEN 'added'
         WHEN h2 IS NULL THEN 'removed'
         WHEN h1 = h2 THEN 'unchanged' ELSE 'changed' END AS change_type
  FROM a FULL OUTER JOIN b ON a.k = b.k)
SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
  MIN(k) AS min_key, MAX(k) AS max_key
FROM cls GROUP BY change_type"""
