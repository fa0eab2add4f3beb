"""Deterministic k-means (Lloyd's algorithm) over the ``embeddings``
table — the coarse-quantizer trainer for IVF-style ANN
(``operators/similarity.py`` uses the harness ``label`` column as a
stand-in assignment; this is the real trainer, Spark-first).

Oracle-exact iterative ML, same recipe as PageRank
(``operators/graph_iter.py``): fixed iteration count, deterministic
init (the first ``k`` vectors by ``vec_id``), per-dimension means
reduced in DECIMAL (order-independent), distances as IEEE-double folds
in index order (bit-identical across engines), and the argmin floored
onto a 1e-9 grid with a cid tie-break so assignment never depends on a
last-ulp difference.  The DuckDB oracle is the same fixed-point
unrolled as a CTE chain.

Scale shape per iteration: one bounded |V| × k cross against the
broadcast centroid table (the declared IVF probe pattern), one
partitioned argmin window, one posexplode + hash-agg for the means —
no global windows, no data-sized cross joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.functions.vector import as_double
from twitter_followers_patterns_mapreduce_spark.sources.readers import fan_out

_DEC = "decimal(28,12)"
#: argmin comparisons happen on floor(dist² · GRID): absorbs any
#: cross-engine last-ulp noise; ties broken by cid.
_GRID = 1_000_000_000
DIMS = 64


def _dist2(v: Column, c: Column) -> Column:
    """Squared L2 distance as a sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, v, cid): nearest centroid per vector — bounded |V| × k
    cross against the broadcast centroid table, grid-floored argmin."""
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "cid",
        F.floor(_dist2(F.col("v"), F.col("c")) * _GRID).alias("d"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )


def _update(assign: DataFrame) -> DataFrame:
    """(cid, c): per-dimension DECIMAL-mean of each cluster's members."""
    dims = assign.select("cid", F.posexplode_outer("v").alias("pos", "val"))
    means = dims.groupBy("cid", "pos").agg(
        (F.sum(F.col("val").cast(_DEC)).cast("double") / F.count("*")).alias("m")
    )
    return means.groupBy("cid").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)").alias("c")
    )


def kmeans_fit(embeddings: DataFrame, k: int = 8, iters: int = 2) -> DataFrame:
    """``iters`` Lloyd update rounds from the deterministic init, then a
    final assignment; returns the exploded centroid table
    (cid, dim, centroid_val 6dp, n_members) — flat doubles, no nested
    arrays in the comparable output."""
    emb = fan_out(embeddings).select("vec_id", as_double("embedding").alias("v"))
    cents = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    for _ in range(iters):
        cents = _update(_assign(emb, cents))
    final = _assign(emb, cents)
    counts = final.groupBy("cid").agg(F.count("*").alias("n_members"))
    out = cents.select("cid", F.posexplode_outer("c").alias("dim", "centroid_val"))
    return out.join(counts, "cid").selectExpr(
        "cid",
        "CAST(dim AS BIGINT) AS dim",
        "floor(centroid_val * 1e6) / 1e6 AS centroid_val",
        "n_members",
    )


def _dist2_sql(v: str, c: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, {DIMS + 1}), "
        f"i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])), 'sum')"
    )


def kmeans_fit_oracle(k: int = 8, iters: int = 2) -> str:
    """The same fixed-point unrolled as a DuckDB CTE chain."""
    parts = [
        f"""WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), c0 AS (
  SELECT vec_id AS cid, v AS c FROM emb WHERE vec_id < {k}
)"""
    ]
    d = _dist2_sql("e.v", "c.c")
    for i in range(iters + 1):  # iters updates + the final assignment
        parts.append(
            f""",
a{i} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY floor({d} * {_GRID}) ASC, c.cid ASC) AS rn
    FROM emb e CROSS JOIN c{i} c
  ) WHERE rn = 1
)"""
        )
        if i < iters:
            parts.append(
                f""",
c{i + 1} AS (
  SELECT cid, list(m ORDER BY i) AS c FROM (
    SELECT cid, i,
           CAST(SUM(CAST(v[i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
    FROM a{i}, (SELECT unnest(range(1, {DIMS + 1})) AS i) dims
    GROUP BY cid, i
  ) GROUP BY cid
)"""
            )
    parts.append(
        f"""
SELECT c.cid,
       CAST(i - 1 AS BIGINT) AS dim,
       floor(c.c[i] * 1e6) / 1e6 AS centroid_val,
       n.n_members
FROM c{iters} c,
     (SELECT unnest(range(1, {DIMS + 1})) AS i) dims,
     (SELECT cid, COUNT(*) AS n_members FROM a{iters} GROUP BY cid) n
WHERE n.cid = c.cid"""
    )
    return "".join(parts)
