"""Join planning & estimation operators — the statistics a 100 TB
query planner (or a human sizing a shuffle) needs BEFORE running the
join: exact join cardinality from key-degree products, hot-key skew
diagnosis with a concrete salt-factor recommendation, and a
hash-universe sampled estimate for when even the degree tables are too
big to join in full.

The reference hard-codes its one join strategy per job class
(``rsjoin/RSJoinTriangleCount.java`` shuffles, the documented Rep-Join
broadcasts) and leaves sizing to the operator author; this module is
the engine's answer to "which strategy, and with how much salt?" as
first-class queries over the same tables.

Scale shape, all three operators: the fact tables are touched exactly
once each by a key-count hash aggregate (map-side combinable — the
shuffle carries |distinct keys| rows, not |rows|), and everything
downstream runs on the two degree tables, whose size is the key
universe, not the data.  Σ c_L(k)·c_R(k) over the matched keys IS the
exact inner-join output cardinality — no join is ever materialized.

Cross-engine exactness: counts are BIGINT, degree products are summed
as DECIMAL(38,0) (a single hot key pair can hit 2^63 long before the
data does), ratios are closed-form doubles floored at 1e-6 with
identical expression text in Spark SQL and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

#: floor-at-1e-6 suffix shared by every ratio column on both engines
_F6 = "* 1000000) / 1000000"


def _degree_counts(df: DataFrame, key: str) -> DataFrame:
    """(k, c) key-degree table — one map-side-combinable hash agg."""
    return df.groupBy(F.col(key).cast("long").alias("k")).agg(
        F.count("*").cast("long").alias("c")
    )


def join_cardinality_estimate(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Exact inner-equi-join cardinality WITHOUT running the join:
    |L ⋈ R| = Σ_k c_L(k)·c_R(k), computed on the two key-degree tables
    full-outer-joined on the key — plus the uniform-keys estimate a
    textbook optimizer would make (|L|·|R| / max(d_L, d_R)) and the
    skew ratio exact/uniform that says how wrong that estimate is.

    One shuffle per side (degree agg), one equi-join of degree tables,
    one 1-row reduce: at 100 TB the joined spine is |key universe|
    rows, never |data| rows, and the full-outer join keeps the row
    counts and distinct counts of BOTH sides in the same single pass
    (no separate totals aggregate, no cross join anywhere).

    Output (1 row): left_rows, right_rows, left_keys, right_keys,
    match_keys, exact_join_rows, uniform_estimate, skew_ratio.
    """
    cl = _degree_counts(left, left_key).withColumnRenamed("c", "cl")
    cr = _degree_counts(right, right_key).withColumnRenamed("c", "cr")
    spine = cl.join(cr, "k", "full_outer")
    agg = spine.agg(
        F.sum("cl").cast("long").alias("left_rows"),
        F.sum("cr").cast("long").alias("right_rows"),
        F.count("cl").cast("long").alias("left_keys"),
        F.count("cr").cast("long").alias("right_keys"),
        F.sum(
            F.when(F.col("cl").isNotNull() & F.col("cr").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("match_keys"),
        F.sum(
            F.expr("CAST(cl AS DECIMAL(38,0)) * cr")
        ).alias("_exact_dec"),
    )
    uniform = (
        "(CAST(left_rows AS DOUBLE) * right_rows"
        " / CAST(greatest(left_keys, right_keys) AS DOUBLE))"
    )
    return agg.selectExpr(
        "left_rows",
        "right_rows",
        "left_keys",
        "right_keys",
        "match_keys",
        "CAST(coalesce(_exact_dec, 0) AS BIGINT) AS exact_join_rows",
        f"floor({uniform} {_F6} AS uniform_estimate",
        "CASE WHEN left_keys > 0 AND right_keys > 0 AND coalesce(_exact_dec, 0) > 0"
        f" THEN floor(CAST(_exact_dec AS DOUBLE) / {uniform} {_F6} END AS skew_ratio",
    )


def join_cardinality_oracle(
    left_table: str, right_table: str, left_key: str, right_key: str
) -> str:
    uniform = (
        "(CAST(left_rows AS DOUBLE) * right_rows"
        " / CAST(greatest(left_keys, right_keys) AS DOUBLE))"
    )
    return f"""WITH cl AS (
  SELECT CAST({left_key} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS cl
  FROM {left_table} GROUP BY 1),
cr AS (
  SELECT CAST({right_key} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS cr
  FROM {right_table} GROUP BY 1),
spine AS (SELECT cl.cl, cr.cr FROM cl FULL OUTER JOIN cr USING (k)),
agg AS (
  SELECT CAST(SUM(cl) AS BIGINT) AS left_rows,
         CAST(SUM(cr) AS BIGINT) AS right_rows,
         CAST(COUNT(cl) AS BIGINT) AS left_keys,
         CAST(COUNT(cr) AS BIGINT) AS right_keys,
         CAST(SUM(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS match_keys,
         SUM(CAST(cl AS DECIMAL(38,0)) * cr) AS _exact_dec
  FROM spine)
SELECT left_rows, right_rows, left_keys, right_keys, match_keys,
  CAST(coalesce(_exact_dec, 0) AS BIGINT) AS exact_join_rows,
  floor({uniform} {_F6} AS uniform_estimate,
  CASE WHEN left_keys > 0 AND right_keys > 0 AND coalesce(_exact_dec, 0) > 0
       THEN floor(CAST(_exact_dec AS DOUBLE) / {uniform} {_F6} END AS skew_ratio
FROM agg"""


def join_skew_planner(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    target_rows_per_task: int = 5_000_000,
    k: int = 10,
) -> DataFrame:
    """Hot-key diagnosis + salting prescription for a planned equi-join:
    the top-k keys by join-output contribution, each with its exact
    per-key output rows, its share of the total, and the salt factor
    ``ceil(out_rows / target_rows_per_task)`` that
    :func:`operators.skew.salted_join` would need to spread that key's
    work across tasks (salt 1 = no salting needed).

    This is the measurement half of the skew playbook (AQE skew-join
    handles moderate cases at runtime; EXTREME keys want pre-salting,
    and you cannot pick ``n_salts`` without these numbers).  Inner-join
    the two degree tables (matched keys only — unmatched keys produce
    no output and need no salt), cross the |matched keys|-row result
    with the 1-row total for shares (declared cardinality × 1, the
    chi2/woe house shape), TakeOrdered the top k.

    Output (≤ k rows): key, left_rows, right_rows, out_rows, out_share,
    salt_factor.
    """
    cl = _degree_counts(left, left_key).withColumnRenamed("c", "cl")
    cr = _degree_counts(right, right_key).withColumnRenamed("c", "cr")
    per_key = cl.join(cr, "k").select(
        F.col("k").alias("key"),
        F.col("cl").alias("left_rows"),
        F.col("cr").alias("right_rows"),
        F.expr("CAST(cl AS DECIMAL(38,0)) * cr").alias("_out_dec"),
    )
    tot = per_key.agg(F.sum("_out_dec").alias("_tot_dec"))
    return (
        per_key.crossJoin(F.broadcast(tot))
        .selectExpr(
            "key",
            "left_rows",
            "right_rows",
            "CAST(_out_dec AS BIGINT) AS out_rows",
            f"floor(CAST(_out_dec AS DOUBLE) / CAST(_tot_dec AS DOUBLE) {_F6} AS out_share",
            f"CAST(ceil(CAST(_out_dec AS DOUBLE) / {target_rows_per_task}) AS BIGINT)"
            " AS salt_factor",
        )
        .orderBy(F.col("out_rows").desc(), F.col("key").asc())
        .limit(k)
    )


def join_skew_planner_oracle(
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    target_rows_per_task: int = 5_000_000,
    k: int = 10,
) -> str:
    return f"""WITH cl AS (
  SELECT CAST({left_key} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS cl
  FROM {left_table} GROUP BY 1),
cr AS (
  SELECT CAST({right_key} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS cr
  FROM {right_table} GROUP BY 1),
per_key AS (
  SELECT cl.k AS key, cl AS left_rows, cr AS right_rows,
         CAST(cl AS DECIMAL(38,0)) * cr AS _out_dec
  FROM cl JOIN cr ON cl.k = cr.k),
tot AS (SELECT SUM(_out_dec) AS _tot_dec FROM per_key)
SELECT key, left_rows, right_rows,
  CAST(_out_dec AS BIGINT) AS out_rows,
  floor(CAST(_out_dec AS DOUBLE) / CAST(_tot_dec AS DOUBLE) {_F6} AS out_share,
  CAST(ceil(CAST(_out_dec AS DOUBLE) / {target_rows_per_task}) AS BIGINT) AS salt_factor
FROM per_key CROSS JOIN tot
ORDER BY out_rows DESC, key ASC
LIMIT {k}"""


def join_universe_sample_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    pct: int = 10,
    bound: float = 0.15,
) -> DataFrame:
    """Universe-sampled join-size estimate, gated against the exact
    count it approximates.  Universe sampling (keep a key iff
    ``h64(key) % 100 < pct``, SAME hash both sides) is the only
    sampling scheme under which a sampled equi-join is unbiased for
    COUNT: Bernoulli row sampling destroys the per-key degree products
    (E[ĉ_L·ĉ_R] ≠ p²·c_L·c_R summed correctly across keys only under
    key-synchronized inclusion).  At 100 TB this is how you size a
    join you cannot afford to degree-count in full: both scans prune
    to pct% of the KEY universe before any shuffle.

    The estimate is Σ_sampled c_L·c_R × (100/pct); the exact companion
    recomputes the full Σ (one extra degree-join — the gate's cost,
    exactly the kll/theta discipline), and ``within_bound`` asserts
    relative error ≤ ``bound``.  The hash is the md5-derived h64 both
    engines compute bit-identically, so the oracle reproduces the
    sample, the estimate, AND the verdict.

    Output (1 row): sampled_join_rows, scaled_estimate, exact_join_rows,
    abs_rel_err, within_bound.
    """

    def _sampled_degrees(df: DataFrame, key: str) -> DataFrame:
        h = h64_sql(f"CAST(CAST({key} AS BIGINT) AS STRING)", "spark")
        return (
            df.where(F.expr(f"{h} % 100 < {pct}"))
            .groupBy(F.col(key).cast("long").alias("k"))
            .agg(F.count("*").cast("long").alias("c"))
        )

    sl = _sampled_degrees(left, left_key).withColumnRenamed("c", "cl")
    sr = _sampled_degrees(right, right_key).withColumnRenamed("c", "cr")
    sampled = sl.join(sr, "k").agg(
        F.sum(F.expr("CAST(cl AS DECIMAL(38,0)) * cr")).alias("_samp_dec")
    )
    el = _degree_counts(left, left_key).withColumnRenamed("c", "cl")
    er = _degree_counts(right, right_key).withColumnRenamed("c", "cr")
    exact = el.join(er, "k").agg(
        F.sum(F.expr("CAST(cl AS DECIMAL(38,0)) * cr")).alias("_exact_dec")
    )
    # 1 × 1 declared cross: sampled reduce × exact reduce (gate shape)
    both = sampled.crossJoin(F.broadcast(exact))
    # 100.0/pct, not 100//pct: integer division silently biases the
    # estimate low for pct not dividing 100 (15 -> x6 instead of x6.67);
    # IEEE double math + explicit floor is bit-identical cross-engine
    factor = f"* 100.0 / {pct}"
    err = (
        f"abs(CAST(coalesce(_samp_dec, 0) AS DOUBLE) {factor}"
        " - CAST(_exact_dec AS DOUBLE)) / CAST(_exact_dec AS DOUBLE)"
    )
    return both.selectExpr(
        "CAST(coalesce(_samp_dec, 0) AS BIGINT) AS sampled_join_rows",
        f"CAST(floor(CAST(coalesce(_samp_dec, 0) AS DOUBLE) {factor}) AS BIGINT)"
        " AS scaled_estimate",
        "CAST(coalesce(_exact_dec, 0) AS BIGINT) AS exact_join_rows",
        f"CASE WHEN coalesce(_exact_dec, 0) > 0 THEN floor({err} {_F6} END AS abs_rel_err",
        f"CASE WHEN coalesce(_exact_dec, 0) > 0 THEN {err} <= {bound} END AS within_bound",
    )


def join_universe_sample_oracle(
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    pct: int = 10,
    bound: float = 0.15,
) -> str:
    h_l = h64_sql(f"CAST(CAST({left_key} AS BIGINT) AS VARCHAR)", "duckdb")
    h_r = h64_sql(f"CAST(CAST({right_key} AS BIGINT) AS VARCHAR)", "duckdb")
    factor = f"* 100.0 / {pct}"
    err = (
        f"abs(CAST(coalesce(_samp_dec, 0) AS DOUBLE) {factor}"
        " - CAST(_exact_dec AS DOUBLE)) / CAST(_exact_dec AS DOUBLE)"
    )
    return f"""WITH sl AS (
  SELECT CAST({left_key} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS cl
  FROM {left_table} WHERE {h_l} % 100 < {pct} GROUP BY 1),
sr AS (
  SELECT CAST({right_key} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS cr
  FROM {right_table} WHERE {h_r} % 100 < {pct} GROUP BY 1),
samp AS (
  SELECT SUM(CAST(cl AS DECIMAL(38,0)) * cr) AS _samp_dec
  FROM sl JOIN sr ON sl.k = sr.k),
el AS (
  SELECT CAST({left_key} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS cl
  FROM {left_table} GROUP BY 1),
er AS (
  SELECT CAST({right_key} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS cr
  FROM {right_table} GROUP BY 1),
ex AS (
  SELECT SUM(CAST(cl AS DECIMAL(38,0)) * cr) AS _exact_dec
  FROM el JOIN er ON el.k = er.k)
SELECT CAST(coalesce(_samp_dec, 0) AS BIGINT) AS sampled_join_rows,
  CAST(floor(CAST(coalesce(_samp_dec, 0) AS DOUBLE) {factor}) AS BIGINT) AS scaled_estimate,
  CAST(coalesce(_exact_dec, 0) AS BIGINT) AS exact_join_rows,
  CASE WHEN coalesce(_exact_dec, 0) > 0 THEN floor({err} {_F6} END AS abs_rel_err,
  CASE WHEN coalesce(_exact_dec, 0) > 0 THEN {err} <= {bound} END AS within_bound
FROM samp CROSS JOIN ex"""
