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


def join_key_overlap_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    rel_tol: float = 0.05,
) -> DataFrame:
    """Theta-sketch KEY-OVERLAP profile for a prospective join — the
    sketch-side companion of :func:`join_cardinality_estimate`: how many
    distinct keys are left-only / common / right-only, answered by two
    fixed-size mergeable theta sketches instead of a key-universe
    shuffle.  At 100 TB this is the first question before choosing a
    join strategy (a near-empty intersection says semi-join-prefilter;
    containment says broadcast the smaller key set), and theta sketches
    answer it from independent per-table scans whose partial states
    merge — no co-shuffle of the two key universes ever happens.

    The exact companion (the kll/theta gate discipline) rides ONE
    tagged union scan: three COUNT(DISTINCT CASE...) give left/right/
    union exactly, and inclusion-exclusion derives the intersection —
    the sketch estimates then feed asserted ``ok_*`` booleans (error ≤
    max(rel_tol·exact, 2); default-k theta sits in exact mode at
    harness scale so observed error is 0, and the DuckDB oracle pins
    the booleans TRUE).  Distinct aggs and sketch aggs run as SEPARATE
    aggregates joined 1×1 (the theta_set_profile plan note: mixing
    multi-DISTINCT with buffer aggs routes every buffer through the
    Expand).

    Output (1 row): n_left_keys, n_right_keys, n_common, n_left_only,
    n_right_only, ok_left, ok_right, ok_common.
    """
    tagged = left.selectExpr(
        f"CAST({left_key} AS BIGINT) AS k", "1 AS is_l"
    ).unionAll(right.selectExpr(f"CAST({right_key} AS BIGINT) AS k", "0 AS is_l"))
    exact = tagged.agg(
        F.expr(
            "CAST(COUNT(DISTINCT CASE WHEN is_l = 1 THEN k END) AS BIGINT)"
        ).alias("n_left_keys"),
        F.expr(
            "CAST(COUNT(DISTINCT CASE WHEN is_l = 0 THEN k END) AS BIGINT)"
        ).alias("n_right_keys"),
        F.expr("CAST(COUNT(DISTINCT k) AS BIGINT)").alias("n_union"),
    )
    # lgK=16: exact through 65536 distinct keys per side (covers sf0.1's
    # 15k custkeys with headroom); past exact mode rsd ~0.4%, so the 5%
    # ok bound stays ~12 sigma — the oracle's TRUE pin never flakes
    sk = tagged.agg(
        F.expr("theta_sketch_agg(CASE WHEN is_l = 1 THEN k END, 16)").alias("skl"),
        F.expr("theta_sketch_agg(CASE WHEN is_l = 0 THEN k END, 16)").alias("skr"),
    )

    def ok(est: str, exact_col: str) -> str:
        return (
            f"abs(CAST({est} AS DOUBLE) - {exact_col}) <= "
            f"greatest({rel_tol!r} * {exact_col}, CAST(2 AS DOUBLE))"
        )

    # 1 × 1 declared cross: exact reduce × sketch reduce (gate shape)
    return (
        exact.crossJoin(F.broadcast(sk))
        .selectExpr(
            "n_left_keys",
            "n_right_keys",
            "n_left_keys + n_right_keys - n_union AS n_common",
            "n_union - n_right_keys AS n_left_only",
            "n_union - n_left_keys AS n_right_only",
            "theta_sketch_estimate(skl) AS e_l",
            "theta_sketch_estimate(skr) AS e_r",
            "theta_sketch_estimate(theta_intersection(skl, skr)) AS e_common",
        )
        .selectExpr(
            "n_left_keys",
            "n_right_keys",
            "n_common",
            "n_left_only",
            "n_right_only",
            ok("e_l", "n_left_keys") + " AS ok_left",
            ok("e_r", "n_right_keys") + " AS ok_right",
            ok("e_common", "n_common") + " AS ok_common",
        )
    )


def join_key_overlap_oracle(
    left_table: str, right_table: str, left_key: str, right_key: str
) -> str:
    return f"""WITH t AS (
  SELECT CAST({left_key} AS BIGINT) AS k, 1 AS is_l FROM {left_table}
  UNION ALL
  SELECT CAST({right_key} AS BIGINT) AS k, 0 AS is_l FROM {right_table}),
agg AS (
  SELECT
    CAST(COUNT(DISTINCT CASE WHEN is_l = 1 THEN k END) AS BIGINT) AS n_left_keys,
    CAST(COUNT(DISTINCT CASE WHEN is_l = 0 THEN k END) AS BIGINT) AS n_right_keys,
    CAST(COUNT(DISTINCT k) AS BIGINT) AS n_union
  FROM t)
SELECT n_left_keys, n_right_keys,
  n_left_keys + n_right_keys - n_union AS n_common,
  n_union - n_right_keys AS n_left_only,
  n_union - n_left_keys AS n_right_only,
  TRUE AS ok_left, TRUE AS ok_right, TRUE AS ok_common
FROM agg"""


def bucket_layout_advisor(
    df: DataFrame, key: str, target_rows_per_bucket: int = 50000
) -> DataFrame:
    """Physical-layout prescription for bucketing a table on ``key``:
    pick the bucket count (next power of two of rows/target — the
    convention bucketed-table ecosystems expect so bucket counts
    compose by halving), then MEASURE the realized distribution by
    pushing every key's degree through the engine's own h64 bucket
    assignment — max bucket rows, imbalance vs the uniform ideal, and
    a salt flag when one key alone overflows a bucket (a hot key's
    whole degree lands in ONE bucket no matter how many buckets).

    Scale shape: one key-degree hash agg touches the data (|keys|-row
    spine, the planner-family discipline); bucket assignment,
    per-bucket sums, and the readout all run on the spine.  The same
    h64 both engines compute bit-identically assigns buckets, so the
    oracle reproduces the REALIZED distribution, not just the formula.

    Output (1 row): n_rows, n_keys, max_key_rows, n_buckets,
    n_nonempty_buckets, avg_bucket_rows, max_bucket_rows, imbalance,
    salt_advice.
    """
    deg = _degree_counts(df, key)
    totals = deg.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_key_rows"),
    ).selectExpr(
        "n_rows",
        "n_keys",
        "max_key_rows",
        # next power of two of ceil(rows/target); log2/power on small
        # integers are IEEE-exact in both engines
        "CAST(power(2, ceil(log2(greatest(CAST(ceil(CAST(n_rows AS DOUBLE)"
        f" / {target_rows_per_bucket}) AS DOUBLE), 1.0)))) AS BIGINT) AS n_buckets",
    )
    h = h64_sql("CAST(k AS STRING)", "spark")
    # |keys|-row spine × 1-row totals: declared cardinality × 1 cross
    per_bucket = (
        deg.crossJoin(F.broadcast(totals))
        .selectExpr(f"{h} % n_buckets AS b", "c")
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("rows_b"))
    )
    realized = per_bucket.agg(
        F.max("rows_b").cast("long").alias("max_bucket_rows"),
        F.count("*").cast("long").alias("n_nonempty_buckets"),
    )
    return totals.crossJoin(F.broadcast(realized)).selectExpr(
        "n_rows",
        "n_keys",
        "max_key_rows",
        "n_buckets",
        "n_nonempty_buckets",
        "n_rows div n_buckets AS avg_bucket_rows",
        "max_bucket_rows",
        "floor(CAST(max_bucket_rows AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_buckets)"
        f" {_F6} AS imbalance",
        "max_key_rows > 2 * (CAST(n_rows AS DOUBLE) / n_buckets) AS salt_advice",
    )


def bucket_layout_oracle(
    table: str, key: str, target_rows_per_bucket: int = 50000
) -> str:
    h = h64_sql("CAST(k AS VARCHAR)", "duckdb")
    return f"""WITH deg AS (
  SELECT CAST({key} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1),
totals AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_key_rows,
         CAST(power(2, ceil(log2(greatest(CAST(ceil(CAST(SUM(c) AS DOUBLE)
           / {target_rows_per_bucket}) AS DOUBLE), 1.0)))) AS BIGINT) AS n_buckets
  FROM deg),
per_bucket AS (
  SELECT {h} % n_buckets AS b, CAST(SUM(c) AS BIGINT) AS rows_b
  FROM deg CROSS JOIN totals GROUP BY 1),
realized AS (
  SELECT CAST(MAX(rows_b) AS BIGINT) AS max_bucket_rows,
         CAST(COUNT(*) AS BIGINT) AS n_nonempty_buckets
  FROM per_bucket)
SELECT n_rows, n_keys, max_key_rows, n_buckets, n_nonempty_buckets,
  n_rows // n_buckets AS avg_bucket_rows,
  max_bucket_rows,
  floor(CAST(max_bucket_rows AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_buckets)
    {_F6} AS imbalance,
  max_key_rows > 2 * (CAST(n_rows AS DOUBLE) / n_buckets) AS salt_advice
FROM totals CROSS JOIN realized"""


def partition_layout_advisor(
    df: DataFrame, date_col: str, min_rows_per_partition: int = 20000
) -> DataFrame:
    """Partition-granularity prescription for a date-partitioned table:
    profile day / week / month partitioning from ONE fact scan and
    recommend the FINEST granularity whose average partition still
    clears ``min_rows_per_partition`` — the small-files rule every
    lakehouse layout doc states and every 100 TB ingest job needs
    decided before the first write.

    Scale shape: the fact table collapses once to the bounded day
    spine (epoch-day arithmetic, the engine's dayofweek-proof
    discipline — never date_trunc('week')); week and month profiles
    REGROUP the day spine, so granularity comparison costs day-spine
    rows, not data rows.  The recommendation is a 3-row unpartitioned
    window over the granularity spine (bounded by construction).

    Output (3 rows): granularity, n_partitions, n_rows,
    avg_partition_rows, max_partition_rows, skew, meets_target,
    recommended.
    """
    dayspine = (
        df.selectExpr(
            f"datediff({date_col}, DATE '1970-01-01') AS d",
            f"(EXTRACT(YEAR FROM {date_col}) * 12 + EXTRACT(MONTH FROM {date_col})) AS m",
        )
        .groupBy("d", "m")
        .agg(F.count("*").cast("long").alias("c"))
    )

    def profile(spine: DataFrame, name: str, ordn: int) -> DataFrame:
        return spine.agg(
            F.count("*").cast("long").alias("n_partitions"),
            F.sum("c").cast("long").alias("n_rows"),
            F.max("c").cast("long").alias("max_partition_rows"),
        ).selectExpr(
            f"'{name}' AS granularity",
            f"{ordn} AS ord",
            "n_partitions",
            "n_rows",
            "max_partition_rows",
        )

    day = profile(dayspine, "day", 1)
    week = profile(
        dayspine.groupBy(F.expr("d div 7").alias("w")).agg(
            F.sum("c").cast("long").alias("c")
        ),
        "week",
        2,
    )
    month = profile(
        dayspine.groupBy("m").agg(F.sum("c").cast("long").alias("c")), "month", 3
    )
    from pyspark.sql import Window

    rows = day.unionAll(week).unionAll(month).selectExpr(
        "granularity",
        "ord",
        "n_partitions",
        "n_rows",
        "n_rows div n_partitions AS avg_partition_rows",
        "max_partition_rows",
        "floor(CAST(max_partition_rows AS DOUBLE)"
        f" / (CAST(n_rows AS DOUBLE) / n_partitions) {_F6} AS skew",
        f"n_rows div n_partitions >= {min_rows_per_partition} AS meets_target",
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return rows.withColumn(
        "recommended",
        F.col("meets_target")
        & (F.col("ord") == F.min(F.when(F.col("meets_target"), F.col("ord"))).over(w)),
    ).drop("ord")


def partition_layout_oracle(
    table: str, date_col: str, min_rows_per_partition: int = 20000
) -> str:
    return f"""WITH dayspine AS (
  SELECT datediff('day', DATE '1970-01-01', CAST({date_col} AS DATE)) AS d,
         (EXTRACT(YEAR FROM {date_col}) * 12 + EXTRACT(MONTH FROM {date_col})) AS m,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2),
day_p AS (
  SELECT 'day' AS granularity, 1 AS ord, CAST(COUNT(*) AS BIGINT) AS n_partitions,
         CAST(SUM(c) AS BIGINT) AS n_rows, CAST(MAX(c) AS BIGINT) AS max_partition_rows
  FROM dayspine),
week_sp AS (SELECT d // 7 AS w, CAST(SUM(c) AS BIGINT) AS c FROM dayspine GROUP BY 1),
week_p AS (
  SELECT 'week', 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT), CAST(MAX(c) AS BIGINT)
  FROM week_sp),
month_sp AS (SELECT m, CAST(SUM(c) AS BIGINT) AS c FROM dayspine GROUP BY 1),
month_p AS (
  SELECT 'month', 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT), CAST(MAX(c) AS BIGINT)
  FROM month_sp),
u AS (SELECT * FROM day_p UNION ALL SELECT * FROM week_p UNION ALL SELECT * FROM month_p),
rows_ AS (
  SELECT granularity, ord, n_partitions, n_rows,
    n_rows // n_partitions AS avg_partition_rows,
    max_partition_rows,
    floor(CAST(max_partition_rows AS DOUBLE)
      / (CAST(n_rows AS DOUBLE) / n_partitions) {_F6} AS skew,
    n_rows // n_partitions >= {min_rows_per_partition} AS meets_target
  FROM u)
SELECT granularity, n_partitions, n_rows, avg_partition_rows, max_partition_rows,
  skew, meets_target,
  meets_target AND ord = MIN(CASE WHEN meets_target THEN ord END) OVER () AS recommended
FROM rows_"""


def _morton_sql(xc: str, yc: str, bits: int, dialect: str) -> str:
    """Morton (z-curve) interleave of two ``bits``-bit cells — pure
    integer bit arithmetic, spelled per dialect."""
    if dialect == "spark":
        terms = [
            f"shiftleft(shiftright({xc}, {i}) & 1, {2 * i})"
            f" + shiftleft(shiftright({yc}, {i}) & 1, {2 * i + 1})"
            for i in range(bits)
        ]
    else:
        terms = [
            f"((({xc} >> {i}) & 1) << {2 * i}) + ((({yc} >> {i}) & 1) << {2 * i + 1})"
            for i in range(bits)
        ]
    return "(" + " + ".join(terms) + ")"


def _zb_cells(dialect: str, bits: int) -> list[str]:
    """Shared cell/probe expressions for the z-order benefit estimator
    (x, y, min_x..max_y in scope).  Normalized integer cells make the
    comparison scale-free: both layouts get the same 4^bits-block
    universe at any data size.  Probe = the center-left 1/8 x 1/8 value
    rectangle, derived from the same stats row."""
    d = "div" if dialect == "spark" else "//"
    k_lin = 4**bits
    k = 2**bits
    rx = "(max_x - min_x + 1)"
    ry = "(max_y - min_y + 1)"
    cell_lin = f"(((x - min_x) * {k_lin}) {d} {rx})"
    xc = f"(((x - min_x) * {k}) {d} {rx})"
    yc = f"(((y - min_y) * {k}) {d} {ry})"
    probe = (
        f"x >= min_x + (({rx} * 2) {d} 8) AND x < min_x + (({rx} * 3) {d} 8)"
        f" AND y >= min_y + (({ry} * 2) {d} 8) AND y < min_y + (({ry} * 3) {d} 8)"
    )
    return [
        f"{cell_lin} AS block_lin",
        f"{_morton_sql(xc, yc, bits, dialect)} AS block_z",
        f"CAST({probe} AS BIGINT) AS in_probe",
    ]


def zorder_benefit_estimate(
    df: DataFrame, col_x: str, col_y: str, bits: int = 4
) -> DataFrame:
    """Z-order vs linear-sort layout benefit, estimated WITHOUT writing
    files: assign every row to its block under (a) a linear sort on x
    sliced into 4^bits equal value ranges and (b) a Morton-interleaved
    z-curve over 2^bits x 2^bits cells — the same block-count universe —
    then replay min-max file pruning for a fixed 1/8 x 1/8 probe
    rectangle against the per-block statistics each layout would write.
    ``rows_scanned / true_rows`` is the scan amplification a parquet
    reader would pay; the z layout keeps BOTH dimensions narrow per
    block, the linear layout leaves every block full-width in y (the
    write_zordered rationale, measured here as a query instead of a
    filesystem test).

    Scale shape: one 1-row min/max stats reduce, one scan computing both
    block ids (the stats row attaches by broadcast — the q22 discipline),
    two spine-sized per-block aggregates, two 1-row readouts unioned.
    Exact: normalized integer cells, integer row counts, ratios floored
    1e-6.

    Output (2 rows): layout, n_blocks, blocks_touched, rows_scanned,
    true_rows, scan_amplification, block_prune_frac.
    """
    base = df.selectExpr(
        f"CAST({col_x} AS BIGINT) AS x", f"CAST({col_y} AS BIGINT) AS y"
    )
    stats = base.agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    ).localCheckpoint(eager=False)
    # data x 1-row stats: declared cardinality x 1 broadcast cross;
    # lazily checkpointed so the two layout arms share ONE cell
    # materialization (and one stats job) instead of rescanning the
    # fact table per arm
    cells = (
        base.crossJoin(F.broadcast(stats))
        .selectExpr("x", "y", *_zb_cells("spark", bits))
        .localCheckpoint(eager=False)
    )

    def layout(block_col: str, name: str) -> DataFrame:
        blk = cells.groupBy(block_col).agg(
            F.count("*").cast("long").alias("rows_b"),
            F.min("x").alias("bx0"),
            F.max("x").alias("bx1"),
            F.min("y").alias("by0"),
            F.max("y").alias("by1"),
            F.sum("in_probe").cast("long").alias("true_b"),
        )
        # the probe rectangle re-derives from the same 1-row stats
        touched = (
            f"NOT (bx1 < min_x + (((max_x - min_x + 1) * 2) div 8)"
            f" OR bx0 >= min_x + (((max_x - min_x + 1) * 3) div 8)"
            f" OR by1 < min_y + (((max_y - min_y + 1) * 2) div 8)"
            f" OR by0 >= min_y + (((max_y - min_y + 1) * 3) div 8))"
        )
        return (
            blk.crossJoin(F.broadcast(stats))
            .selectExpr("rows_b", "true_b", f"CAST({touched} AS BIGINT) AS hit")
            .agg(
                F.count("*").cast("long").alias("n_blocks"),
                F.sum("hit").cast("long").alias("blocks_touched"),
                F.expr("CAST(SUM(hit * rows_b) AS BIGINT)").alias("rows_scanned"),
                F.sum("true_b").cast("long").alias("true_rows"),
            )
            .selectExpr(
                f"'{name}' AS layout",
                "n_blocks",
                "blocks_touched",
                "rows_scanned",
                "true_rows",
                "CASE WHEN true_rows > 0 THEN floor(CAST(rows_scanned AS DOUBLE)"
                f" / true_rows {_F6} END AS scan_amplification",
                "floor((1.0 - CAST(blocks_touched AS DOUBLE) / n_blocks)"
                f" {_F6} AS block_prune_frac",
            )
        )

    return layout("block_lin", "linear_x").unionAll(layout("block_z", "zorder"))


def zorder_benefit_oracle(table: str, col_x: str, col_y: str, bits: int = 4) -> str:
    cell_exprs = ",\n    ".join(_zb_cells("duckdb", bits))
    touched = (
        "NOT (bx1 < min_x + (((max_x - min_x + 1) * 2) // 8)"
        " OR bx0 >= min_x + (((max_x - min_x + 1) * 3) // 8)"
        " OR by1 < min_y + (((max_y - min_y + 1) * 2) // 8)"
        " OR by0 >= min_y + (((max_y - min_y + 1) * 3) // 8))"
    )

    def layout(block_col: str, name: str) -> str:
        return f"""SELECT '{name}' AS layout, n_blocks, blocks_touched, rows_scanned, true_rows,
  CASE WHEN true_rows > 0 THEN floor(CAST(rows_scanned AS DOUBLE) / true_rows {_F6} END
    AS scan_amplification,
  floor((1.0 - CAST(blocks_touched AS DOUBLE) / n_blocks) {_F6} AS block_prune_frac
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(hit) AS BIGINT) AS blocks_touched,
         CAST(SUM(hit * rows_b) AS BIGINT) AS rows_scanned,
         CAST(SUM(true_b) AS BIGINT) AS true_rows
  FROM (
    SELECT rows_b, true_b, CAST({touched} AS BIGINT) AS hit
    FROM (
      SELECT {block_col}, CAST(COUNT(*) AS BIGINT) AS rows_b,
             MIN(x) AS bx0, MAX(x) AS bx1, MIN(y) AS by0, MAX(y) AS by1,
             CAST(SUM(in_probe) AS BIGINT) AS true_b
      FROM cells GROUP BY 1) b
    CROSS JOIN stats) h) a"""

    return f"""WITH base AS (
  SELECT CAST({col_x} AS BIGINT) AS x, CAST({col_y} AS BIGINT) AS y FROM {table}),
stats AS (
  SELECT MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y FROM base),
cells AS (
  SELECT x, y,
    {cell_exprs}
  FROM base CROSS JOIN stats)
{layout('block_lin', 'linear_x')}
UNION ALL
{layout('block_z', 'zorder')}"""


def bucketed_join_twin(
    spark,
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    group_col: str,
    sum_col: str,
    table_prefix: str,
    path_root: str,
    n_buckets: int = 8,
) -> DataFrame:
    """EXECUTION twin of :func:`bucket_layout_advisor` — the advisor
    prescribes a bucket count; this operator APPLIES the layout and
    runs the join it pays for (the ``salted_skew_join`` twin
    discipline: planner families ship with the rewrite they
    prescribe).  Both sides persist hash-bucketed on the join key via
    ``sources.writers.write_bucketed`` (the shuffle is paid ONCE at
    write time), then the sort-merge join reads the co-located buckets
    with ZERO Exchange nodes — at 100 TB this is the difference
    between re-shuffling the fact table per query and never shuffling
    it again (the reference re-shuffles per job; tests/test_bucketing
    pins the plan delta, tests/test_plan_shapes pins this query's).

    Output: per-``group_col`` rollup of the joined rows — row count
    and an exact floored-cents BIGINT sum (DOUBLE money summed as
    integers so the reduction is order-independent under any bucket
    schedule), byte-identical to the plain join's rollup, which is
    exactly what the registered oracle checks.
    """
    import os

    from twitter_followers_patterns_mapreduce_spark.sources.writers import (
        write_bucketed,
    )

    f = fact.withColumnRenamed(fact_key, "_bkey")
    d = dim.withColumnRenamed(dim_key, "_bkey")
    write_bucketed(
        f, f"{table_prefix}_fact", "_bkey", n_buckets,
        path=os.path.join(path_root, "fact"),
    )
    write_bucketed(
        d, f"{table_prefix}_dim", "_bkey", n_buckets,
        path=os.path.join(path_root, "dim"),
    )
    joined = (
        spark.table(f"{table_prefix}_fact")
        .hint("merge")
        .join(spark.table(f"{table_prefix}_dim"), "_bkey")
    )
    return joined.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.expr(f"CAST(floor({sum_col} * 100) AS BIGINT)"))
        .cast("long")
        .alias("sum_cents"),
    )


def bucketed_join_twin_oracle(
    fact: str, fact_key: str, dim: str, dim_key: str,
    group_col: str, sum_col: str,
) -> str:
    return f"""SELECT {group_col},
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor({sum_col} * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM {fact} JOIN {dim} ON {fact_key} = {dim_key}
GROUP BY {group_col}"""


#: Fixed in-memory widths per column type for the strategy advisor's
#: build-side estimate (unsafe-row-ish: 8-byte word per fixed field;
#: strings cost length + an 8-byte offset/len word).  The ABSOLUTE
#: calibration matters less than being IDENTICAL in both engines —
#: the advisor compares sides against each other and a threshold.
_TYPE_WIDTH = {
    "bigint": 8, "long": 8, "double": 8, "int": 8, "integer": 8,
    "date": 8, "timestamp": 8, "boolean": 8,
}


def _row_bytes_expr(dtypes: list[tuple[str, str]], dialect: str) -> str:
    """Σ per-column byte estimate as one expression over a row —
    generated from ONE dtype spec so the Spark side and the DuckDB
    oracle can never disagree on widths."""
    parts = []
    for name, typ in dtypes:
        t = typ.lower()
        if t in ("string", "varchar"):
            ln = f"length({name})" if dialect == "spark" else f"length({name})"
            parts.append(f"(coalesce({ln}, 0) + 8)")
        else:
            parts.append(str(_TYPE_WIDTH.get(t, 8)))
    return " + ".join(parts)


def join_strategy_advisor(
    left: DataFrame,
    right: DataFrame,
    threshold_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Physical-join-strategy prescription from MEASURED side sizes —
    the byte-level companion of :func:`join_cardinality_estimate` (rows)
    and :func:`join_skew_planner` (degree skew): exact per-side byte
    estimates (Σ typed column widths, one map-side-combinable agg per
    side), compared against the broadcast threshold with the textbook
    decision Spark itself makes (``JoinSelection``):

      * smaller side ≤ threshold → BROADCAST_HASH, build = smaller side
      * else smaller ≤ larger/3  → SHUFFLED_HASH (build fits a task)
      * else                     → SORT_MERGE

    The reference hard-codes this choice per JOB (RS vs the
    replicated-join RJ, ``README.md:79-81``); here it is a measured,
    data-derived prescription.  At 100 TB the two aggregations are the
    only data-sized work; the decision is a 1×1 declared cross.

    Output (1 row): left_rows, right_rows, left_bytes, right_bytes,
    threshold_bytes, strategy, build_side.
    """

    def side(df: DataFrame, label: str) -> DataFrame:
        expr = _row_bytes_expr(df.dtypes, "spark")
        return df.selectExpr(f"CAST({expr} AS BIGINT) AS rb").agg(
            F.count("*").cast("long").alias(f"{label}_rows"),
            F.sum("rb").cast("long").alias(f"{label}_bytes"),
        )

    l, r = side(left, "left"), side(right, "right")
    return (
        l.crossJoin(F.broadcast(r))  # 1 × 1 declared cross
        .selectExpr(
            "left_rows",
            "right_rows",
            "left_bytes",
            "right_bytes",
            f"CAST({threshold_bytes} AS BIGINT) AS threshold_bytes",
            f"CASE WHEN least(left_bytes, right_bytes) <= {threshold_bytes}"
            " THEN 'broadcast_hash'"
            " WHEN least(left_bytes, right_bytes) * 3 <= greatest(left_bytes, right_bytes)"
            " THEN 'shuffled_hash' ELSE 'sort_merge' END AS strategy",
            "CASE WHEN least(left_bytes, right_bytes)"
            f" <= {threshold_bytes}"
            " OR least(left_bytes, right_bytes) * 3 <= greatest(left_bytes, right_bytes)"
            " THEN (CASE WHEN left_bytes <= right_bytes THEN 'left' ELSE 'right' END)"
            " END AS build_side",
        )
    )


def join_strategy_advisor_oracle(
    left_table: str,
    left_dtypes: list[tuple[str, str]],
    right_table: str,
    right_dtypes: list[tuple[str, str]],
    threshold_bytes: int = 64 * 1024 * 1024,
) -> str:
    le = _row_bytes_expr(left_dtypes, "duckdb")
    re_ = _row_bytes_expr(right_dtypes, "duckdb")
    return f"""WITH l AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS left_rows,
         CAST(SUM({le}) AS BIGINT) AS left_bytes FROM {left_table}),
r AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS right_rows,
         CAST(SUM({re_}) AS BIGINT) AS right_bytes FROM {right_table})
SELECT left_rows, right_rows, left_bytes, right_bytes,
  CAST({threshold_bytes} AS BIGINT) AS threshold_bytes,
  CASE WHEN least(left_bytes, right_bytes) <= {threshold_bytes}
       THEN 'broadcast_hash'
       WHEN least(left_bytes, right_bytes) * 3 <= greatest(left_bytes, right_bytes)
       THEN 'shuffled_hash' ELSE 'sort_merge' END AS strategy,
  CASE WHEN least(left_bytes, right_bytes) <= {threshold_bytes}
       OR least(left_bytes, right_bytes) * 3 <= greatest(left_bytes, right_bytes)
       THEN (CASE WHEN left_bytes <= right_bytes THEN 'left' ELSE 'right' END)
       END AS build_side
FROM l CROSS JOIN r"""


def bloom_prefilter_twin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_pred: str,
    m_bits: int = 16384,
    k_hash: int = 4,
) -> DataFrame:
    """Bloom-filter runtime-prefilter EXECUTION TWIN — the join-family
    companion of ``salted_skew_join``/``bucketed_join_twin``: Spark 3's
    runtime row-group filtering (``spark.sql.optimizer.runtime.
    bloomFilter.enabled``) materialized as an explicit, deterministic
    plan so its effect is measurable and oracle-checkable.  A selective
    dim predicate builds an ``m_bits``-bit Bloom filter (``k_hash``
    h64-derived probes per key, packed 32 bits per BIGINT word via one
    ``bit_or`` hash-agg — 32-bit lanes because DuckDB's ``<<`` is a
    CHECKED shift that overflows at bit 63), the ≤m/32-row word table
    broadcasts, and the
    fact side is pruned to bloom-passing keys BEFORE any shuffle join
    would run — at 100 TB this is the difference between shuffling the
    full fact table and shuffling the semi-join survivors, bought for
    one broadcast of a few KB.

    Everything is deterministic (content-hash probes, never a seeded
    BloomFilter object), so the false-positive count is a FIXED number
    both engines reproduce exactly — the fp-rate is measured, not
    modeled.  The exact semi-join companion rides the same per-key
    count table; ``no_false_neg`` is the Bloom soundness gate (a true
    key must always pass) the oracle pins TRUE.

    Output (1 row): n_dim_keys, n_fact_keys, n_fact_rows, n_keys_pass,
    n_rows_pass, n_keys_true, n_rows_true, n_false_pos_keys, fp_rate,
    bits_set, no_false_neg.
    """
    dkeys = (
        dim.where(dim_pred)
        .selectExpr(f"CAST({dim_key} AS BIGINT) AS k")
        .distinct()
    )
    words = bloom_build_words(dkeys, m_bits, k_hash)
    return bloom_score(fact, dkeys, words, fact_key, m_bits, k_hash)


def bloom_build_words(
    dkeys: DataFrame, m_bits: int = 16384, k_hash: int = 4
) -> DataFrame:
    """Word table of the content-hash Bloom filter over a ``k``-column
    key set: ``k_hash`` probe positions per key, packed 32 bits per
    BIGINT word via one ``bit_or`` hash-agg.  bit_or over words is a
    COMMUTATIVE MONOID, so word tables built from key-set slices merge
    by re-aggregation — the property the streamed maintenance class
    rides."""
    h = h64_sql("concat(cast(k as string), ':', cast(j as string))", "spark")
    dpos = dkeys.selectExpr(
        "k", f"explode(sequence(0, {k_hash - 1})) AS j"
    ).selectExpr(f"({h}) % {m_bits} AS pos")
    return (
        dpos.selectExpr("pos div 32 AS word_idx", "CAST(pos % 32 AS INT) AS bit")
        .groupBy("word_idx")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("word"))
    )


def bloom_score(
    fact: DataFrame,
    dkeys: DataFrame,
    words: DataFrame,
    fact_key: str,
    m_bits: int = 16384,
    k_hash: int = 4,
) -> DataFrame:
    """Probe ``fact``'s keys against a built word table and emit the
    1-row prefilter summary (see :func:`bloom_prefilter_twin`)."""
    h = h64_sql("concat(cast(k as string), ':', cast(j as string))", "spark")
    fkeys = fact.groupBy(
        F.expr(f"CAST({fact_key} AS BIGINT)").alias("k")
    ).agg(F.count("*").cast("long").alias("c"))
    probes = fkeys.selectExpr(
        "k", "c", f"explode(sequence(0, {k_hash - 1})) AS j"
    ).selectExpr("k", "c", f"({h}) % {m_bits} AS pos")
    hits = (
        probes.selectExpr(
            "k", "c", "pos div 32 AS word_idx", "CAST(pos % 32 AS INT) AS bit"
        )
        .join(F.broadcast(words), "word_idx", "left")
        .selectExpr(
            "k",
            "c",
            "coalesce(shiftright(word, bit) & CAST(1 AS BIGINT), CAST(0 AS BIGINT))"
            " = 1 AS hit",
        )
        .groupBy("k", "c")
        .agg(F.expr("bool_and(hit)").alias("passed"))
    )
    flags = hits.join(
        dkeys.selectExpr("k", "CAST(1 AS INT) AS is_true"), "k", "left"
    ).selectExpr("k", "c", "passed", "coalesce(is_true, 0) = 1 AS is_true")
    summary = flags.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_fact_keys"),
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n_fact_rows"),
        F.expr("CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "n_keys_pass"
        ),
        F.expr("CAST(SUM(CASE WHEN passed THEN c ELSE 0 END) AS BIGINT)").alias(
            "n_rows_pass"
        ),
        F.expr("CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "n_keys_true"
        ),
        F.expr("CAST(SUM(CASE WHEN is_true THEN c ELSE 0 END) AS BIGINT)").alias(
            "n_rows_true"
        ),
        F.expr("bool_and(passed OR NOT is_true)").alias("no_false_neg"),
    ).selectExpr("*", "n_fact_keys - n_fact_keys AS _k")
    ndim = dkeys.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_dim_keys")).selectExpr(
        "n_dim_keys", "n_dim_keys - n_dim_keys AS _k"
    )
    # COALESCE: an empty filter (predicate selects no keys) must still
    # emit the summary row, not drop it through a NULL combiner key
    nbits = words.agg(
        F.expr("CAST(COALESCE(SUM(bit_count(word)), 0) AS BIGINT)").alias("bits_set")
    ).selectExpr("bits_set", "bits_set - bits_set AS _k")
    return (
        summary.join(F.broadcast(ndim), "_k")
        .join(F.broadcast(nbits), "_k")
        .selectExpr(
            "n_dim_keys",
            "n_fact_keys",
            "n_fact_rows",
            "n_keys_pass",
            "n_rows_pass",
            "n_keys_true",
            "n_rows_true",
            "n_keys_pass - n_keys_true AS n_false_pos_keys",
            "floor(CAST(n_keys_pass - n_keys_true AS DOUBLE) / "
            f"greatest(CAST(n_fact_keys - n_keys_true AS DOUBLE), 1.0) {_F6} AS fp_rate",
            "bits_set",
            "no_false_neg",
        )
    )


def bloom_prefilter_oracle(
    fact_table: str,
    dim_table: str,
    fact_key: str,
    dim_key: str,
    dim_pred: str,
    m_bits: int = 16384,
    k_hash: int = 4,
) -> str:
    h = h64_sql("concat(CAST(k AS VARCHAR), ':', CAST(j AS VARCHAR))", "duckdb")
    return f"""WITH dkeys AS (
  SELECT DISTINCT CAST({dim_key} AS BIGINT) AS k FROM {dim_table} WHERE {dim_pred}
), js AS (SELECT unnest(range(0, {k_hash})) AS j),
dpos AS (SELECT ({h}) % {m_bits} AS pos FROM dkeys CROSS JOIN js),
words AS (
  SELECT pos // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS word
  FROM dpos GROUP BY 1
), fkeys AS (
  SELECT CAST({fact_key} AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM {fact_table} GROUP BY 1
), probes AS (
  SELECT k, c, ({h}) % {m_bits} AS pos FROM fkeys CROSS JOIN js
), hits AS (
  SELECT k, c,
         bool_and(coalesce((w.word >> CAST(p.pos % 32 AS INT)) & CAST(1 AS BIGINT),
                           CAST(0 AS BIGINT)) = 1) AS passed
  FROM probes p LEFT JOIN words w ON w.word_idx = p.pos // 32
  GROUP BY k, c
), flags AS (
  SELECT h.k, h.c, h.passed, (d.k IS NOT NULL) AS is_true
  FROM hits h LEFT JOIN dkeys d ON d.k = h.k
), summary AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_fact_keys,
         CAST(SUM(c) AS BIGINT) AS n_fact_rows,
         CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_pass,
         CAST(SUM(CASE WHEN passed THEN c ELSE 0 END) AS BIGINT) AS n_rows_pass,
         CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_true,
         CAST(SUM(CASE WHEN is_true THEN c ELSE 0 END) AS BIGINT) AS n_rows_true,
         bool_and(passed OR NOT is_true) AS no_false_neg
  FROM flags
), ndim AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dim_keys FROM dkeys),
nbits AS (SELECT CAST(COALESCE(SUM(bit_count(word)), 0) AS BIGINT) AS bits_set FROM words)
SELECT n_dim_keys, n_fact_keys, n_fact_rows, n_keys_pass, n_rows_pass,
  n_keys_true, n_rows_true,
  n_keys_pass - n_keys_true AS n_false_pos_keys,
  floor(CAST(n_keys_pass - n_keys_true AS DOUBLE) /
        greatest(CAST(n_fact_keys - n_keys_true AS DOUBLE), 1.0) {_F6} AS fp_rate,
  bits_set, no_false_neg
FROM summary CROSS JOIN ndim CROSS JOIN nbits"""
