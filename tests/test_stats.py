"""Distribution-statistics operators: quantile interpolation goldens,
histogram bucket edges, and the sketch error-bound / determinism
evidence that replaces a cross-engine oracle for HLL / approx
percentile (sketch internals are engine-specific)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators import stats as ST


@pytest.fixture(scope="module")
def tiny_vals(spark):
    rows = [("a", float(v)) for v in [1, 2, 3, 4]] + [("b", float(v)) for v in [10, 20]]
    return spark.createDataFrame(rows, schema="g STRING, v DOUBLE")


def test_group_quantiles_type7_interpolation(tiny_vals):
    r = {x["g"]: x for x in ST.group_quantiles(tiny_vals, "g", "v", (0.5, 0.9)).collect()}
    # type-7: q50 of [1,2,3,4] = 2.5; q90 = 1 + 0.9*3 = 3.7
    assert r["a"]["n"] == 4
    assert r["a"]["q50"] == pytest.approx(2.5)
    assert r["a"]["q90"] == pytest.approx(3.7)
    assert r["b"]["q50"] == pytest.approx(15.0)


def test_histogram_bucket_edges(spark):
    df = spark.createDataFrame(
        [(0.0,), (4999.99,), (5000.0,), (14999.0,)], schema="l_extendedprice DOUBLE"
    )
    r = {x["bucket"]: x for x in ST.fixed_width_histogram(df, "l_extendedprice").collect()}
    assert r[0]["n"] == 2  # 0.0 and 4999.99; 5000.0 goes to bucket 1
    assert r[1]["n"] == 1
    assert r[2]["n"] == 1
    assert (r[1]["lo"], r[1]["hi"]) == (5000.0, 10000.0)


def _mk_events(spark, n_users: int, n_rows: int):
    return spark.range(n_rows).select(
        F.lit("click").alias("event_type"),
        (F.col("id") % n_users).alias("user_id"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )


def test_sketch_exact_at_small_cardinality(spark):
    r = ST.sketch_summary(_mk_events(spark, 150, 10_000)).collect()[0]
    # HLL++ stays in exact sparse mode at tiny cardinalities... but is
    # ±1 even at 150 (observed 151): pin the bound, not equality
    assert abs(r["approx_users"] - r["exact_users"]) <= max(2, 0.02 * r["exact_users"])
    assert r["approx_p50"] == pytest.approx(r["exact_p50"], rel=0.01)


def test_sketch_error_bound_at_large_cardinality(spark):
    r = ST.sketch_summary(_mk_events(spark, 60_000, 240_000)).collect()[0]
    assert r["exact_users"] == 60_000
    assert abs(r["approx_users"] - 60_000) / 60_000 < 0.05  # rsd 0.01, generous cap


def test_sketch_deterministic_across_runs(spark):
    df = _mk_events(spark, 5_000, 50_000)
    a = ST.sketch_summary(df).collect()[0]["approx_users"]
    b = ST.sketch_summary(df.repartition(13)).collect()[0]["approx_users"]
    # HLL merge is commutative: partitioning must not change the estimate
    assert a == b


# ---------------------------------------------------------------------------
# Exact median by histogram refinement
# ---------------------------------------------------------------------------

def _median_df(spark, values):
    return spark.createDataFrame([(float(v),) for v in values], schema="l_extendedprice DOUBLE")


def _py_lower_median_cents(values):
    cents = sorted(round(v * 100) for v in values)
    return cents[(len(cents) + 1) // 2 - 1]


@pytest.mark.parametrize("n", [1, 2, 7, 100, 101])
def test_exact_median_matches_python(spark, n):
    import random as _r
    from twitter_followers_patterns_mapreduce_spark.operators.stats import exact_median_refine

    rnd = _r.Random(n)
    vals = [round(rnd.uniform(1, 100000), 2) for _ in range(n)]
    row = exact_median_refine(_median_df(spark, vals)).collect()[0]
    assert row["n_rows"] == n
    assert row["median_cents"] == _py_lower_median_cents(vals)
    assert row["median"] == row["median_cents"] / 100.0


def test_exact_median_heavy_duplicates(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import exact_median_refine

    # one value dominates: median must land on it regardless of bucketing
    vals = [10.0] * 95 + [99999.99] * 5
    row = exact_median_refine(_median_df(spark, vals)).collect()[0]
    assert row["median_cents"] == 1000


def test_exact_median_small_fanout_multiple_passes(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import exact_median_refine

    # fanout 4 / leaf 2 forces several refinement passes on a wide range
    vals = [float(x) for x in range(1, 1000, 7)]
    row = exact_median_refine(_median_df(spark, vals), fanout=4, leaf=2).collect()[0]
    assert row["median_cents"] == _py_lower_median_cents(vals)


def test_exact_median_empty_raises(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import exact_median_refine

    with pytest.raises(ValueError):
        exact_median_refine(_median_df(spark, []))


def test_exact_quantiles_refine_matches_python(spark):
    import random as _r
    from twitter_followers_patterns_mapreduce_spark.operators.stats import exact_quantiles_refine

    rnd = _r.Random(5)
    vals = [round(rnd.uniform(1, 100000), 2) for _ in range(500)]
    cents = sorted(round(v * 100) for v in vals)
    rows = exact_quantiles_refine(_median_df(spark, vals), qs=(0.5, 0.9, 0.99)).collect()
    got = {r["q"]: (r["k"], r["value_cents"]) for r in rows}
    for q in (0.5, 0.9, 0.99):
        k = -(-int(q * 1e6) * 500 // 1_000_000)
        assert got[q] == (k, cents[k - 1]), q


def test_exact_quantiles_q1_is_min_handling(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import exact_quantiles_refine

    rows = exact_quantiles_refine(_median_df(spark, [5.0, 1.0, 9.0]), qs=(0.001, 1.0)).collect()
    got = {r["q"]: r["value_cents"] for r in rows}
    assert got[0.001] == 100  # k clamps to 1 → the minimum
    assert got[1.0] == 900    # k = n → the maximum


def test_exact_quantiles_property_random_shapes(spark):
    """Property sweep without per-example Spark jobs exploding runtime:
    several deterministic seeds × odd fanout/leaf shapes, each checked
    against the sorted-list oracle for all three default ranks."""
    import random as _r
    from twitter_followers_patterns_mapreduce_spark.operators.stats import exact_quantiles_refine

    for seed, fanout, leaf in [(1, 3, 1), (2, 7, 5), (3, 1024, 4096), (4, 2, 2)]:
        rnd = _r.Random(seed)
        n = rnd.randrange(1, 120)
        vals = [round(rnd.uniform(0.01, 500.0), 2) for _ in range(n)]
        cents = sorted(round(v * 100) for v in vals)
        rows = exact_quantiles_refine(
            _median_df(spark, vals), qs=(0.5, 0.9, 0.99), fanout=fanout, leaf=leaf
        ).collect()
        for r in rows:
            k = max(1, -(-int(r["q"] * 1e6) * n // 1_000_000))
            assert (r["n_rows"], r["k"], r["value_cents"]) == (n, k, cents[k - 1]), (
                seed, fanout, leaf, r["q"],
            )


def test_exact_quantiles_nonrepresentable_q_matches_duckdb_oracle(spark):
    """ADVICE r5 regression pin: for q where q*1e6 is not exactly
    representable (1/3, 2/3) Python int() truncation and SQL CAST
    round-to-nearest used to derive ranks differing by 1.  Both sides
    now share qi = round(q*1e6); the engine must hash-match the oracle
    rank-for-rank on a dataset dense enough that an off-by-one rank
    changes the answer (all values distinct)."""
    import duckdb

    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        exact_quantiles_refine,
        exact_quantiles_refine_oracle,
    )

    qs = (1 / 3, 2 / 3, 0.123456789)
    vals = [round(0.01 * i, 2) for i in range(1, 301)]  # 300 distinct values
    got = {
        r["q"]: (r["n_rows"], r["k"], r["value_cents"])
        for r in exact_quantiles_refine(_median_df(spark, vals), qs=qs).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE vals (l_extendedprice DOUBLE)")
    con.executemany("INSERT INTO vals VALUES (?)", [(v,) for v in vals])
    want = {
        q: (n, k, c)
        for q, n, k, c, _v in con.execute(
            exact_quantiles_refine_oracle("vals", "l_extendedprice", qs=qs)
        ).fetchall()
    }
    assert got == want and len(got) == 3


# ---------------------------------------------------------------------------
# correlation / regression / independence family
# ---------------------------------------------------------------------------

def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from twitter_followers_patterns_mapreduce_spark.operators.stats import corr_matrix

    rng = np.random.RandomState(7)
    x = np.round(rng.uniform(1, 50, 200), 2)
    y = np.round(3.0 * x + rng.normal(0, 10, 200), 2)
    z = np.round(rng.uniform(0, 1, 200), 2)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        schema="x DOUBLE, y DOUBLE, z DOUBLE",
    )
    rows = {(r["col_x"], r["col_y"]): r for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    assert set(rows) == {("x", "y"), ("x", "z"), ("y", "z")}
    # engine floors at 1e-6; numpy corr on the SCALED-int data is the truth
    xs, ys, zs = (np.round(v * 100) for v in (x, y, z))
    for (a, b), arr in {("x", "y"): (xs, ys), ("x", "z"): (xs, zs), ("y", "z"): (ys, zs)}.items():
        want = np.corrcoef(arr[0], arr[1])[0, 1]
        assert abs(rows[(a, b)]["corr"] - want) < 2e-6, (a, b)
        assert rows[(a, b)]["n"] == 200


def test_corr_matrix_constant_column_is_null(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import corr_matrix

    df = spark.createDataFrame(
        [(float(i), 5.0) for i in range(10)], schema="x DOUBLE, c DOUBLE"
    )
    (row,) = corr_matrix(df, ["x", "c"]).collect()
    assert row["corr"] is None  # zero variance → guarded NULL, not Inf/NaN


def test_ols_fit_recovers_line(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import ols_fit

    # exact line y = 2.5x + 7 → slope/intercept/r2 recovered to the floor grid
    df = spark.createDataFrame(
        [(float(i), 2.5 * i + 7.0) for i in range(1, 101)], schema="x DOUBLE, y DOUBLE"
    )
    (row,) = ols_fit(df, "x", "y").collect()
    assert abs(row["slope"] - 2.5) < 2e-6
    assert abs(row["intercept"] - 7.0) < 2e-6
    assert abs(row["r2"] - 1.0) < 2e-6


def test_chi_square_independent_uniform_is_zero(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import chi_square

    # perfectly independent 2x2 with equal margins → chi2 == 0
    data = [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(25)]
    df = spark.createDataFrame(data, schema="a STRING, b STRING")
    (row,) = chi_square(df, "a", "b").collect()
    assert row["n"] == 100 and row["dof"] == 1
    assert row["chi2"] == 0.0 and row["cramers_v"] == 0.0


def test_chi_square_perfect_association(spark):
    import numpy as np

    from twitter_followers_patterns_mapreduce_spark.operators.stats import chi_square

    # a == b always → chi2 == n·(k-1), Cramér's V == 1
    data = [(c, c) for c in ("x", "y", "z") for _ in range(30)]
    df = spark.createDataFrame(data, schema="a STRING, b STRING")
    (row,) = chi_square(df, "a", "b").collect()
    assert row["dof"] == 4
    assert abs(row["chi2"] - 90 * 2) < 1e-5
    assert abs(row["cramers_v"] - 1.0) < 1e-5


def test_chi_square_counts_absent_cells(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import chi_square

    # ('y','u') never occurs: obs=0 but exp=rc·cc/n=10·30/60=5 → that cell
    # contributes (0-5)²/5 = 5. Hand-computed table:
    #        u   v   | rc
    #   x   30  20   | 50
    #   y    0  10   | 10
    #   cc  30  30   | n=60
    # exp: x,u=25 x,v=25 y,u=5 y,v=5 → chi2 = 1 + 1 + 5 + 5 = 12
    data = [("x", "u")] * 30 + [("x", "v")] * 20 + [("y", "v")] * 10
    df = spark.createDataFrame(data, schema="a STRING, b STRING")
    (row,) = chi_square(df, "a", "b").collect()
    assert row["n"] == 60 and row["dof"] == 1
    assert abs(row["chi2"] - 12.0) < 1e-5


def test_categorical_entropy_kl_hand_case(spark):
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        categorical_entropy_kl,
    )

    # group 0: 30 A + 10 B; group 1: 10 A + 30 B; global: 40/40
    data = [(0, "A")] * 30 + [(0, "B")] * 10 + [(1, "A")] * 10 + [(1, "B")] * 30
    df = spark.createDataFrame(data, schema="g INT, c STRING")
    rows = {r["grp"]: r for r in categorical_entropy_kl(df, "g", "c").collect()}
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    kl = 0.75 * math.log(0.75 / 0.5) + 0.25 * math.log(0.25 / 0.5)
    for g in (0, 1):
        assert rows[g]["n_rows"] == 40
        assert abs(rows[g]["entropy"] - h) < 1e-8
        assert abs(rows[g]["kl_vs_global"] - kl) < 1e-8


def test_categorical_entropy_kl_uniform_group_zero_kl(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        categorical_entropy_kl,
    )

    # both groups mirror the global mix exactly → KL == 0 for each
    data = [(g, c) for g in (0, 1) for c in ("A", "B", "C") for _ in range(7)]
    df = spark.createDataFrame(data, schema="g INT, c STRING")
    for r in categorical_entropy_kl(df, "g", "c").collect():
        assert abs(r["kl_vs_global"]) < 1e-8


def test_iqr_outlier_profile_hand_case(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        iqr_outlier_profile,
    )

    # group g: values 1..9 plus extreme 100 → q1/q3 from type-7 interpolation,
    # 100 is above the upper fence; nothing below the lower fence
    vals = [float(v) for v in range(1, 10)] + [100.0]
    df = spark.createDataFrame([("g", v) for v in vals], schema="grp0 STRING, v DOUBLE")
    (row,) = iqr_outlier_profile(df, "grp0", "v").collect()
    import numpy as np

    q1, q3 = np.percentile(vals, [25, 75])  # numpy 'linear' == type-7
    assert row["n"] == 10
    assert abs(row["q1"] - q1) < 1e-9 and abs(row["q3"] - q3) < 1e-9
    iqr = q3 - q1
    assert row["n_high"] == sum(1 for v in vals if v > q3 + 1.5 * iqr) == 1
    assert row["n_low"] == 0


def test_woe_iv_closed_form_and_null_guard(spark):
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.stats import woe_iv

    rows = (
        [("A", 1)] * 3 + [("A", 0)] * 1
        + [("B", 1)] * 1 + [("B", 0)] * 3
        + [("C", 1)] * 2          # no negatives: degenerate, NULL woe
    )
    df = spark.createDataFrame(rows, schema="cat STRING, y INT")
    out = {r["category"]: r for r in woe_iv(df, "cat", "y = 1").collect()}
    pos, neg = 6, 4

    def fl(x):
        return math.floor(x * 1e6) / 1e6

    wa = math.log((3 / pos) / (1 / neg))
    assert out["A"]["woe"] == fl(wa)
    assert out["A"]["iv_term"] == fl((3 / pos - 1 / neg) * wa)
    wb = math.log((1 / pos) / (3 / neg))
    assert out["B"]["woe"] == fl(wb)
    assert out["C"]["woe"] is None and out["C"]["iv_term"] is None
    assert (out["A"]["n"], out["A"]["n_pos"], out["A"]["n_neg"]) == (4, 3, 1)


def test_higher_moments_numpy_cross_check(spark):
    import numpy as np

    from twitter_followers_patterns_mapreduce_spark.operators.stats import higher_moments

    vals = [1.25, 2.0, 3.5, 4.75, 10.0, 2.25, 0.5]
    df = spark.createDataFrame([(v,) for v in vals], schema="x DOUBLE")
    (row,) = higher_moments(df, "x").collect()
    a = np.array(vals)
    m = a.mean()
    m2 = ((a - m) ** 2).mean()
    m3 = ((a - m) ** 3).mean()
    m4 = ((a - m) ** 4).mean()
    assert row["n"] == len(vals)
    assert abs(row["mean"] - m) < 2e-6
    assert abs(row["stddev"] - m2 ** 0.5) < 2e-6
    assert abs(row["skewness"] - m3 / m2 ** 1.5) < 2e-6
    assert abs(row["kurtosis_excess"] - (m4 / m2 ** 2 - 3)) < 2e-6


def test_higher_moments_zero_variance_guard(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import higher_moments

    df = spark.createDataFrame([(5.0,)] * 4, schema="x DOUBLE")
    (row,) = higher_moments(df, "x").collect()
    assert row["mean"] == 5.0
    assert row["stddev"] is None and row["skewness"] is None
    assert row["kurtosis_excess"] is None


def test_psi_profile_hand_case(spark):
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.stats import psi_profile

    # side A: 6 in bucket 0, 2 in bucket 1; side B: 2 in bucket 0,
    # 6 in bucket 1; bucket 2 is A-only -> NULL term
    rows = (
        [(0, True)] * 6 + [(1, True)] * 2 + [(2, True)] * 1
        + [(0, False)] * 2 + [(1, False)] * 6
    )
    df = spark.createDataFrame(rows, schema="b LONG, is_a BOOLEAN")
    out = {r["bucket"]: r for r in psi_profile(df, "b", "is_a").collect()}
    ta, tb = 9, 8

    def term(na, nb):
        p, q = na / ta, nb / tb
        return math.floor((p - q) * math.log(p / q) * 1e6) / 1e6

    assert out[0]["psi_term"] == term(6, 2)
    assert out[1]["psi_term"] == term(2, 6)
    assert out[2]["psi_term"] is None
    assert (out[2]["n_a"], out[2]["n_b"]) == (1, 0)


def test_benford_profile_hand_case(spark):
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.stats import benford_profile

    df = spark.createDataFrame(
        [(1.00,), (1.50,), (2.00,), (9.00,)], schema="x DOUBLE"
    )
    out = {r["digit"]: r for r in benford_profile(df, "x").collect()}
    assert set(out) == {1, 2, 9}
    assert out[1]["n"] == 2 and out[1]["share"] == 0.5
    assert out[1]["benford_p"] == math.floor(math.log10(2) * 1e6) / 1e6
    p9 = math.log(1 + 1 / 9) / math.log(10)
    expect = math.floor(4 * (0.25 - p9) ** 2 / p9 * 1e6) / 1e6
    assert abs(out[9]["chi2_term"] - expect) < 2e-6


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame([(float(i),) for i in range(1, 201)], schema="x DOUBLE")
    (row,) = bootstrap_mean_ci(df, "x").collect()
    assert row["n"] == 200 and row["n_replicas"] == 32
    assert row["ci_lo"] < row["mean"] < row["ci_hi"]
    # hash-driven weights: the whole CI replays bit-identically
    (again,) = bootstrap_mean_ci(df, "x").collect()
    assert (again["ci_lo"], again["ci_hi"]) == (row["ci_lo"], row["ci_hi"])
    # Poisson(1) bootstrap: the CI half-width should be in the right
    # ballpark of sigma/sqrt(n) (loose 3x bounds, not a distribution test)
    import statistics

    se = statistics.pstdev(range(1, 201)) / (200 ** 0.5)
    half = (row["ci_hi"] - row["ci_lo"]) / 2
    assert se / 3 < half < se * 3 * 1.96


def test_bootstrap_ci_key_col_breaks_value_clusters(spark):
    """With key_col, rows sharing a VALUE draw independent Poisson
    weights.  On a two-valued column the value-hash form degenerates to
    a cluster bootstrap over two draws (grossly wide CI); the keyed
    form concentrates per the CLT — its CI must be strictly tighter and
    still nonzero, and it must replay deterministically."""
    from twitter_followers_patterns_mapreduce_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, 0.0 if i % 2 else 10.0) for i in range(1, 401)],
        schema="k LONG, x DOUBLE",
    )
    (keyed,) = bootstrap_mean_ci(df, "x", key_col="k").collect()
    (clustered,) = bootstrap_mean_ci(df, "x").collect()
    assert keyed["n"] == clustered["n"] == 400
    kw = keyed["ci_hi"] - keyed["ci_lo"]
    cw = clustered["ci_hi"] - clustered["ci_lo"]
    assert 0 < kw < cw
    # keyed width tracks sigma/sqrt(n) = 5/20 = 0.25 (loose bounds)
    assert 0.25 / 3 < kw / 2 / 1.96 * 2 < 0.25 * 6
    (again,) = bootstrap_mean_ci(df, "x", key_col="k").collect()
    assert (again["ci_lo"], again["ci_hi"]) == (keyed["ci_lo"], keyed["ci_hi"])


def test_grouped_ols_matches_numpy_per_group(spark):
    import numpy as np

    from twitter_followers_patterns_mapreduce_spark.operators.stats import grouped_ols_slopes

    rows = []
    for g, (a, b) in {"g1": (2.0, 5.0), "g2": (-1.5, 3.0)}.items():
        for i in range(12):
            x = i * 0.25
            # pre-quantize to exact cents so the reference fit sees the
            # same values the engine's round(x*100) does (raw a*x+b
            # noise lands on exact .5 cent boundaries, where numpy's
            # half-to-even and Spark's HALF_UP disagree)
            y = round((a * x + b + (0.37 if i % 3 == 0 else -0.21)) * 100) / 100
            rows.append((g, x, y))
    rows += [("flat", 1.0, 9.0), ("flat", 1.0, 7.0)]  # zero x-variance -> NULL
    df = spark.createDataFrame(rows, schema="g STRING, x DOUBLE, y DOUBLE")
    out = {r["grp"]: r for r in grouped_ols_slopes(df, "g", "x", "y").collect()}
    for g in ("g1", "g2"):
        xs = np.array([r[1] for r in rows if r[0] == g])
        ys = np.array([r[2] for r in rows if r[0] == g])
        slope = np.polyfit(xs, ys, 1)[0]
        assert abs(out[g]["slope"] - slope) < 2e-6
        assert 0.9 < out[g]["r2"] <= 1.0
    assert out["flat"]["slope"] is None and out["flat"]["r2"] is None


def test_woe_psi_benford_invariants(spark):
    """Mathematical invariants over a seeded random dataset:
    every IV term is >= 0 ((p-q)ln(p/q) has matching signs), PSI terms
    are symmetric under side swap, Benford shares sum to 1."""
    import random

    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        benford_profile,
        psi_profile,
        woe_iv,
    )

    rnd = random.Random(20260815)
    rows = [
        (rnd.choice("ABCDE"), rnd.random() < 0.4, float(rnd.randint(100, 99999)) / 100)
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, schema="cat STRING, flag BOOLEAN, amt DOUBLE")

    for r in woe_iv(df, "cat", "flag").collect():
        if r["iv_term"] is not None:
            assert r["iv_term"] >= 0, r

    a = {r["bucket"]: r["psi_term"] for r in psi_profile(df, "cat", "flag").collect()}
    b = {r["bucket"]: r["psi_term"] for r in psi_profile(df, "cat", "NOT flag").collect()}
    # (p-q)ln(p/q) == (q-p)ln(q/p): swapping sides changes nothing
    # beyond the 1e-6 floor grid
    for k in a:
        if a[k] is not None:
            assert abs(a[k] - b[k]) <= 2e-6, (k, a[k], b[k])
        assert (a[k] is None) == (b[k] is None)

    shares = [r["share"] for r in benford_profile(df, "amt").collect()]
    # floored shares: sum within 9 floor-steps of 1
    assert 1.0 - 9e-6 <= sum(shares) <= 1.0


def test_kll_quantile_profile_exact_companions_and_bounds(spark):
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        kll_quantile_profile,
    )

    df = spark.createDataFrame([(float(i),) for i in range(1, 1001)], schema="x DOUBLE")
    rows = {r["q"]: r for r in kll_quantile_profile(df, "x").collect()}
    assert set(rows) == {0.25, 0.5, 0.75, 0.9, 0.99}
    # exact companion is the type-7 percentile, floored at 1e-6
    # (x = 1..1000: percentile(q) = 1 + 999q)
    for q, r in rows.items():
        assert r["n"] == 1000
        assert r["exact_q"] == math.floor((1 + 999 * q) * 1e6) / 1e6
        assert r["kll_ok"] is True


def test_kll_counted_n_matches_count_star_including_empty(spark):
    # round-11 advice: SUM(f) over the empty grouped table is NULL where
    # COUNT(*) said 0 — the coalesce pins n = 0.  (The full profile
    # readout throws on truly empty input in BOTH the old and new shape
    # — kll_sketch_get_quantile rejects the empty sketch — so the pin is
    # asserted on the counted-table aggregate itself.)
    from pyspark.sql import functions as F

    counted_n = F.expr("CAST(coalesce(SUM(f), 0) AS BIGINT)")
    empty = spark.createDataFrame([], schema="x DOUBLE")
    n0 = empty.groupBy("x").agg(F.count("*").alias("f")).agg(counted_n).collect()[0][0]
    assert n0 == 0
    # NULL values group under the counted form exactly like COUNT(*)
    df = spark.createDataFrame([(1.0,), (None,), (1.0,)], schema="x DOUBLE")
    n = df.groupBy("x").agg(F.count("*").alias("f")).agg(counted_n).collect()[0][0]
    assert n == 3


def test_kll_merged_matches_single_level_gate(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        kll_quantile_profile,
        kll_quantile_profile_merged,
    )

    df = spark.createDataFrame(
        [(i % 7, float(i)) for i in range(1, 1001)], schema="g INT, x DOUBLE"
    )
    single = {r["q"]: r for r in kll_quantile_profile(df, "x").collect()}
    merged = {r["q"]: r for r in kll_quantile_profile_merged(df, "g", "x").collect()}
    assert set(single) == set(merged)
    for q in single:
        # identical exact companions; the merged sketch passes the same gate
        assert merged[q]["exact_q"] == single[q]["exact_q"]
        assert merged[q]["n"] == 1000
        assert merged[q]["kll_ok"] is True


def test_theta_set_profile_constructed_overlap(spark):
    from datetime import datetime

    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        theta_set_profile,
    )

    # A = users 1..100 (day 3), B = users 51..150 (day 25):
    # union 150, intersect 50, only-A 50; plus off-window noise
    rows = []
    eid = 0
    for u in range(1, 101):
        eid += 1
        rows.append((eid, datetime(2024, 1, 3, 12, 0, 0), u, "purchase", 1.0, ""))
    for u in range(51, 151):
        eid += 1
        rows.append((eid, datetime(2024, 1, 25, 12, 0, 0), u, "purchase", 1.0, ""))
    for u in range(900, 910):  # mid-month purchases: in neither set
        eid += 1
        rows.append((eid, datetime(2024, 1, 15, 12, 0, 0), u, "purchase", 1.0, ""))
    for u in range(950, 960):  # non-purchase events: filtered out
        eid += 1
        rows.append((eid, datetime(2024, 1, 3, 12, 0, 0), u, "click", 1.0, ""))
    df = spark.createDataFrame(
        rows,
        schema="event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    (r,) = theta_set_profile(df).collect()
    assert (r["n_a"], r["n_b"], r["n_union"]) == (100, 100, 150)
    assert (r["n_intersect"], r["n_only_a"]) == (50, 50)
    assert all(r[c] is True for c in ("ok_a", "ok_b", "ok_union", "ok_intersect", "ok_diff"))


def test_mutual_information_independent_and_determined(spark):
    """MI = 0 for independent uniform columns; MI = H(x) = H(y) = ln 2
    when y is a function of x (and NMI = 1)."""
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.stats import mutual_information

    # independent: every (x, y) cell equally likely
    indep = spark.createDataFrame(
        [(x, y) for x in range(2) for y in range(2) for _ in range(25)],
        schema="a LONG, b LONG",
    )
    (row,) = mutual_information(indep, "a", "b").collect()
    assert row["n"] == 100 and row["n_x_vals"] == 2 and row["n_y_vals"] == 2
    assert abs(row["mi_nats"]) < 1e-6
    assert abs(row["h_x"] - math.log(2)) < 1e-6
    # determined: b = a
    det = spark.createDataFrame(
        [(x, x) for x in range(2) for _ in range(50)], schema="a LONG, b LONG"
    )
    (row,) = mutual_information(det, "a", "b").collect()
    assert abs(row["mi_nats"] - math.log(2)) < 1e-6
    assert abs(row["nmi"] - 1.0) < 1e-5
