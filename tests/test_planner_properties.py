"""Property tests (hypothesis) for the round-8 operators: each engine
result is checked against a direct Python model on arbitrary generated
inputs — the model-based layer that catches join/edge-case bugs the
goldens and the fixed-dataset oracle gate can miss."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import make_edges
from twitter_followers_patterns_mapreduce_spark.operators.graph_iter import sssp_weighted
from twitter_followers_patterns_mapreduce_spark.operators.planner import (
    join_cardinality_estimate,
)

keys = st.integers(0, 9)
multisets = st.lists(keys, min_size=1, max_size=25)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=multisets, right=multisets)
def test_join_cardinality_matches_model(spark, left, right):
    ldf = spark.createDataFrame([(k,) for k in left], schema="k BIGINT")
    rdf = spark.createDataFrame([(k,) for k in right], schema="k BIGINT")
    row = join_cardinality_estimate(ldf, rdf, "k", "k").collect()[0]
    cl, cr = Counter(left), Counter(right)
    assert row["exact_join_rows"] == sum(cl[k] * cr[k] for k in cl)
    assert row["left_rows"] == len(left) and row["right_rows"] == len(right)
    assert row["left_keys"] == len(cl) and row["right_keys"] == len(cr)
    assert row["match_keys"] == len(set(cl) & set(cr))


edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=20,
    unique=True,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists, hops=st.integers(1, 5))
def test_sssp_matches_bellman_ford_model(spark, edges, hops):
    """Bounded-hop Bellman-Ford in pure Python vs the DataFrame loop,
    with the same endpoint-derived weights."""
    w = {(s, d): 1 + (s + d) % 5 for s, d in edges}
    dist = {0: 0}
    for _ in range(hops):
        nxt = dict(dist)
        for (s, d), wt in w.items():
            if s in dist and dist[s] + wt < nxt.get(d, 1 << 60):
                nxt[d] = dist[s] + wt
        dist = nxt
    got = {
        r["id"]: r["dist"]
        for r in sssp_weighted(make_edges(spark, edges), source=0, max_hops=hops).collect()
    }
    assert got == dist


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.integers(0, 50), min_size=2, max_size=40))
def test_cms_estimate_bounds_model(spark, vals):
    """For EVERY key: min-cell estimate >= exact count (never-under),
    and <= exact + total colliding mass (trivial upper bound)."""
    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        cms_frequency_profile,
    )

    df = spark.createDataFrame([(v,) for v in vals], schema="user_id BIGINT")
    rows = cms_frequency_profile(df, "user_id", k=len(set(vals))).collect()
    exact = Counter(vals)
    assert len(rows) == min(len(exact), len(set(vals)))
    for r in rows:
        assert r["cms_est"] >= r["exact_n"] == exact[r["key"]]
        assert r["cms_est"] <= len(vals)  # a cell can never exceed N


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    subjects=st.lists(
        st.tuples(st.integers(0, 24), st.booleans()), min_size=1, max_size=30
    )
)
def test_kaplan_meier_matches_product_limit_model(spark, subjects):
    """KM survival vs the direct product-limit computation on arbitrary
    (duration_month, churned) subjects."""
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.stats import (
        kaplan_meier_survival,
    )

    # build one order per subject: first = 1995-01-01, last = first + 30*t days;
    # churned subjects get last < cutoff(1998-01-01), censored ones >= cutoff.
    rows = []
    for i, (t, churned) in enumerate(subjects):
        base = "1995-01-01" if churned else "1998-06-01"
        rows.append((i, base, 0))
        rows.append((i, base, t * 30))
    df = spark.createDataFrame(
        rows, schema="o_custkey LONG, base STRING, off INT"
    ).selectExpr(
        "o_custkey",
        "CAST(1000.0 AS DOUBLE) AS o_totalprice",
        "CAST(date_add(CAST(base AS DATE), off) AS TIMESTAMP) AS o_orderdate",
    )
    got = {
        r["t_months"]: r for r in kaplan_meier_survival(df, "1998-01-01").collect()
    }
    # python product-limit over the same monthly durations
    durs = sorted({t for t, _ in subjects})
    n_total = len(subjects)
    model_s, passed = {}, 0.0
    log_s, dead = 0.0, False
    for t in durs:
        n_risk = sum(1 for d, _ in subjects if d >= t)
        d_t = sum(1 for d, c in subjects if d == t and c)
        if d_t >= n_risk:
            dead = True
        elif not dead:
            log_s += math.log(1.0 - d_t / n_risk)
        model_s[t] = 0.0 if dead else math.floor(math.exp(log_s) * 1e6) / 1e6
        assert got[t]["n_risk"] == n_risk
        assert got[t]["n_events"] == d_t
        # ±one 1e-6 grid step: Python's libm exp/ln round-trip can land
        # an ulp below an exactly-representable product (exp(log(0.75))
        # = 0.74999...9), which the floor amplifies to a full grid step.
        # Engine↔oracle exactness is the gate's job; the Python model
        # only needs to pin the product-limit SHAPE.
        assert abs(got[t]["survival"] - model_s[t]) <= 1.01e-6
    assert set(got) == set(durs)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sessions=st.lists(
        st.tuples(st.integers(0, 200_000), st.integers(0, 10_000)),
        min_size=1,
        max_size=15,
    )
)
def test_concurrency_max_matches_sweep_model(spark, sessions):
    """Per-day peak concurrency vs a brute-force sweep over all
    boundary instants (closed intervals, starts before ends at ties).
    Each generated session is one user with two events gap-close
    enough to stay a single session."""
    from twitter_followers_patterns_mapreduce_spark.operators.events import (
        concurrency_curve,
    )

    rows = []
    ivals = []
    for uid, (start, dur) in enumerate(sessions):
        end = start + dur
        ivals.append((start, end))
        rows.append((uid * 2, float(start), uid))
        rows.append((uid * 2 + 1, float(end), uid))
    df = spark.createDataFrame(
        rows, schema="event_id LONG, sec DOUBLE, user_id LONG"
    ).selectExpr(
        "event_id", "user_id", "timestamp_micros(CAST(sec * 1000000 AS BIGINT)) AS ts"
    )
    # gap larger than any intra-session spacing: one session per user
    out = {
        r["day"]: r["max_concurrent"]
        for r in concurrency_curve(df, gap_us=20_000 * 1_000_000).collect()
    }
    # model: at each boundary instant, concurrency under the engine's
    # ordering (all starts at t before all ends at t)
    model: dict[str, int] = {}
    events = []
    for s, e in ivals:
        events.append((s, 0, 1))
        events.append((e, 1, -1))
    events.sort()
    cur = 0
    import datetime

    for t, kind, delta in events:
        cur += delta
        day = datetime.datetime.utcfromtimestamp(t // 86400 * 86400).strftime("%Y-%m-%d")
        model[day] = max(model.get(day, 0), cur)
    for day, mx in model.items():
        assert out[day] == mx


# ---------------------------------------------------------------------------
# round-10: advisor-family property pins (round-9 verdict item 7)
# ---------------------------------------------------------------------------


def _h64_py(s: str) -> int:
    """Python model of functions/hashing.py::h64_sql — first 60 bits of
    md5 as a non-negative int."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=multisets, target=st.integers(1, 6))
def test_bucket_advisor_matches_model(spark, data, target):
    """Power-of-two bucket counts (including n_rows exactly at target
    multiples), realized h64 distribution, imbalance, and the salt flag
    all against a direct Python model."""
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.planner import (
        bucket_layout_advisor,
    )

    df = spark.createDataFrame([(k,) for k in data], schema="k BIGINT")
    row = bucket_layout_advisor(df, "k", target_rows_per_bucket=target).collect()[0]
    n_rows, cnt = len(data), Counter(data)
    nb = 2 ** math.ceil(math.log2(max(math.ceil(n_rows / target), 1)))
    buckets = Counter()
    for k, c in cnt.items():
        buckets[_h64_py(str(k)) % nb] += c
    assert row["n_rows"] == n_rows
    assert row["n_keys"] == len(cnt)
    assert row["max_key_rows"] == max(cnt.values())
    assert row["n_buckets"] == nb
    assert row["n_nonempty_buckets"] == len(buckets)
    assert row["avg_bucket_rows"] == n_rows // nb
    assert row["max_bucket_rows"] == max(buckets.values())
    assert row["salt_advice"] == (max(cnt.values()) > 2 * (n_rows / nb))
    imb = math.floor(max(buckets.values()) / (n_rows / nb) * 1e6) / 1e6
    # libm ulp tolerance: one floor-grid step (the KM-test precedent)
    assert abs(row["imbalance"] - imb) <= 1e-6 + 1e-9


def test_bucket_advisor_empty_and_single_key(spark):
    """Degenerate layouts: an empty table yields one all-null-safe row
    (no crash, no divide-by-zero), a 1-key table lands everything in
    one bucket with salt advice on."""
    from twitter_followers_patterns_mapreduce_spark.operators.planner import (
        bucket_layout_advisor,
    )

    empty = spark.createDataFrame([], schema="k BIGINT")
    out = bucket_layout_advisor(empty, "k", target_rows_per_bucket=3).collect()
    assert len(out) == 1  # diagnostic row exists; fields of an empty
    # profile are NULL/0 rather than an exception
    assert out[0]["n_keys"] in (0, None)

    one = spark.createDataFrame([(7,)] * 20, schema="k BIGINT")
    row = bucket_layout_advisor(one, "k", target_rows_per_bucket=2).collect()[0]
    assert row["n_buckets"] == 16  # 2^ceil(log2(10))
    assert row["n_nonempty_buckets"] == 1  # a hot key cannot spread
    assert row["max_bucket_rows"] == 20
    assert bool(row["salt_advice"]) is True


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    days=st.lists(st.integers(9500, 9620), min_size=1, max_size=25),
    min_rows=st.integers(1, 4),
)
def test_partition_advisor_matches_model(spark, days, min_rows):
    """Day/week/month profiles and the finest-meeting-target
    recommendation against a direct Python model (epoch-day // 7 weeks,
    y*12+m months — the engine's dayofweek-proof discipline)."""
    import datetime

    from twitter_followers_patterns_mapreduce_spark.operators.planner import (
        partition_layout_advisor,
    )

    dates = [datetime.date(1970, 1, 1) + datetime.timedelta(days=d) for d in days]
    df = spark.createDataFrame([(d,) for d in dates], schema="o_d DATE")
    out = {
        r["granularity"]: r
        for r in partition_layout_advisor(
            df, "o_d", min_rows_per_partition=min_rows
        ).collect()
    }
    spines = {
        "day": Counter(days),
        "week": Counter(d // 7 for d in days),
        "month": Counter(
            (dt.year * 12 + dt.month) for dt in dates
        ),
    }
    meets = {}
    for g, spine in spines.items():
        row = out[g]
        assert row["n_partitions"] == len(spine)
        assert row["n_rows"] == len(days)
        assert row["avg_partition_rows"] == len(days) // len(spine)
        assert row["max_partition_rows"] == max(spine.values())
        meets[g] = (len(days) // len(spine)) >= min_rows
        assert row["meets_target"] == meets[g]
    finest = next((g for g in ("day", "week", "month") if meets[g]), None)
    for g in ("day", "week", "month"):
        assert out[g]["recommended"] == (g == finest)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=multisets,
    right=multisets,
    pct=st.sampled_from([7, 15, 30, 100]),
)
def test_universe_sample_matches_model(spark, left, right, pct):
    """pct values that do NOT divide 100 (the round-8 advice fix):
    sampled count, 100.0/pct scaling, exact count, and the
    within_bound verdict against a direct Python model."""
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.planner import (
        join_universe_sample_estimate,
    )

    ldf = spark.createDataFrame([(k,) for k in left], schema="k BIGINT")
    rdf = spark.createDataFrame([(k,) for k in right], schema="k BIGINT")
    row = join_universe_sample_estimate(ldf, rdf, "k", "k", pct=pct, bound=0.15).collect()[0]
    cl, cr = Counter(left), Counter(right)
    in_sample = {k for k in set(cl) | set(cr) if _h64_py(str(k)) % 100 < pct}
    samp = sum(cl[k] * cr[k] for k in cl if k in cr and k in in_sample)
    exact = sum(cl[k] * cr[k] for k in cl)
    assert row["sampled_join_rows"] == samp
    assert row["exact_join_rows"] == exact
    assert row["scaled_estimate"] == math.floor(samp * 100.0 / pct)
    if exact > 0:
        err = abs(samp * 100.0 / pct - exact) / exact
        assert row["within_bound"] == (err <= 0.15)
    else:
        assert row["within_bound"] is None
