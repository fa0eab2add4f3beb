"""Property tests (hypothesis) for the round-9 operators: each engine
result is checked against a direct Python model on arbitrary generated
inputs — the model-based layer that catches edge-case bugs the goldens
and the fixed-dataset oracle gate can miss (the DiD precedence bug this
round was exactly that class)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from twitter_followers_patterns_mapreduce_spark.operators.events import (
    bottomk_sample,
    hourly_acf,
)
from twitter_followers_patterns_mapreduce_spark.operators.graph import rich_club
from twitter_followers_patterns_mapreduce_spark.operators.planner import (
    zorder_benefit_estimate,
)
from twitter_followers_patterns_mapreduce_spark.operators.relational import revenue_theil
from twitter_followers_patterns_mapreduce_spark.operators.stats import mutual_information

SET = settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))


@SET
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)), min_size=1, max_size=40
    )
)
def test_mutual_information_matches_model(spark, pairs):
    df = spark.createDataFrame(pairs, schema="a LONG, b LONG")
    (row,) = mutual_information(df, "a", "b").collect()
    n = len(pairs)
    cxy, cx, cy = Counter(pairs), Counter(p[0] for p in pairs), Counter(p[1] for p in pairs)

    def fl9(v):
        return math.floor(v * 1e9)

    mi9 = sum(
        fl9((c / n) * math.log(c * n / (cx[x] * cy[y]))) for (x, y), c in cxy.items()
    )
    hx9 = sum(fl9(-(c / n) * math.log(c / n)) for c in cx.values())
    assert row["n"] == n
    assert row["mi_nats"] == mi9 / 1e9
    assert row["h_x"] == hx9 / 1e9
    # MI is nonnegative up to the 1e-9 floor slack (one ulp per cell)
    assert row["mi_nats"] >= -len(cxy) / 1e9


@SET
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=30
    ),
    k=st.integers(0, 5),
)
def test_rich_club_matches_model(spark, edges, k):
    df = spark.createDataFrame(edges, schema="src LONG, dst LONG")
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not und:
        return  # all self-loops: empty simple graph, operator has no rows to agg
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    club = {v for v, d in deg.items() if d > k}
    e_club = sum(1 for a, b in und if a in club and b in club)
    out = {r["k"]: r for r in rich_club(df, ks=(k,)).collect()}
    assert out[k]["n_club"] == len(club)
    assert out[k]["e_club"] == e_club
    if len(club) > 1:
        want = math.floor(2 * e_club / (len(club) * (len(club) - 1)) * 1e6) / 1e6
        assert out[k]["phi"] == want
    else:
        assert out[k]["phi"] is None


@SET
@given(
    prices=st.lists(
        st.tuples(st.integers(1, 6), st.floats(0.01, 9999.0, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
def test_revenue_theil_matches_model(spark, prices):
    rows = [(i, c, round(p, 2)) for i, (c, p) in enumerate(prices)]
    df = spark.createDataFrame(rows, schema="o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE")
    (row,) = revenue_theil(df).collect()
    per = Counter()
    for _, c, p in rows:
        per[c] += round(p * 100)
    n, s = len(per), sum(per.values())
    t9 = sum(math.floor((x * n / s) * math.log(x * n / s) * 1e9) for x in per.values())
    assert row["n_customers"] == n
    assert row["theil"] == math.floor(t9 / n / 1e9 * 1e6) / 1e6


@SET
@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True),
       k=st.integers(1, 10))
def test_bottomk_matches_model(spark, ids, k):
    import hashlib

    df = spark.createDataFrame(
        [(i, i % 5, "t") for i in ids],
        schema="event_id LONG, user_id LONG, event_type STRING",
    )
    got = sorted((r["event_id"], r["hk"]) for r in bottomk_sample(df, k=k).collect())
    hk = {i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in ids}
    want = sorted((i, hk[i]) for i in sorted(ids, key=lambda i: (hk[i], i))[:k])
    assert got == want


@SET
@given(
    counts=st.lists(st.integers(0, 5), min_size=3, max_size=24),
    lag=st.integers(1, 4),
)
def test_hourly_acf_matches_model(spark, counts, lag):
    # hour h gets counts[h] events; trailing zero hours vanish from the
    # dense span (the spine runs min..max OBSERVED hour)
    rows = [
        (h * 100 + j, 1, "c", h * 3600_000_000)
        for h, c in enumerate(counts)
        for j in range(c)
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, schema="event_id LONG, user_id LONG, event_type STRING, us LONG"
    ).selectExpr("event_id", "user_id", "event_type", "timestamp_micros(us) AS ts")
    observed = [h for h, c in enumerate(counts) if c > 0]
    lo, hi = min(observed), max(observed)
    series = [counts[h] for h in range(lo, hi + 1)]
    (row,) = hourly_acf(df, lags=(lag,)).collect()
    pairs = [(series[i], series[i + lag]) for i in range(len(series) - lag)]
    assert row["n_pairs"] == len(pairs)
    if not pairs:
        assert row["acf"] is None
        return
    n = len(pairs)
    sx, sy = sum(a for a, _ in pairs), sum(b for _, b in pairs)
    sxy = sum(a * b for a, b in pairs)
    sxx, syy = sum(a * a for a, _ in pairs), sum(b * b for _, b in pairs)
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    if dx > 0 and dy > 0:
        want = math.floor((n * sxy - sx * sy) / math.sqrt(dx * dy) * 1e6) / 1e6
        assert row["acf"] == want
    else:
        assert row["acf"] is None


@SET
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 63), st.integers(0, 63)), min_size=2, max_size=60
    ),
)
def test_zorder_benefit_invariants(spark, pts):
    df = spark.createDataFrame(pts, schema="x BIGINT, y BIGINT")
    out = {r["layout"]: r for r in zorder_benefit_estimate(df, "x", "y", bits=3).collect()}
    n = len(pts)
    for r in out.values():
        # pruning never loses true rows, scan never exceeds the table
        assert r["true_rows"] <= r["rows_scanned"] <= n
        assert 0 <= r["blocks_touched"] <= r["n_blocks"]
    assert out["linear_x"]["true_rows"] == out["zorder"]["true_rows"]
