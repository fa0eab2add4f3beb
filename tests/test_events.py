"""Hand-computed goldens for event-time operators (tumbling/sliding
windows, sessionization, JSON props) on a tiny deterministic stream."""

from __future__ import annotations

import datetime as dt

import pytest

from twitter_followers_patterns_mapreduce_spark.operators import events as E

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def at(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        (1, at(30), 7, "click", 1.0, '{"k": 5}'),
        (2, at(45), 7, "click", 2.0, '{"k": 7}'),
        (3, at(70), 7, "view", 4.0, '{"k": 1}'),
        # user 8: gap 40 min between event 5 and 6 → two sessions
        (4, at(0), 8, "click", 8.0, '{"k": 2}'),
        (5, at(10), 8, "click", 16.0, '{"k": 9}'),
        (6, at(50), 8, "view", 32.0, '{"k": 3}'),
    ]
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_tumbling_hourly_goldens(tiny_events):
    r = {
        (x["window_start"], x["event_type"]): (x["n_events"], x["sum_value"])
        for x in E.tumbling_hourly(tiny_events).collect()
    }
    assert r[("2024-01-01 00:00:00", "click")] == (4, 27.0)
    assert r[("2024-01-01 00:00:00", "view")] == (1, 32.0)
    assert r[("2024-01-01 01:00:00", "view")] == (1, 4.0)
    assert len(r) == 3


def test_sliding_goldens(tiny_events):
    r = {
        x["window_start"]: (x["n_events"], x["sum_value"])
        for x in E.sliding_1h_30m(tiny_events).collect()
    }
    # event at 00:30 lands in windows starting 00:00 and 00:30
    assert r["2024-01-01 00:00:00"] == (5, 59.0)  # minutes 0,10,30,45,50
    assert r["2024-01-01 00:30:00"] == (4, 39.0)  # minutes 30,45,50,70
    assert r["2023-12-31 23:30:00"] == (2, 24.0)  # minutes 0,10
    assert r["2024-01-01 01:00:00"] == (1, 4.0)  # minute 70


def test_sessionize_goldens(tiny_events):
    r = {
        (x["user_id"], x["session_seq"]): (x["session_start"], x["n_events"], x["duration_sec"])
        for x in E.sessionize(tiny_events).collect()
    }
    # user 7: gaps 15 and 25 min — one session of 3 events, 40 min span
    assert r[(7, 0)] == ("2024-01-01 00:30:00", 3, 2400)
    # user 8: 40-min gap splits into two sessions
    assert r[(8, 0)] == ("2024-01-01 00:00:00", 2, 600)
    assert r[(8, 1)] == ("2024-01-01 00:50:00", 1, 0)
    assert len(r) == 3


def test_json_prop_stats_goldens(tiny_events):
    r = {x["event_type"]: x for x in E.json_prop_stats(tiny_events).collect()}
    assert (r["click"]["n_events"], r["click"]["sum_k"]) == (4, 23)
    assert (r["click"]["min_k"], r["click"]["max_k"]) == (2, 9)
    assert (r["view"]["n_events"], r["view"]["sum_k"]) == (2, 4)


def test_user_interaction_edges_no_self_loops(tiny_events):
    edges = E.user_interaction_edges(tiny_events).collect()
    assert all(e["src"] != e["dst"] for e in edges)


def test_session_window_native_boundary(spark):
    """An event exactly gap after the previous EXTENDS the session
    (inclusive merge boundary) — the pinned oracle semantics."""
    import datetime as dt

    from twitter_followers_patterns_mapreduce_spark.operators.events import (
        session_window_native,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=29, seconds=59), 7, "click", 2.0, "{}"),
        (3, t0 + dt.timedelta(minutes=59, seconds=59), 7, "click", 4.0, "{}"),  # +30:00 exactly
        (4, t0 + dt.timedelta(hours=3), 7, "click", 8.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    )
    got = sorted(session_window_native(df).collect(), key=lambda r: r["session_start"])
    assert [r["n_events"] for r in got] == [3, 1]
    assert got[0]["sum_value"] == 7.0
    assert got[0]["session_end"] == "2024-01-01 01:29:59"  # last event + 30 min


def test_type_streaks_islands_golden(spark):
    import datetime as dt

    from twitter_followers_patterns_mapreduce_spark.operators.events import type_streaks

    t0 = dt.datetime(2024, 1, 1)
    seq = ["a", "a", "b", "a", "a", "a", "b", "b"]
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, ty, 0.0, "{}") for i, ty in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    )
    got = {(r["user_id"], r["event_type"]): r for r in type_streaks(df).collect()}
    assert got[(1, "a")]["max_streak"] == 3 and got[(1, "a")]["n_runs"] == 2
    assert got[(1, "b")]["max_streak"] == 2 and got[(1, "b")]["n_runs"] == 2


def test_funnel_conversion_golden(spark):
    import datetime as dt

    from twitter_followers_patterns_mapreduce_spark.operators.events import funnel_conversion

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 0: click then purchase 30 min later → converts
        (0, t0, 0, "click", 0.0, "{}"),
        (1, t0 + dt.timedelta(minutes=30), 0, "purchase", 1.0, "{}"),
        # user 10 (same decile as 0): click, purchase 2h later → no
        (2, t0, 10, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(hours=2), 10, "purchase", 1.0, "{}"),
        # user 1: purchase BEFORE first click → no
        (4, t0, 1, "purchase", 1.0, "{}"),
        (5, t0 + dt.timedelta(minutes=1), 1, "click", 0.0, "{}"),
        # user 2: purchase only, never clicks → not in funnel at all
        (6, t0, 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    )
    got = {r["user_decile"]: r for r in funnel_conversion(df).collect()}
    assert got[0]["n_users"] == 2 and got[0]["n_converted"] == 1
    assert got[1]["n_users"] == 1 and got[1]["n_converted"] == 0
    assert 2 not in got


def test_type_pivot_sparse_cells_are_zero_not_null(spark):
    """Regression: a declared pivot value with no matching rows must
    yield 0 (the SQL COUNT FILTER semantics), not Spark pivot's NULL."""
    from twitter_followers_patterns_mapreduce_spark.operators.events import (
        user_decile_type_pivot,
    )

    rows = [(1, "click"), (11, "click"), (2, "view")]
    df = spark.createDataFrame(rows, schema="user_id LONG, event_type STRING")
    got = {r["user_decile"]: r for r in user_decile_type_pivot(df).collect()}
    assert got[1]["click"] == 2 and got[1]["purchase"] == 0
    assert got[2]["view"] == 1 and got[2]["signup"] == 0


def test_gapfill_hourly_dense_spine(tiny_events):
    from twitter_followers_patterns_mapreduce_spark.operators import events as E

    out = E.gapfill_hourly(tiny_events).collect()
    # span is 2 hours (events at minutes 0-70 → hours 0 and 1), 2 types → 4 rows
    assert len(out) == 4
    got = {(r.hour.hour, r.event_type): (r.n_events, r.sum_value) for r in out}
    assert got[(0, "click")] == (4, 27.0)
    assert got[(0, "view")] == (1, 32.0)
    assert got[(1, "view")] == (1, 4.0)
    # the empty (hour 1, click) cell is PRESENT and zero-filled, not absent
    assert got[(1, "click")] == (0, 0.0)


def test_hourly_anomaly_spike_scores_high(spark):
    import datetime as dt

    from twitter_followers_patterns_mapreduce_spark.operators import events as E

    # 23 quiet hours (1 event each) then a 10-event spike in hour 23
    rows = []
    eid = 0
    for h in range(24):
        n = 10 if h == 23 else 1
        for i in range(n):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1, h, 5 + i), 7, "click", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    out = {r.hour.hour: r for r in E.hourly_anomaly_zscores(ev, min_hours=12).collect()}
    assert out[23].n_events == 10
    # flat history has zero variance → quiet hours emit NULL z by design
    assert all(out[h].zscore is None for h in range(23))
    # the spike hour is the only scored one, and it scores high
    assert out[23].zscore > 3
    assert out[0].n_hours == 1 and out[23].n_hours == 24


def test_retention_cohorts_golden(spark):
    import datetime as dt

    from twitter_followers_patterns_mapreduce_spark.operators import events as E

    mon1 = dt.datetime(2024, 1, 1)   # Monday
    mon2 = dt.datetime(2024, 1, 8)
    mon3 = dt.datetime(2024, 1, 15)
    rows = [
        # cohort week1: users 1, 2; user 1 returns weeks 2 and 3, user 2 never
        (1, mon1, 1, "click", 0.0, "{}"),
        (2, mon2 + dt.timedelta(days=2), 1, "click", 0.0, "{}"),
        (3, mon3, 1, "click", 0.0, "{}"),
        (4, mon1 + dt.timedelta(days=3), 2, "view", 0.0, "{}"),
        # cohort week2: user 3
        (5, mon2, 3, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    got = {
        (r.cohort_week, r.week_offset): (r.n_active, r.cohort_size, r.retention)
        for r in E.retention_cohorts(ev).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert got[("2024-01-01", 2)] == (1, 2, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1, 1.0)
    assert len(got) == 4


def test_temporal_two_hop_time_ordering(spark):
    import datetime as dt

    from twitter_followers_patterns_mapreduce_spark.operators import events as E

    t0 = dt.datetime(2024, 1, 1)
    # same partition bucket (user_ids ≡ 0 mod 16): walk 16→32→48→16
    # produces edges (16,32)@t0, (32,48)@t1, (48,16)@t2
    rows = [
        (1, t0, 16, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 32, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=20), 48, "click", 0.0, "{}"),
        (4, t0 + dt.timedelta(minutes=30), 16, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    # paths 16→32→48 and 32→48→16 respect time; 48→16→32 would need the
    # (16,32) edge AFTER t2 — it is earlier, so only 2 paths
    out = E.temporal_two_hop_count(ev).collect()[0]
    assert out.n_temporal_two_hops == 2
    # shrinking the window below 10 min kills both
    assert E.temporal_two_hop_count(ev, window_us=1).collect()[0].n_temporal_two_hops == 0


def test_type_transitions_golden(spark):
    import datetime as dt

    from twitter_followers_patterns_mapreduce_spark.operators import events as E

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "b", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "a", 0.0, "{}"),
        (4, t0, 2, "a", 0.0, "{}"),
        (5, t0 + dt.timedelta(minutes=1), 2, "b", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    got = {(r.from_type, r.to_type): (r.n_transitions, r.p_transition)
           for r in E.type_transition_matrix(ev).collect()}
    # from a: →b twice (both users); from b: →a once (user 1 only)
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 2


def test_hourly_anomaly_robust_flags_spike_not_constant(spark):
    """Planted spike → |modified z| > 3.5 flags exactly that hour;
    a constant series has MAD 0 → NULL score, never a division error."""
    import datetime as dt

    from twitter_followers_patterns_mapreduce_spark.operators.events import (
        hourly_anomaly_robust,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(24):
        # type "a": alternating 2/3-per-hour baseline (MAD 0.5 — a flat
        # baseline would give MAD 0 and mask everything), 50 in hour 12;
        # type "b": exactly 1/hour (the MAD-0 degenerate case)
        for _ in range(50 if h == 12 else 2 + (h % 2)):
            rows.append((eid, t0 + dt.timedelta(hours=h, minutes=1), 1, "a", 1.0, "{}"))
            eid += 1
        rows.append((eid, t0 + dt.timedelta(hours=h, minutes=2), 2, "b", 1.0, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    )
    out = hourly_anomaly_robust(ev).collect()
    a_flagged = [r["hour"] for r in out if r["event_type"] == "a" and r["is_outlier"]]
    assert len(a_flagged) == 1 and a_flagged[0].hour == 12
    b_rows = [r for r in out if r["event_type"] == "b"]
    assert all(r["robust_z"] is None and not r["is_outlier"] for r in b_rows)


# ---------------------------------------------------------------------------
# Exact heavy hitters
# ---------------------------------------------------------------------------

def _hh_events(spark, counts: dict[int, int], partitions: int):
    rows = [
        (i, u) for u, c in counts.items() for i in range(c)
    ]
    rows = [(n, u) for n, (_, u) in enumerate(rows)]
    return (
        spark.createDataFrame(rows, schema="event_id LONG, user_id LONG")
        .repartition(partitions)
    )


def test_heavy_hitters_exact_and_partitioning_independent(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.events import heavy_hitters

    # 2000 events: user 1 = 400 (20%), user 2 = 150 (7.5%), rest spread
    counts = {1: 400, 2: 150}
    counts.update({u: 29 for u in range(10, 60)})  # 50 users × 29 = 1450
    n = sum(counts.values())
    phi = 0.05  # threshold 100 → exactly user 1 and user 2
    for parts in (1, 7, 32):
        got = {
            r["user_id"]: r["n_events"]
            for r in heavy_hitters(_hh_events(spark, counts, parts), phi=phi).collect()
        }
        assert got == {1: 400, 2: 150}, f"partitions={parts}"


def test_heavy_hitters_share_column(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.events import heavy_hitters

    counts = {1: 30, 2: 10}
    df = heavy_hitters(_hh_events(spark, counts, 3), phi=0.5).collect()
    assert len(df) == 1 and df[0]["user_id"] == 1
    assert df[0]["share"] == 0.75


def test_heavy_hitters_strict_inequality(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.events import heavy_hitters

    # user 1 has EXACTLY phi*N events → excluded (strict >)
    counts = {1: 25, 2: 75}
    got = {r["user_id"] for r in heavy_hitters(_hh_events(spark, counts, 4), phi=0.25).collect()}
    assert got == {2}


def test_heavy_hitters_rejects_bad_phi(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.events import heavy_hitters

    with pytest.raises(ValueError):
        heavy_hitters(_hh_events(spark, {1: 1}, 1), phi=0.0)


# ---------------------------------------------------------------------------
# Temporal triangles
# ---------------------------------------------------------------------------

def test_temporal_triangle_golden(spark):
    """Users 16/32/48 (same %16 bucket) produce the LEAD-derived edges
    16→32@t1, 32→48@t2, 48→16@t3 — exactly one time-ordered triangle
    inside the window, zero with a window shorter than t3-t1."""
    import datetime as dt
    from twitter_followers_patterns_mapreduce_spark.operators.events import (
        temporal_triangle_count,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 16),
        (2, t0 + dt.timedelta(hours=1), 32),
        (3, t0 + dt.timedelta(hours=2), 48),
        (4, t0 + dt.timedelta(hours=3), 16),
    ]
    ev = spark.createDataFrame(rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG")
    got = temporal_triangle_count(ev, window_us=24 * 3600 * 1_000_000).collect()[0]
    assert (got["n_temporal_triangles"], got["n_closing_nodes"]) == (1, 1)
    # window shorter than the full loop (2h < t3-t1=2h? strictly: t3 at
    # +2h is ON the 2h boundary and <= holds; use 1h to exclude)
    tight = temporal_triangle_count(ev, window_us=3600 * 1_000_000).collect()[0]
    assert tight["n_temporal_triangles"] == 0


def test_temporal_triangle_needs_closing_direction(spark):
    """A wedge whose third edge points the WRONG way (16→48 instead of
    48→16) is a static near-triangle but no directed cycle → 0 motifs.
    (A cycle derived from ONE event chain is always time-ordered — the
    LEAD derivation's edge times increase along the traversal — so the
    direction test is the meaningful negative here; the window test
    above covers the temporal bound.)"""
    import datetime as dt
    from twitter_followers_patterns_mapreduce_spark.operators.events import (
        temporal_triangle_count,
    )

    t0 = dt.datetime(2024, 1, 1)
    # partition bucket 0 (users %16==0): wedge 16->32->48
    # partition bucket 1 (users 12977/13009: %997 = 16/48, %16 == 1):
    # the chord 16->48 — same NODES, wrong direction for a cycle
    rows = [
        (1, t0, 16),
        (2, t0 + dt.timedelta(hours=1), 32),
        (3, t0 + dt.timedelta(hours=2), 48),
        (4, t0 + dt.timedelta(hours=3), 12977),
        (5, t0 + dt.timedelta(hours=4), 13009),
    ]
    ev = spark.createDataFrame(rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG")
    got = temporal_triangle_count(ev).collect()[0]
    assert got["n_temporal_triangles"] == 0


def test_user_ltv_decay_hand_case(spark):
    import math
    from datetime import datetime

    from twitter_followers_patterns_mapreduce_spark.operators.events import (
        LTV_TAU_SEC,
        user_ltv_decay,
    )

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, datetime(2024, 1, 8), 1, "click", 100.0, "{}"),   # age 0 (max ts)
        (2, datetime(2024, 1, 1), 1, "click", 100.0, "{}"),   # age 7 days
        (3, datetime(2024, 1, 8), 2, "click", 50.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    got = {r["user_id"]: r for r in user_ltv_decay(df, k=10).collect()}
    t1 = math.floor(100.0 * math.exp(0.0) * 1e6) / 1e6
    t2 = math.floor(100.0 * math.exp(-7 * 86400 / LTV_TAU_SEC) * 1e6) / 1e6
    assert got[1]["n_events"] == 2 and abs(got[1]["ltv"] - (t1 + t2)) < 1e-9
    assert got[2]["n_events"] == 1 and abs(got[2]["ltv"] - math.floor(50.0 * 1e6) / 1e6) < 1e-9
    # ordering: user 1 first (higher ltv)
    ltvs = [r["ltv"] for r in user_ltv_decay(df, k=10).collect()]
    assert ltvs == sorted(ltvs, reverse=True)


def test_ewma_hourly_hand_case_with_gap(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1, 0, 30, 0)
    rows = [
        (1, t0, 1, "click", 10.0, "{}"),
        (2, t0 + timedelta(hours=1), 1, "click", 20.0, "{}"),
        # hour +2 missing: a gap must contribute ZERO, not shift lags
        (3, t0 + timedelta(hours=3), 1, "click", 40.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    got = {r["window_start"]: r for r in E.ewma_hourly(df).collect()}
    assert set(got) == {
        "2024-01-01 00:00:00", "2024-01-01 01:00:00", "2024-01-01 03:00:00"
    }
    # w_d = 0.3 * 0.7^d over hour distance
    assert got["2024-01-01 00:00:00"]["ewma"] == 3.0
    assert got["2024-01-01 01:00:00"]["ewma"] == 0.3 * 20 + 0.21 * 10  # 8.1
    # gap-correct: hour+2 weight skipped entirely
    expect = 0.3 * 40 + 0.147 * 20 + 0.1029 * 10
    assert abs(got["2024-01-01 03:00:00"]["ewma"] - expect) < 1e-9
    assert got["2024-01-01 03:00:00"]["n_events"] == 1


def test_ewma_hourly_row_lag_would_differ(spark):
    # adversarial: with a 9-hour gap the kernel must FORGET the old
    # bucket (row-lag decay would still include it at weight 0.21)
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1, 0, 30, 0)
    rows = [
        (1, t0, 1, "click", 100.0, "{}"),
        (2, t0 + timedelta(hours=9), 1, "click", 10.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    got = {r["window_start"]: r["ewma"] for r in E.ewma_hourly(df).collect()}
    assert got["2024-01-01 09:00:00"] == 3.0  # 0.3*10, nothing else


def test_user_growth_accounting_hand_case(spark):
    from datetime import datetime

    rows = [
        # day 1: users 1, 2 (both new); day 2: 1 returns, 3 new; day 3: 3 only
        (1, datetime(2024, 1, 1, 9), 1, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10), 2, "click", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 11), 1, "view", 1.0, "{}"),   # same user+day: no double count
        (4, datetime(2024, 1, 2, 9), 1, "click", 1.0, "{}"),
        (5, datetime(2024, 1, 2, 10), 3, "click", 1.0, "{}"),
        (6, datetime(2024, 1, 3, 9), 3, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    got = {r["day"]: r for r in E.user_growth_accounting(df).collect()}
    assert (got["2024-01-01"]["active_users"], got["2024-01-01"]["new_users"]) == (2, 2)
    assert got["2024-01-01"]["returning_users"] == 0
    assert (got["2024-01-02"]["active_users"], got["2024-01-02"]["new_users"]) == (2, 1)
    assert got["2024-01-02"]["returning_users"] == 1
    assert got["2024-01-03"]["cumulative_users"] == 3
    assert got["2024-01-03"]["returning_users"] == 1


def test_funnel_step_timing_hand_case(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        # user 1: click then purchase after 120s (in window)
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + timedelta(seconds=120), 1, "purchase", 1.0, "{}"),
        # user 1 second purchase later: first conversion wins
        (3, t0 + timedelta(seconds=500), 1, "purchase", 1.0, "{}"),
        # user 2: click, purchase BEFORE the click (ignored), none after
        (4, t0, 2, "purchase", 1.0, "{}"),
        (5, t0 + timedelta(seconds=10), 2, "click", 1.0, "{}"),
        # user 3: click, purchase 2h later (outside the 1h window)
        (6, t0, 3, "click", 1.0, "{}"),
        (7, t0 + timedelta(hours=2), 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, schema="event_id LONG, ts TIMESTAMP, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    (r,) = E.funnel_step_timing(df).collect()
    assert r["n_first"] == 3 and r["n_converted"] == 1
    assert r["p50_sec"] == 120.0 and r["p90_sec"] == 120.0


def test_hourly_acf_periodic_series(spark):
    """A strict period-2 hourly series: acf(2) = 1 exactly, acf(1) < 0
    (anti-phase), pair counts = dense span minus lag."""
    import itertools

    # hours 0..47, counts alternate 1 and 3 events per hour
    rows = []
    eid = itertools.count()
    for h in range(48):
        for _ in range(1 if h % 2 == 0 else 3):
            rows.append((next(eid), 7, "click", h * 3600_000_000))
    df = spark.createDataFrame(
        rows, schema="event_id LONG, user_id LONG, event_type STRING, us LONG"
    ).selectExpr("event_id", "user_id", "event_type", "timestamp_micros(us) AS ts")
    from twitter_followers_patterns_mapreduce_spark.operators.events import hourly_acf

    out = {r["lag"]: r for r in hourly_acf(df, lags=(1, 2)).collect()}
    assert out[1]["n_pairs"] == 47 and out[2]["n_pairs"] == 46
    assert out[2]["acf"] == 1.0
    assert out[1]["acf"] < -0.9


def test_hourly_acf_gaps_count_as_zero(spark):
    """Missing hours must enter the series as 0, not be skipped: two
    events 3 hours apart make a 4-hour dense span, so lag-1 has 3
    pairs over (x, 0, 0, y)."""
    df = spark.createDataFrame(
        [(1, 1, "c", 0), (2, 1, "c", 3 * 3600_000_000)],
        schema="event_id LONG, user_id LONG, event_type STRING, us LONG",
    ).selectExpr("event_id", "user_id", "event_type", "timestamp_micros(us) AS ts")
    from twitter_followers_patterns_mapreduce_spark.operators.events import hourly_acf

    out = {r["lag"]: r for r in hourly_acf(df, lags=(1, 3)).collect()}
    assert out[1]["n_pairs"] == 3
    assert out[3]["n_pairs"] == 1  # single pair -> zero variance -> NULL
    assert out[3]["acf"] is None


def test_session_trigrams_respect_boundaries(spark):
    """A 4-event session yields its two contiguous trigrams; a triple
    spanning a session gap must not count."""
    from twitter_followers_patterns_mapreduce_spark.operators.events import (
        SESSION_GAP_US,
        session_trigrams,
    )

    gap = SESSION_GAP_US
    us = [0, 1_000_000, 2_000_000, 3_000_000,          # session 1: a b c d
          3_000_000 + gap + 1, 3_000_000 + gap + 1_000_001,
          3_000_000 + gap + 2_000_002]                 # session 2: b c d
    types = ["a", "b", "c", "d", "b", "c", "d"]
    df = spark.createDataFrame(
        [(i, 1, types[i], us[i]) for i in range(7)],
        schema="event_id LONG, user_id LONG, event_type STRING, us LONG",
    ).selectExpr("event_id", "user_id", "event_type", "timestamp_micros(us) AS ts")
    got = {(r["t1"], r["t2"], r["t3"]): r["n_occurrences"]
           for r in session_trigrams(df, k=20).collect()}
    # (b,c,d) occurs in BOTH sessions; (c,d,b)/(d,b,c) would span the gap
    assert got == {("a", "b", "c"): 1, ("b", "c", "d"): 2}


def test_diff_in_diff_closed_form(spark):
    """Hand-built cells: T pre mean 10, T post mean 25, C pre 5, C post
    12 -> DiD = (25-10) - (12-5) = 8."""
    from twitter_followers_patterns_mapreduce_spark.operators.events import diff_in_diff

    def mk(uid, day, vals):
        return [(uid * 1000 + day * 100 + i, uid, "c",
                 f"199{5 + day}-06-01 00:00:0{i}", float(v))
                for i, v in enumerate(vals)]

    rows = (mk(1, 0, [8, 12]) + mk(1, 1, [20, 30])       # treated (odd uid)
            + mk(2, 0, [4, 6]) + mk(2, 1, [10, 14]))     # control
    df = spark.createDataFrame(
        rows, schema="event_id LONG, user_id LONG, event_type STRING, s STRING, value DOUBLE"
    ).selectExpr("event_id", "user_id", "event_type", "CAST(s AS TIMESTAMP) AS ts", "value")
    (r,) = diff_in_diff(df, cutover="1996-01-01").collect()
    assert (r["n_t_pre"], r["n_t_post"], r["n_c_pre"], r["n_c_post"]) == (2, 2, 2, 2)
    assert (r["mean_t_pre"], r["mean_t_post"]) == (10.0, 25.0)
    assert (r["mean_c_pre"], r["mean_c_post"]) == (5.0, 12.0)
    assert r["did"] == 8.0


def test_sliding_distinct_theta_window_semantics(spark):
    """Users 1,2 in hour 0; user 2 again in hour 1; user 3 in hour 30:
    win 0 = {1,2}, win 1 = {1,2} (trailing union), win 30 = {3} only
    (hours 0-1 fell out of the 24h window); silent hours don't appear."""
    from twitter_followers_patterns_mapreduce_spark.operators.events import (
        sliding_distinct_theta,
    )

    rows = [(1, 1, 0), (2, 2, 0), (3, 2, 1), (4, 3, 30)]
    df = spark.createDataFrame(
        [(e, u, "c", h * 3600_000_000) for e, u, h in rows],
        schema="event_id LONG, user_id LONG, event_type STRING, us LONG",
    ).selectExpr("event_id", "user_id", "event_type", "timestamp_micros(us) AS ts")
    out = {r["win_hour"]: r for r in sliding_distinct_theta(df).collect()}
    assert set(out) == {0, 1, 30}  # observed hours only
    assert out[0]["n_users_win"] == 2
    assert out[1]["n_users_win"] == 2
    assert out[30]["n_users_win"] == 1
    assert all(r["ok"] for r in out.values())  # theta exact at this size


def test_topk_churn_closed_form(spark):
    """Hand-checkable leaderboard: early top-2 = {1, 2}, late top-2 =
    {2, 3}; user 2 moves rank 2 -> 1 (footrule 1), one newcomer, one
    dropout, jaccard 1/3."""
    import datetime as dt

    from twitter_followers_patterns_mapreduce_spark.operators.events import topk_churn

    t0 = dt.datetime(1995, 1, 1)
    t1 = dt.datetime(1997, 1, 1)
    rows = []
    eid = 0
    for uid, n in [(1, 5), (2, 3), (3, 1)]:  # early counts
        for _ in range(n):
            rows.append((eid, t0, uid, "click", 1.0, "{}")); eid += 1
    for uid, n in [(2, 6), (3, 4), (1, 0)]:  # late counts
        for _ in range(n):
            rows.append((eid, t1, uid, "click", 1.0, "{}")); eid += 1
    events = spark.createDataFrame(
        rows,
        schema="event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    row = topk_churn(events, cutover="1996-01-01", k=2).first()
    assert row["n_top_early"] == 2 and row["n_top_late"] == 2
    assert row["n_common"] == 1  # user 2
    assert row["newcomers"] == 1 and row["dropouts"] == 1
    assert row["jaccard"] == 0.333333
    assert row["rank_footrule"] == 1


def test_holt_forecast_matches_python_recursion_and_fills_gaps(spark):
    """Closed-form Holt check: a tiny two-type event set whose hourly
    series (INCLUDING a zero-filled gap hour) is folded independently
    in Python — level/trend/forecasts must match exactly at the 6dp
    floor, and the gap hour must enter the recursion as a real zero."""
    import datetime as dt
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.events import (
        holt_linear_forecast,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = []
    # type 'a': hours 0,1,3 (hour 2 is a GAP): counts 2, 1, 4
    for h, n in ((0, 2), (1, 1), (3, 4)):
        rows += [("a", t0 + dt.timedelta(hours=h), float(i)) for i in range(n)]
    # type 'b': constant 1/hour over hours 0..3
    rows += [("b", t0 + dt.timedelta(hours=h), 1.0) for h in range(4)]
    events = spark.createDataFrame(
        [(i, et, ts, "u", v) for i, (et, ts, v) in enumerate(rows)],
        "event_id LONG, event_type STRING, ts TIMESTAMP, user_id STRING, value DOUBLE",
    )

    def holt(ys, horizon=3):
        l, b = float(ys[0]), 0.0
        for y in ys[1:]:
            ln = 0.5 * y + 0.5 * (l + b)
            b = 0.25 * (ln - l) + 0.75 * b
            l = ln
        f6 = lambda x: math.floor(x * 1_000_000) / 1_000_000
        return (f6(l), f6(b)) + tuple(f6(l + h * b) for h in range(1, horizon + 1))

    expect = {"a": holt([2, 1, 0, 4]), "b": holt([1, 1, 1, 1])}
    got = {
        r["event_type"]: (
            r["level"], r["trend"], r["fc_1"], r["fc_2"], r["fc_3"], r["n_hours"]
        )
        for r in holt_linear_forecast(events, horizon=3).collect()
    }
    assert got == {k: v + (4,) for k, v in expect.items()}
    # the constant series must show zero trend and level == the constant
    assert got["b"][0] == 1.0 and got["b"][1] == 0.0
