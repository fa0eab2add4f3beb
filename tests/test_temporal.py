"""Hand-computed goldens for the temporal joins (as-of, range) on tiny
deterministic streams — inclusive boundaries, tie-breaks, bin-crossing
pairs, and the no-prior-match NULL row are each pinned explicitly."""

from __future__ import annotations

import datetime as dt

import pytest

from twitter_followers_patterns_mapreduce_spark.operators import temporal as TJ

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def at(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


@pytest.fixture(scope="module")
def tiny_stream(spark):
    rows = [
        # user 7: clicks then purchases; purchase id3 ties a click's ts
        (1, at(1800), 7, "click", 1.0, "{}"),
        (2, at(2700), 7, "click", 2.0, "{}"),
        (3, at(2700), 7, "purchase", 10.0, "{}"),  # same ts as click id2 → inclusive
        (4, at(4200), 7, "purchase", 20.0, "{}"),
        # user 8: purchase with NO prior click; then two same-ts clicks
        (5, at(300), 8, "purchase", 5.0, "{}"),
        (6, at(600), 8, "click", 3.0, "{}"),
        (7, at(1200), 8, "click", 4.0, "{}"),  # same ts as id8
        (8, at(1200), 8, "click", 6.0, "{}"),  # higher id wins the tie
        (9, at(1500), 8, "purchase", 7.0, "{}"),
    ]
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_asof_join_goldens(tiny_stream):
    r = {
        x["event_id"]: (x["asof_value"], x["asof_lag_s"])
        for x in TJ.asof_join(tiny_stream, "purchase", "click").collect()
    }
    assert r[3] == (2.0, 0)  # click at the same instant is visible
    assert r[4] == (2.0, 1500)  # most recent, not first
    assert r[5] == (None, None)  # left-outer: no prior click
    assert r[9] == (6.0, 300)  # same-ts clicks → highest event_id
    assert len(r) == 4


@pytest.fixture(scope="module")
def range_stream(spark):
    rows = [
        # user 7: one view, purchases straddling the 600 s window edge
        (1, at(0), 7, "view", 0.0, "{}"),
        (2, at(300), 7, "purchase", 1.0, "{}"),  # in
        (3, at(599), 7, "purchase", 1.0, "{}"),  # in (< 600)
        (4, at(600), 7, "purchase", 1.0, "{}"),  # OUT (exclusive)
        # user 7: bin-crossing pair — view in bin 0, purchase in bin 1
        (5, at(570), 7, "view", 0.0, "{}"),
        (6, at(720), 7, "purchase", 1.0, "{}"),  # Δ=150 s, crosses bin edge
        # user 8: purchase BEFORE the view → no pair
        (7, at(1000), 8, "purchase", 1.0, "{}"),
        (8, at(1100), 8, "view", 0.0, "{}"),
    ]
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_range_join_goldens(range_stream):
    out = TJ.range_join_attribution(
        range_stream, "view", "purchase", window_us=600 * 1_000_000
    ).collect()
    r = {x["user_id"]: (x["n_pairs"], x["n_right_attributed"]) for x in out}
    # view@0 → purchases @300,@599 (+@600 excluded, @720 out of range);
    # view@570 → purchases @599 (Δ=29), @600 (Δ=30, in), @720 (Δ=150, bin-crossing)
    assert r[7] == (5, 4)
    assert 8 not in r  # purchase precedes the view
    assert len(r) == 1


def test_asof_join_is_single_window_no_join(tiny_stream):
    plan = (
        TJ.asof_join(tiny_stream, "purchase", "click")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # merge formulation: no join node at all, exactly one Window
    assert "Join" not in plan
    assert plan.count("Window") >= 1


def test_range_join_is_equi_hash_join(range_stream):
    plan = (
        TJ.range_join_attribution(range_stream, "view", "purchase")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
