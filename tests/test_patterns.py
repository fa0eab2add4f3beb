"""BGP pattern-matcher tests: hand goldens, the compile rules
(greedy ordering, disconnection rejection, isomorphism toggle), and the
differential that ties the generic matcher back to the reference's
pinned triangle numbers."""

from __future__ import annotations

import pytest

from tests.conftest import make_edges
from twitter_followers_patterns_mapreduce_spark.operators import graph as G
from twitter_followers_patterns_mapreduce_spark.operators import patterns as PT


def test_single_atom_is_the_edge_set(spark):
    edges = make_edges(spark, [(1, 2), (2, 3), (1, 1), (1, 2)])
    got = sorted(map(tuple, PT.match_pattern(edges, [("x", "y")]).collect()))
    assert got == [(1, 2), (2, 3)]  # dedup + self-loop drop


def test_wedge_pattern_counts_two_hops(spark):
    # wedge (a→b, b→c) on a 3-cycle: every vertex centers one wedge
    edges = make_edges(spark, [(1, 2), (2, 3), (3, 1)])
    rows = PT.match_pattern(edges, [("a", "b"), ("b", "c")]).collect()
    assert sorted((r["a"], r["b"], r["c"]) for r in rows) == [
        (1, 2, 3), (2, 3, 1), (3, 1, 2),
    ]


def test_triangle_pattern_matches_reference_raw_count(spark, sample_edges):
    """The generic matcher, given the triangle pattern with the RS job's
    exact semantics (x≠z via distinctness of the wedge endpoints),
    reproduces the reference-pinned raw count on the FIXTURES sample
    graph — the BGP engine subsumes the hand-built job."""
    n = PT.match_pattern_count(
        sample_edges,
        [("x", "y"), ("y", "z"), ("z", "x")],
        constraints=["x != z"],  # the RS job's F3 conjunct
    ).collect()[0]["n_matches"]
    raw = G.triangle_count_raw(sample_edges, max_limit=None).collect()[0][
        "triangle_count_raw"
    ]
    assert n == raw  # FIXTURES.md golden: 6 on the README sample graph


def test_square_bushy_equals_generic_leftdeep(spark):
    import random as _r

    rnd = _r.Random(4)
    edges = sorted({(rnd.randrange(12), rnd.randrange(12)) for _ in range(70)})
    e = make_edges(spark, [p for p in edges if p[0] != p[1]])
    bushy = PT.square_count(e).collect()[0]["n_squares"]
    generic = PT.match_pattern_count(
        e,
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        constraints=["a < b", "a < c", "a < d", "a != c", "b != d"],
    ).collect()[0]["n_matches"]
    assert bushy == generic and bushy > 0


def test_square_golden_one_cycle(spark):
    e = make_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert PT.square_count(e).collect()[0]["n_squares"] == 1
    # a triangle plus a pendant edge has no 4-cycle
    e2 = make_edges(spark, [(1, 2), (2, 3), (3, 1), (1, 4)])
    assert PT.square_count(e2).collect()[0]["n_squares"] == 0


def test_diamond_golden(spark):
    e = make_edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    assert PT.diamond_count(e).collect()[0]["n_diamonds"] == 1


def test_disconnected_pattern_rejected(spark):
    edges = make_edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="disconnected"):
        PT.match_pattern(edges, [("a", "b"), ("c", "d")]).collect()


def test_distinct_vars_gives_isomorphisms(spark):
    # homomorphism: a 2-cycle matches wedge a→b→c with c=a;
    # isomorphism (distinct_vars) excludes it
    edges = make_edges(spark, [(1, 2), (2, 1)])
    homo = PT.match_pattern(edges, [("a", "b"), ("b", "c")]).count()
    iso = PT.match_pattern(edges, [("a", "b"), ("b", "c")], distinct_vars=True).count()
    assert homo == 2 and iso == 0


def test_empty_pattern_rejected(spark):
    with pytest.raises(ValueError):
        PT.match_pattern(make_edges(spark, [(1, 2)]), [])
