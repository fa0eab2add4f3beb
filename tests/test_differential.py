"""Differential / property tests (SURVEY.md §5): random graphs checked
against a pure-Python oracle, plus the cross-implementation agreements
the reference itself relies on (RS ≡ RJ, EX ≡ AP under a non-binding
MAX — ``README.md:79-81``).
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import make_edges
from twitter_followers_patterns_mapreduce_spark.operators import graph as G

N_NODES = 25


def random_edges(seed: int, n_edges: int = 120) -> list[tuple[int, int]]:
    rnd = random.Random(seed)
    edges = set()
    while len(edges) < n_edges:
        a, b = rnd.randrange(N_NODES), rnd.randrange(N_NODES)
        if a != b:
            edges.add((a, b))
    return sorted(edges)


def py_two_hop_count(edges: list[tuple[int, int]]) -> int:
    """Σ paths X→Z→Y including round-trips (EX/AP semantics)."""
    out = {}
    inn = {}
    for a, b in edges:
        out[a] = out.get(a, 0) + 1
        inn[b] = inn.get(b, 0) + 1
    return sum(inn.get(v, 0) * out.get(v, 0) for v in set(inn) | set(out))


def py_triangle_raw(edges: list[tuple[int, int]]) -> int:
    """#(2-hop path x→y→z, x≠z, with closing edge z→x) — RS semantics."""
    es = set(edges)
    succ = {}
    for a, b in edges:
        succ.setdefault(a, []).append(b)
    raw = 0
    for x, y in edges:
        for z in succ.get(y, []):
            if z != x and (z, x) in es:
                raw += 1
    return raw


def one(df):
    return df.collect()[0][0]


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_two_hop_exact_matches_python_oracle(spark, seed):
    edges = random_edges(seed)
    assert one(G.two_hop_count_exact(make_edges(spark, edges))) == py_two_hop_count(edges)


@pytest.mark.parametrize("seed", [7, 42])
def test_exact_equals_materialized_count(spark, seed):
    """EX ≡ AP when MAX is non-binding: the degree-product rewrite and
    the materializing join count the same quantity."""
    e = make_edges(spark, random_edges(seed))
    assert one(G.two_hop_count_exact(e)) == G.two_hop_paths(e, 10**9).count()


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_rs_equals_rj_equals_python(spark, seed):
    """Shuffle and broadcast triangle variants agree with each other and
    with the Python oracle (the reference's own differential check)."""
    edges = random_edges(seed)
    e = make_edges(spark, edges)
    want = py_triangle_raw(edges)
    assert one(G.triangle_count_raw(e, 10**9, strategy="shuffle")) == want
    assert one(G.triangle_count_raw(e, 10**9, strategy="broadcast")) == want
    assert one(G.triangle_count_raw(e, 10**9, strategy="auto")) == want


@pytest.mark.parametrize("seed", [7, 42])
def test_raw_is_three_times_triangles(spark, seed):
    edges = random_edges(seed)
    e = make_edges(spark, edges)
    raw = py_triangle_raw(edges)
    assert raw % 3 == 0  # duplicate-free edge set → every triangle counted 3×
    assert one(G.triangle_count(e, 10**9)) == raw // 3


def test_degrees_match_python(spark):
    edges = random_edges(99)
    got = {r["id"]: (r["out_deg"], r["in_deg"]) for r in G.degrees(make_edges(spark, edges)).collect()}
    want = {}
    for a, b in edges:
        want.setdefault(a, [0, 0])[0] += 1
        want.setdefault(b, [0, 0])[1] += 1
    assert got == {k: tuple(v) for k, v in want.items()}
