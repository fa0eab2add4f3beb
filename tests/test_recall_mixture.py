"""Goldens for the round-4 audit operators: ANN recall@k, domain-mixture
resampling, export sharding, and degree assortativity.

Each test pins semantics on a hand-computable fixture (the oracle gate
at sf0.01 pins engine parity; these pin *meaning*).
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import make_edges
from twitter_followers_patterns_mapreduce_spark.operators import corpus as CP
from twitter_followers_patterns_mapreduce_spark.operators import graph as G
from twitter_followers_patterns_mapreduce_spark.operators import similarity as S

EMB_SCHEMA = "vec_id LONG, embedding ARRAY<FLOAT>"
DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def test_recall_is_one_when_bucket_holds_truth(spark):
    """All vectors share one sign bucket (all-positive dims) → LSH sees
    the full corpus → recall@k must be exactly 1 for every query."""
    rows = [(i, [1.0 + i, 0.5 + (i % 3)]) for i in range(8)]
    emb = spark.createDataFrame(rows, schema=EMB_SCHEMA)
    out = {r["query_id"]: r for r in S.ann_recall_at_k(emb, k=3).collect()}
    assert 0 in out  # vec_id 0 is always a query (QUERY_MOD divides 0)
    for r in out.values():
        assert r["n_truth"] == 3
        assert r["n_hits"] == 3
        assert r["recall_at_k"] == 1.0


def test_recall_drops_when_bucket_splits_truth(spark):
    """Nearest neighbor placed in a different sign bucket → LSH cannot
    return it → n_hits < n_truth and recall reflects exactly the miss."""
    rows = [
        (0, [1.0, 1.0]),    # query, bucket 3
        (1, [1.0, -1.0]),   # closest by angle among... actually bucket 1
        (2, [1.0, 0.9]),    # same bucket as query
        (3, [0.9, 1.0]),    # same bucket as query
        (4, [-1.0, -1.0]),  # opposite bucket
    ]
    emb = spark.createDataFrame(rows, schema=EMB_SCHEMA)
    got = {r["query_id"]: r for r in S.ann_recall_at_k(emb, k=3).collect()}[0]
    # truth top-3 of query 0: vec 2 and 3 (sim≈1) and vec 1 (sim 0) —
    # vec 4 has sim -1.  LSH bucket of the query holds only {2, 3}.
    assert got["n_truth"] == 3
    assert got["n_approx"] == 2
    assert got["n_hits"] == 2
    assert got["recall_at_k"] == round(2 / 3, 6)


@pytest.fixture()
def docs(spark):
    rows = [
        # src1 → weight (1%3)+1 = 2; src2 → 3 (keep all); src3 → 1
        (i, f"word{i}", "en", f"src{1 + (i % 3)}", 100 + i)
        for i in range(60)
    ]
    return spark.createDataFrame(rows, schema=DOC_SCHEMA)


def test_domain_mixture_weights_and_determinism(spark, docs):
    out = {r["source"]: r for r in CP.corpus_domain_mixture(docs).collect()}
    assert set(out) == {"src1", "src2", "src3"}
    assert out["src1"]["target_weight"] == 2
    assert out["src2"]["target_weight"] == 3
    assert out["src3"]["target_weight"] == 1
    # weight 3 → keep-all by construction
    assert out["src2"]["n_kept"] == out["src2"]["n_docs"]
    # downsampled sources keep a strict, non-empty subset ordered by weight
    for src in ("src1", "src3"):
        assert 0 < out[src]["n_kept"] <= out[src]["n_docs"]
    # rerun is bit-identical (membership is pure function of doc_id)
    again = {r["source"]: r for r in CP.corpus_domain_mixture(docs).collect()}
    assert {s: r["n_kept"] for s, r in out.items()} == {
        s: r["n_kept"] for s, r in again.items()
    }


def test_export_shards_partition_all_docs(spark, docs):
    rows = CP.corpus_export_shards(docs, n_shards=4).collect()
    assert sum(r["n_docs"] for r in rows) == 60
    assert sum(r["sum_chars"] for r in rows) == sum(100 + i for i in range(60))
    for r in rows:
        assert 0 <= r["shard"] < 4
        assert r["min_hash"] <= r["max_hash"]


def _numpy_assortativity(pairs):
    from collections import Counter

    out = Counter(u for u, _ in pairs)
    inn = Counter(v for _, v in pairs)
    xs = [out[u] for u, v in pairs]
    ys = [inn[v] for u, v in pairs]
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    return (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))


def test_assortativity_matches_reference_formula(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5), (5, 6), (6, 4), (3, 6), (2, 5), (5, 3)]
    row = G.degree_assortativity(make_edges(spark, pairs)).collect()[0]
    assert row["n"] == 10
    assert row["assortativity"] == pytest.approx(_numpy_assortativity(pairs), abs=1e-12)
    assert -1.0 <= row["assortativity"] <= 1.0


def test_assortativity_zero_variance_is_null(spark):
    """Star graph: every edge has x=3, y=1 → zero variance on both axes
    → correlation undefined → the operator's variance guard yields NULL."""
    row = G.degree_assortativity(make_edges(spark, [(1, 2), (1, 3), (1, 4)])).collect()[0]
    assert row["assortativity"] is None


def test_domain_mixture_weighted_dim_table(spark, docs):
    """Production form: weights from a broadcast dim table; unknown
    sources drop (n_kept = 0), weight == max keeps everything, and the
    dim-driven result for the same weights matches the derived form."""
    weights = spark.createDataFrame(
        [("src1", 2), ("src2", 3)], schema="source STRING, target_weight INT"
    )
    out = {
        r["source"]: r
        for r in CP.corpus_domain_mixture_weighted(docs, weights).collect()
    }
    assert out["src2"]["n_kept"] == out["src2"]["n_docs"]      # max weight → keep all
    assert out["src3"]["target_weight"] == 0                   # not in dim
    assert out["src3"]["n_kept"] == 0                          # dropped, visibly
    # same weights as the derived form → identical keeps for src1/src2
    derived = {
        r["source"]: r["n_kept"] for r in CP.corpus_domain_mixture(docs).collect()
    }
    assert out["src1"]["n_kept"] == derived["src1"]
    assert out["src2"]["n_kept"] == derived["src2"]
