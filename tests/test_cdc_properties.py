"""Property tests (hypothesis): MERGE apply and k-core peeling agree
with direct Python models on arbitrary generated inputs — the
model-based check that catches join/edge-case bugs goldens miss."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import make_edges
from twitter_followers_patterns_mapreduce_spark.operators.cdc import merge_upsert
from twitter_followers_patterns_mapreduce_spark.operators.graph_iter import k_core

keys = st.integers(0, 15)

deltas = st.lists(
    st.tuples(keys, st.sampled_from("UID"), st.integers(-100, 100)),
    max_size=12,
    unique_by=lambda t: t[0],  # one delta row per key (the pinned contract)
)
bases = st.dictionaries(keys, st.integers(-100, 100), max_size=12)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(base=bases, delta=deltas)
def test_merge_upsert_matches_model(spark, base, delta):
    base_df = spark.createDataFrame(
        [(k, float(v)) for k, v in base.items()] or [(999, 0.0)],
        schema="k LONG, price DOUBLE",
    )
    if not base:
        base_df = base_df.where("k < 0")  # truly empty base
    delta_df = spark.createDataFrame(
        [(k, op, float(v)) for k, op, v in delta] or [(999, "D", 0.0)],
        schema="k LONG, op STRING, price DOUBLE",
    )
    if not delta:
        delta_df = delta_df.where("k < 0")

    model = dict(base)
    for k, op, v in delta:
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v

    got = {
        r["k"]: r["price"]
        for r in merge_upsert(base_df, delta_df, "k", ["price"]).collect()
    }
    assert got == {k: float(v) for k, v in model.items()}


edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=25
)


def _model_k_core(edges, k):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = set(adj)
    while True:
        drop = {v for v in alive if sum(1 for n in adj[v] if n in alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: sum(1 for n in adj[v] if n in alive) for v in alive}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists, k=st.integers(1, 4))
def test_k_core_matches_model(spark, edges, k):
    got = {r["v"]: r["core_deg"] for r in k_core(make_edges(spark, edges), k=k, rounds=30).collect()}
    assert got == _model_k_core(edges, k)


words = st.sampled_from("aa bb cc dd ee ff gg hh".split())
docs_strategy = st.lists(
    st.lists(words, min_size=3, max_size=9).map(" ".join),
    min_size=2,
    max_size=8,
)
thresholds = st.sampled_from([0.3, 0.5, 0.6, 0.8])


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy, t=thresholds)
def test_jaccard_prefix_matches_inverted_index(spark, texts, t):
    """The prefix-filtered set-similarity join must lose NOTHING on
    arbitrary tiny-vocabulary corpora at assorted thresholds — the
    ceil(t*n) prefix-length boundary and the size-compatibility prune
    are exactly where an off-by-one would silently drop pairs."""
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), schema="doc_id LONG, text STRING"
    )
    a = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs_prefix(docs, threshold=t).collect()
    }
    b = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=t).collect()
    }
    assert a == b


scd2_keys = st.lists(st.integers(1, 60), min_size=1, max_size=12, unique=True)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ks=scd2_keys)
def test_scd2_intervals_tile_and_single_current(spark, ks):
    """SCD2 invariants on arbitrary key sets: per key, versions are
    exactly [0] (unchanged) or [0, 1] (bumped, key % 7 == 0), intervals
    tile (valid_to of one row == valid_from of the next, strictly
    increasing), and exactly the LAST version is current/open."""
    import datetime as dt

    from twitter_followers_patterns_mapreduce_spark.operators.relational import (
        orders_scd2_history,
    )

    d0 = dt.date(1995, 1, 1)
    rows = [
        (k, 1, "O", 1.0, d0 + dt.timedelta(days=k), "3-MEDIUM", "c", 0, "x")
        for k in ks
    ]
    orders = spark.createDataFrame(
        rows,
        schema="o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING, "
        "o_clerk STRING, o_shippriority LONG, o_comment STRING",
    )
    by_key: dict[int, list] = {}
    for r in orders_scd2_history(orders).collect():
        by_key.setdefault(r["o_orderkey"], []).append(r)
    assert set(by_key) == set(ks)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == ([0, 1] if k % 7 == 0 else [0])
        assert [bool(r["is_current"]) for r in vs[:-1]] == [False] * (len(vs) - 1)
        assert vs[-1]["is_current"] is True and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            # ISO date strings: lexicographic == chronological
            assert a["valid_to"] == b["valid_from"] and a["valid_from"] < a["valid_to"]
