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
