"""Custom Python DataSource: partition-parallel reads reproduce the
driver-side golden generator exactly, rereads are deterministic, and
the graph operators run unchanged on the connector's output."""

from __future__ import annotations

from twitter_followers_patterns_mapreduce_spark.operators import graph as G
from twitter_followers_patterns_mapreduce_spark.sources.synthetic import (
    expected_edges,
    register_synthetic_source,
)


def _read(spark, **opts):
    reader = spark.read.format("synthetic_edges")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_synthetic_source_matches_golden(spark):
    register_synthetic_source(spark)
    df = _read(spark, n_nodes=50, out_degree=3, n_partitions=4)
    got = sorted(map(tuple, df.collect()))
    assert got == sorted(expected_edges(50, 3))
    # partition count is the declared parallelism, not one driver blob
    assert df.rdd.getNumPartitions() == 4


def test_synthetic_source_rereads_identically(spark):
    register_synthetic_source(spark)
    a = sorted(map(tuple, _read(spark, n_nodes=40, out_degree=2, n_partitions=3).collect()))
    b = sorted(map(tuple, _read(spark, n_nodes=40, out_degree=2, n_partitions=5).collect()))
    assert a == b  # partitioning never changes content


def test_graph_operators_run_on_connector(spark):
    register_synthetic_source(spark)
    edges = _read(spark, n_nodes=60, out_degree=3, n_partitions=4)
    golden = expected_edges(60, 3)
    ce = G.count_edges(edges, 10**9).collect()[0][0]
    assert ce == len(golden)
    indeg, outdeg = {}, {}
    for s, d in golden:
        outdeg[s] = outdeg.get(s, 0) + 1
        indeg[d] = indeg.get(d, 0) + 1
    want_2hop = sum(indeg.get(v, 0) * outdeg.get(v, 0) for v in set(indeg) | set(outdeg))
    assert G.two_hop_count_exact(edges).collect()[0][0] == want_2hop
