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


def test_synthetic_stream_drains_to_batch_equality(spark, tmp_path):
    """Draining the custom streaming source to its fixed point must
    produce EXACTLY the batch read's rows (same options) — the
    replayable-connector contract, via multiple micro-batches
    (batch_nodes < n_nodes forces several offsets).  foreachBatch +
    checkpoint: the memory sink cannot recover from a checkpoint."""
    from twitter_followers_patterns_mapreduce_spark.sources.synthetic import (
        register_synthetic_source,
        register_synthetic_stream_source,
    )

    register_synthetic_source(spark)
    register_synthetic_stream_source(spark)
    opts = {"n_nodes": "400", "out_degree": "3", "seed": "7"}
    rows: list = []
    batches: list = []

    stream = (
        spark.readStream.format("synthetic_edges_stream")
        .options(batch_nodes="150", **opts)
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: (batches.append(bid), rows.extend(tuple(r) for r in df.collect()))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # a second run continues from the checkpoint until the fixed point
    for _ in range(10):
        before = len(rows)
        q = (
            spark.readStream.format("synthetic_edges_stream")
            .options(batch_nodes="150", **opts)
            .load()
            .writeStream.foreachBatch(
                lambda df, bid: rows.extend(tuple(r) for r in df.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if len(rows) == before:
            break
    from collections import Counter

    # multiset compare: the generator legitimately emits duplicate (src,
    # dst) pairs (independent draws can collide), so replay-duplicate
    # detection needs counts, not a set
    got = Counter(rows)
    want = Counter(
        tuple(r)
        for r in spark.read.format("synthetic_edges").options(**opts).load().collect()
    )
    assert got == want and len(got) > 0


def test_synthetic_stream_restart_resumes_from_offset(spark, tmp_path):
    """After the fixed point, a restart with the SAME checkpoint must
    add ZERO rows (checkpointed-offset resume, not regeneration), and
    the total must equal the golden generator's edge count."""
    from twitter_followers_patterns_mapreduce_spark.sources.synthetic import (
        expected_edges,
        register_synthetic_stream_source,
    )

    register_synthetic_stream_source(spark)
    ckpt = str(tmp_path / "ckpt")
    counts: list = []

    def drain():
        n_before = sum(counts)
        q = (
            spark.readStream.format("synthetic_edges_stream")
            .options(n_nodes="200", out_degree="2", batch_nodes="80", seed="3")
            .load()
            .writeStream.foreachBatch(lambda df, bid: counts.append(df.count()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(counts) - n_before

    first = drain()
    total = first
    for _ in range(10):
        n = drain()
        if n == 0:
            break
        total += n
    assert first > 0
    assert drain() == 0  # fixed point: restart adds nothing
    assert total == len(expected_edges(200, 2, seed=3))
