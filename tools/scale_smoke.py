"""Scale smoke: run the core graph operators on a synthetic graph ~30×
the harness edge count, via the engine's own DataSource connector —
evidence that the operator plans (not just the sf0.1 fixtures) hold as
data grows.

    PYTHONPATH=/root/repo python tools/scale_smoke.py [n_nodes] [out_degree]

Prints one JSON line with per-query seconds and result scalars.
Defaults: 100k nodes × out-degree 20 ≈ 2M edges (harness sf0.1 ≈ 60k).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from twitter_followers_patterns_mapreduce_spark.operators import graph as G
    from twitter_followers_patterns_mapreduce_spark.operators.graph_iter import (
        connected_components_twostar,
    )
    from twitter_followers_patterns_mapreduce_spark.session import get_spark
    from twitter_followers_patterns_mapreduce_spark.sources.synthetic import (
        register_synthetic_source,
    )

    spark = get_spark(
        app_name="scale-smoke",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    register_synthetic_source(spark)
    edges = (
        spark.read.format("synthetic_edges")
        .option("n_nodes", n_nodes)
        .option("out_degree", out_degree)
        .option("n_partitions", 32)
        .load()
    )
    n_edges = edges.count()

    out: dict[str, float | int] = {"n_nodes": n_nodes, "n_edges": n_edges}
    max_limit = n_nodes  # unfiltered: the whole graph participates

    def run(name, df_fn, scalar=True):
        t0 = time.time()
        df = df_fn()
        if scalar:
            out[f"{name}_result"] = df.collect()[0][0]
        else:
            out[f"{name}_rows"] = df.count()
        out[name] = round(time.time() - t0, 2)

    run("ce_count", lambda: G.count_edges(edges, max_limit))
    run("ex_two_hop", lambda: G.two_hop_count_exact(edges, max_limit))
    run("ex_three_hop", lambda: G.three_hop_count_exact(edges, max_limit))
    run("rj_triangle", lambda: G.triangle_count_raw(edges, max_limit, "broadcast"))
    run("rs_triangle", lambda: G.triangle_count_raw(edges, max_limit, "shuffle"))
    run("degrees", lambda: G.degrees(edges), scalar=False)
    run("components_twostar", lambda: connected_components_twostar(edges), scalar=False)
    # the Σ deg² expanders, unguarded: ~n·d² candidate rows collapse into
    # their hash aggregates (recommendations/overlap/reach never carry
    # the raw path set past the join)
    run("follow_recs", lambda: G.follow_recommendations(edges, max_limit, k=5), scalar=False)
    run("audience_overlap", lambda: G.audience_overlap_pairs(edges, max_limit, k=20), scalar=False)
    run("two_hop_reach", lambda: G.two_hop_reach(edges, max_limit, k=20), scalar=False)

    from twitter_followers_patterns_mapreduce_spark.operators.graph_iter import (
        hits,
        label_propagation,
        random_walks,
    )

    run("hits", lambda: hits(edges, iters=3), scalar=False)
    run("label_propagation", lambda: label_propagation(edges, rounds=4), scalar=False)
    run("random_walks", lambda: random_walks(edges, walks_per_node=2, length=3), scalar=False)

    # text/dedup families on a 10× replicated corpus: each copy gets a
    # disjoint doc_id range and a per-copy suffix token so exact dedup
    # stays meaningful (copies are near-dups, not byte-dups)
    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        exact_dup_groups,
        minhash_lsh_pairs,
    )
    from twitter_followers_patterns_mapreduce_spark.operators.text import doc_token_stats
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    big = (
        docs.crossJoin(spark.range(10).select(F.col("id").alias("_copy")))
        .select(
            (F.col("doc_id") * 10 + F.col("_copy")).alias("doc_id"),
            F.concat_ws(" ", "text", F.concat(F.lit("copytag"), F.col("_copy"))).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .localCheckpoint(eager=False)
    )
    out["n_docs_10x"] = big.count()
    run("token_stats_10x", lambda: doc_token_stats(big), scalar=False)
    run("dedup_exact_10x", lambda: exact_dup_groups(big), scalar=False)
    run("minhash_lsh_10x", lambda: minhash_lsh_pairs(big, threshold=0.5), scalar=False)

    from twitter_followers_patterns_mapreduce_spark.operators.corpus import (
        bpe_pair_counts,
        pack_sequences,
    )

    run("pack_sequences_10x", lambda: pack_sequences(big, seq_len=256), scalar=False)
    run("bpe_pairs_10x", lambda: bpe_pair_counts(big, k=50), scalar=False)

    # round-3 iterative graph additions on the full synthetic graph:
    # truss support passes are triangle-count-shaped per round; landmark
    # BFS state is |landmarks|x|reached|
    from twitter_followers_patterns_mapreduce_spark.operators.graph_iter import (
        k_truss,
        landmark_closeness,
    )

    run("ktruss_r2", lambda: k_truss(edges, k=4, rounds=2), scalar=False)
    run(
        "landmark_closeness",
        lambda: landmark_closeness(edges, mod=max(1, n_nodes // 20), max_depth=3),
        scalar=False,
    )

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    sys.exit(main())
