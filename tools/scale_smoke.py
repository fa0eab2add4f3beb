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

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    sys.exit(main())
