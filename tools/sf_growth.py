"""Measured growth: run a curated query set at two sf dirs in one
session and print per-query seconds + growth factors — the evidence
behind SCALE.md §"Measured growth behavior".

    PYTHONPATH=/root/repo python tools/sf_growth.py [dir_small] [dir_big] [query ...]

Defaults: /root/testdata/sf0.1 vs .cache/sf1 (generate with
tools/gen_sf.py), headline + iterative + LLM-pipeline representatives.
Each query runs twice per dir (min reported — first run pays codegen)
through a noop sink (full plan execution, no driver fetch).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Curated set: the 15 headline queries + iterative graph family +
#: one representative per LLM-pipeline family (dedup/similarity/text/
#: events/relational).  Graph queries on the modulus-997 edge view
#: saturate near sf0.1 (the node universe is fixed), so synthetic-graph
#: growth lives in tools/scale_smoke.py; they are still included here
#: because their INPUT (lineitem scan + DISTINCT) does grow 10x.
DEFAULT_QUERIES = [
    "ce_count_edges", "ex_two_hop_count", "ap_two_hop_count",
    "rs_triangle_count_raw", "rj_triangle_count_raw", "triangle_count",
    "rank_by_degree", "q1_pricing_summary", "top_customers_by_revenue",
    "doc_token_stats", "doc_language_id", "dedup_exact", "dedup_minhash_lsh",
    "ann_topk_bruteforce", "events_tumbling_hourly",
    "graph_components", "graph_components_twostar", "graph_pagerank",
    "graph_kcore", "graph_bfs_distances",
    "dedup_simhash_pairs", "dedup_semantic", "doc_contamination_check",
    "corpus_training_set", "embedding_kmeans", "embedding_top_pairs_blocked",
    "events_sessionization", "events_retention_cohorts",
    "nation_revenue_rollup", "q3_shipping_priority",
]


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".cache", "sf1")
    only = sys.argv[3:] or DEFAULT_QUERIES

    from twitter_followers_patterns_mapreduce_spark.plans.registry import all_queries
    from twitter_followers_patterns_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="sf_growth", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = all_queries()
    names = [n for n in only if n in qs]
    missing = [n for n in only if n not in qs]
    if missing:
        print(f"sf_growth: unknown queries skipped: {missing}", file=sys.stderr)

    def timed(name: str, sf_dir: str) -> float:
        runs = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 3))
        return min(runs)

    out: dict[str, dict[str, float]] = {}
    for name in names:
        a = timed(name, small)
        b = timed(name, big)
        out[name] = {"small": a, "big": b, "growth": round(b / a, 2) if a > 0 else -1}
        print(f"  {name:34s} {a:7.2f}s -> {b:7.2f}s  ({out[name]['growth']}x)", flush=True)

    print(json.dumps({"small_dir": small, "big_dir": big, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
