"""Query registry — the engine's named-query surface.

The reference selects a "query" by editing ``job.name`` in the Makefile
and recompiling (``Makefile:8-9``, ``README.md:87``); constants like the
MAX filter are compile-time edits.  Here every query is a named entry
taking ``(spark, sf_dir)`` with parameters as plain Python arguments,
and (where ANSI-SQL-expressible) a DuckDB oracle string for the
correctness harness.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL; None → driver does rows-only check
    description: str = ""
    module: str = ""  # short plans-module name, the category key for ordering


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, description: str = ""):
    """Decorator adding a query to the global registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        module = fn.__module__.rsplit(".", 1)[-1]
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, description=description, module=module
        )
        return fn

    return deco


#: Every module that registers queries.  Imports are unconditional: a
#: missing or broken plans module must fail loudly here, never silently
#: shrink the query surface (a blanket ``except ImportError: pass`` once
#: hid six unbuilt modules and ~930 LoC of unverified operators).
_PLAN_MODULES = (
    "twitter_followers_patterns_mapreduce_spark.plans.core_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.relational_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.text_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.dedup_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.similarity_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.event_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.multimodal_queries",
)


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    for mod in _PLAN_MODULES:
        __import__(mod)


#: Reference-parity queries (SURVEY.md §2.9 jobs + their direct variants).
#: Always verified first, every round — these are the engine's contract
#: with the reference and must never rotate out of the driver's
#: correctness budget.
CORE_PARITY = (
    "ce_count_edges",
    "ce_count_edges_max",
    "degrees",
    "ex_two_hop_count",
    "ap_two_hop_count",
    "ap_two_hop_paths",
    "rs_two_hop_paths_noloop",
    "rs_triangle_count_raw",
    "rj_triangle_count_raw",
    "triangle_count",
    "rank_by_degree",
    "mutual_follow_pairs",
    "ex_three_hop_count",
)


#: HISTORICAL tie-break list: the 51 queries that had zero driver-green
#: evidence entering round 4 (VERDICT.md r3 §"Next round" item 1; all
#: 51 went green in CORRECTNESS_r04).  Kept only to order the
#: never-green tier — members of this list sort ahead of younger
#: unverified queries, because the oldest unverified claims are the
#: riskiest; once a query is green the list has no effect on it.
FRESH_BACKLOG = (
    "graph_bfs_distances", "q12_priority_counts", "doc_kanonymity_audit",
    "dedup_ngram_jaccard", "embedding_top_pairs_lsh", "events_asof_purchase_click",
    "graph_ktruss", "q14_promo_revenue", "doc_token_surprisal",
    "dedup_neardup_clusters", "embedding_label_pca", "events_range_attribution",
    "graph_landmark_closeness", "q16_supplier_part_counts", "corpus_pack_sequences",
    "dedup_incremental", "embedding_kmeans", "events_sketch_summary",
    "triangle_count_oriented", "q19_disjunctive_revenue", "corpus_bpe_pair_counts",
    "dedup_semantic", "ann_topk_ivf_kmeans", "events_type_pivot",
    "triangle_count_sampled", "q22_idle_rich_customers", "corpus_token_budget",
    "embedding_quantize_stats", "events_typed_json", "graph_pagerank_personalized",
    "customers_lost_yoy", "doc_lang_confusion", "ann_topk_pq",
    "events_salted_user_count", "customer_balance_ntiles", "doc_curation_funnel",
    "events_session_window", "orders_grouping_sets", "events_type_streaks",
    "orders_extremes_by_priority", "events_funnel_conversion", "nation_revenue_pareto",
    "events_gapfill_hourly", "brand_affinity_pairs", "events_value_moving_1h",
    "events_variant_deciles", "events_tumbling_hourly_streamed", "events_hourly_anomaly",
    "events_retention_cohorts", "events_type_transitions", "events_temporal_two_hop",
)


def _last_green_round() -> dict[str, int]:
    """Name → highest round number whose CORRECTNESS_r*.json shows it
    hash-matched.

    The driver verifies a bounded prefix of ``queries()`` per round
    (r02 checked exactly the first 50 registered names and stopped
    mid-module).  Ordering never-yet-verified queries ahead of
    already-green ones makes the *union* of per-round correctness
    files converge to full coverage; ordering the green ones
    STALEST-FIRST makes every query cycle back into the verified
    prefix every few rounds, so a regression in a once-green query
    cannot hide behind an old green row forever.
    """
    last: dict[str, int] = {}
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_root = os.path.dirname(pkg_dir)
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match") and row.get("rows_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _ordered_names() -> list[str]:
    """Registry names in verification-priority order.

    1. Never-yet-green queries, round-robin across plan modules (so a
       budget cut at any depth still touches every category).  These
       lead even ahead of ``CORE_PARITY``: a query with ZERO driver
       evidence is strictly riskier than a core query green in every
       prior round, and the driver's per-round budget (50) is smaller
       than the fresh backlog — spending 13 slots re-proving r1-r3
       greens would leave fresh queries unverified for extra rounds.
    2. ``CORE_PARITY`` — the reference-contract queries; once the
       fresh backlog drains below the budget these are re-verified
       every round again.
    3. Previously-green queries, stalest round first (then the same
       round-robin within a staleness tier) — every query re-enters
       the driver's bounded prefix within a few rounds, so a
       regression in a once-green query gets re-caught.
    """
    last_green = _last_green_round()
    pinned = [n for n in CORE_PARITY if n in _REGISTRY and n in last_green]
    # A core-parity query with no green evidence yet sorts with `fresh`.
    rest = [n for n in _REGISTRY if n not in set(pinned)]

    def round_robin(names: list[str]) -> list[str]:
        pools: dict[str, list[str]] = {}
        for n in names:  # registration order within each module
            pools.setdefault(_REGISTRY[n].module, []).append(n)
        out: list[str] = []
        queues = list(pools.values())
        while queues:
            next_queues = []
            for q in queues:
                out.append(q.pop(0))
                if q:
                    next_queues.append(q)
            queues = next_queues
        return out

    fresh_all = [n for n in rest if n not in last_green]
    backlog = set(FRESH_BACKLOG)
    fresh = round_robin([n for n in fresh_all if n in backlog]) + round_robin(
        [n for n in fresh_all if n not in backlog]
    )
    seen_by_staleness: dict[int, list[str]] = {}
    for n in rest:
        if n in last_green:
            seen_by_staleness.setdefault(last_green[n], []).append(n)
    seen: list[str] = []
    for rnd in sorted(seen_by_staleness):  # oldest green evidence first
        seen.extend(round_robin(seen_by_staleness[rnd]))
    return fresh + pinned + seen


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: _REGISTRY[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: _REGISTRY[name].oracle
        for name in _ordered_names()
        if _REGISTRY[name].oracle is not None
    }


def get_spec(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]
