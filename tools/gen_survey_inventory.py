"""Regenerate SURVEY.md §2.10 — the registry-derived query inventory.

    PYTHONPATH=/root/repo python tools/gen_survey_inventory.py

Idempotent: replaces the existing §2.10 block in place.  Keeping the
inventory generated (not hand-written) means the coverage table can
never drift from what `queries()` actually exposes.
"""

from __future__ import annotations

import re

from twitter_followers_patterns_mapreduce_spark.plans.registry import _REGISTRY, _load_all

GROUPS = [
    "Core graph (reference parity)",
    "Relational / TPC-H-style",
    "Text & corpus prep",
    "Dedup",
    "Similarity / embeddings",
    "Events / temporal / streaming-batch",
    "Multimodal",
    "Iterative graph",
    "Stats / profiling / layout",
]


def bucket(n: str) -> str:
    if n.startswith(("ce_", "ex_", "ap_", "rs_", "rj_")) or n in (
        "degrees", "triangle_count", "rank_by_degree", "mutual_follow_pairs",
        "follow_recommendations", "degree_distribution", "reciprocity_summary",
        "audience_overlap_pairs", "two_hop_reach",
    ):
        return GROUPS[0]
    if n.startswith((
        "q1_", "orders_", "nation_", "supplier_", "customer", "customers_",
        "top_customers", "repeat_", "lineitem_",
    )):
        return GROUPS[1]
    if n.startswith(("doc_", "chunk_")) or n == "curate_documents":
        return GROUPS[2]
    if n.startswith("dedup_"):
        return GROUPS[3]
    if n.startswith(("ann_", "embedding_")):
        return GROUPS[4]
    if n.startswith(("events_", "event_")):
        return GROUPS[5]
    if n.startswith("mm_"):
        return GROUPS[6]
    if n.startswith("graph_"):
        return GROUPS[7]
    return GROUPS[8]


def main() -> None:
    _load_all()
    groups: dict[str, list] = {g: [] for g in GROUPS}
    for n, spec in sorted(_REGISTRY.items()):
        groups[bucket(n)].append((n, spec))
    lines = [
        "",
        "### 2.10 Engine query inventory (generated from the registry)",
        "",
        "Every registered query; `oracle` = full Spark-vs-DuckDB rows+schema+hash",
        "check per round, `rows-only` = non-SQL-expressible (driver's weaker check).",
        "",
    ]
    for g in GROUPS:
        items = groups[g]
        if not items:
            continue
        lines += [f"**{g}** ({len(items)})", "", "| query | check | what it computes |", "|---|---|---|"]
        for n, spec in items:
            ok = "oracle" if spec.oracle else "rows-only"
            lines.append(f"| `{n}` | {ok} | {spec.description} |")
        lines.append("")
    table = "\n".join(lines)
    s = open("SURVEY.md").read()
    marker = "\n---\n\n## 3. Query lifecycle"
    assert marker in s, "SURVEY.md anchor not found"
    s = re.sub(
        r"\n### 2\.10 Engine query inventory.*?(?=\n---\n\n## 3\. Query lifecycle)",
        "",
        s,
        flags=re.S,
    )
    s = s.replace(marker, "\n" + table + "\n" + marker)
    open("SURVEY.md", "w").write(s)
    print(f"SURVEY.md §2.10 regenerated: {len(_REGISTRY)} queries")


if __name__ == "__main__":
    main()
