"""SQL dialect-portability surface: the engine's DuckDB oracle texts
that are plain ANSI SQL must run VERBATIM through ``spark.sql`` and
reproduce the DataFrame plans' results bit-for-bit (same normalize as
the oracle gate).

This is the "a user of the reference could switch" claim at the SQL
level: 67 of the registry's oracle strings are engine-portable — one
query text, three engines (DuckDB, Spark SQL, and the DataFrame API) —
pinned here so a dialect regression (a DuckDB-ism creeping into an
ANSI oracle, or a Spark-incompatible rewrite) fails loudly.

The rest of the registry's oracles are EXPECTEDLY dialect-specific:
DuckDB list/lambda functions (``list_filter``, ``unnest``,
``string_split``), DuckDB-only aggregates (``quantile_cont``, ``mad``),
``json_extract_string``, recursive CTEs with ``UNION`` (Spark supports
only ``UNION ALL`` in recursion as of 4.1), and the two engines'
different 64-bit hash builtins — those queries keep their parity
guarantee through the DuckDB oracle gate instead.
"""

from __future__ import annotations

import math

import pytest

from twitter_followers_patterns_mapreduce_spark.plans.registry import all_oracles, all_queries
from twitter_followers_patterns_mapreduce_spark.sources.readers import TABLES

SF = "/root/testdata/sf0.001"

#: oracle texts proven to run verbatim on Spark SQL AND match the
#: DataFrame plan (probed round 5; keep sorted)
PORTABLE = [
    "ap_two_hop_count",
    "ap_two_hop_paths",
    "audience_overlap_pairs",
    "brand_affinity_pairs",
    "ce_count_edges",
    "ce_count_edges_csv",
    "ce_count_edges_max",
    "customer_balance_ntiles",
    "customers_lost_yoy",
    "dedup_exact",
    "degree_assortativity",
    "degree_distribution",
    "degrees",
    "degrees_incremental",
    "event_graph_degrees",
    "events_heavy_hitters",
    "events_salted_user_count",
    "events_type_pivot",
    "events_type_streaks",
    "events_type_transitions",
    "ex_three_hop_count",
    "ex_two_hop_count",
    "follow_recommendations",
    "fuzzy_match_fastss",
    "graph_clustering_coefficient",
    "join_cardinality_estimate",
    "join_skew_planner",
    "graph_hits",
    "graph_kcore",
    "graph_kcore_k16",
    "graph_ktruss",
    "graph_ktruss_k5",
    "graph_label_propagation",
    "graph_mutual_reach_k3",
    "graph_pagerank",
    "graph_pagerank_personalized",
    "lineitem_column_profile",
    "lineitem_price_histogram",
    "link_prediction_scores",
    "mutual_follow_pairs",
    "nation_revenue_pareto",
    "nation_revenue_rollup",
    "orders_cdc_merge",
    "orders_grouping_sets",
    "orders_priority_year_cube",
    "q11_important_parts",
    "q12_priority_counts",
    "q13_customer_distribution",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_promo_suppliers",
    "q2_min_cost_supplier",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "rank_by_degree",
    "reciprocity_summary",
    "repeat_customers_yoy",
    "rj_triangle_count_raw",
    "rs_triangle_count_raw",
    "rs_two_hop_paths_noloop",
    "supplier_part_coverage",
    "top_customers_by_revenue",
    "two_hop_reach",
]


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else f"{v:.10g}"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


@pytest.fixture(scope="module")
def sql_views(spark):
    for t in TABLES:
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    return spark


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_verbatim_on_spark(sql_views, name):
    spark = sql_views
    qs, oracles = all_queries(), all_oracles()
    sdf = qs[name](spark, SF)
    odf = spark.sql(oracles[name])
    got = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    want = _normalize([tuple(r) for r in odf.collect()], odf.columns)
    assert got == want
