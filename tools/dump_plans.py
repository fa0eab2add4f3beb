"""Regenerate EXPLAINS.md: the formatted physical plan of every headline
query at sf0.01, as reviewable evidence of the scale properties the
engine claims (pushdown, pruning, join strategies, no stray cartesians).

    PYTHONPATH=/root/repo python tools/dump_plans.py
"""

from __future__ import annotations

import io
import sys

from pyspark.sql import DataFrame


HEADLINE = [
    "ce_count_edges",
    "ex_two_hop_count",
    "rs_triangle_count_raw",
    "rj_triangle_count_raw",
    "rank_by_degree",
    "q1_pricing_summary",
    "top_customers_by_revenue",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "events_sessionize",
    "events_asof_purchase_click",
    "events_range_attribution",
    "orders_price_quantiles",
    "lineitem_price_histogram",
    "mm_image_byte_stats",
    "curate_documents",
    "doc_vocabulary",
    "doc_tfidf_topk",
    "doc_chunks",
    "corpus_training_set",
    "ex_three_hop_count",
    "graph_components_twostar",
    "embedding_kmeans",
    "graph_kcore",
    "graph_clustering_coefficient",
    "doc_contamination_check",
    "doc_mixture_sample",
    "q5_local_supplier_volume",
    "orders_cdc_merge",
    "degrees_incremental",
    "orders_quality_checks",
    "embedding_quantize_stats",
    "events_session_window",
    "events_type_streaks",
    "events_funnel_conversion",
    "dedup_semantic",
    "doc_token_surprisal",
    "q3_shipping_priority",
    "q10_returned_items",
    "follow_recommendations",
    "audience_overlap_pairs",
    "two_hop_reach",
    "q18_large_volume_customers",
    "corpus_pack_sequences",
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q14_promo_revenue",
    "q16_supplier_part_counts",
    "q19_disjunctive_revenue",
    "q22_idle_rich_customers",
    "customers_lost_yoy",
    "customer_balance_ntiles",
    "orders_grouping_sets",
    "events_gapfill_hourly",
    "graph_ktruss",
    "ann_topk_pq",
    "corpus_bpe_pair_counts",
    "events_value_moving_1h",
    "events_variant_deciles",
    "graph_landmark_closeness",
    "triangle_count_oriented",
    "orders_extremes_by_priority",
    "corpus_token_budget",
    "events_hourly_anomaly",
    "events_retention_cohorts",
    "nation_revenue_pareto",
    "doc_lang_confusion",
    "brand_affinity_pairs",
    "events_type_transitions",
    "doc_curation_funnel",
    "events_temporal_two_hop",
    "graph_pagerank_personalized",
    "ce_count_edges_csv",
    "graph_kcore_k16",
    "graph_ktruss_k5",
    "events_sketch_summary",
    "doc_token_stats",
    "ann_recall_at_k",
    "corpus_domain_mixture",
    "corpus_export_shards",
    "events_value_mad",
    "link_prediction_scores",
    "graph_label_propagation",
    "graph_hits",
    "fuzzy_match_fastss",
    "doc_duplicated_span_fraction",
    "graph_random_walks",
    "embedding_logreg_fit",
    "embedding_logreg_score",
    "doc_weighted_sample",
    "embedding_logreg_eval",
    "mm_image_byte_stats_arrow",
    "orders_scd2_history",
    "orders_scd2_asof",
    "orders_scd2_deletes",
    "dedup_jaccard_prefix",
    "doc_exact_substring_strip",
    "doc_bm25_topk",
    "doc_bigram_surprisal",
    "graph_mutual_reach_k3",
    "corpus_bpe_encode_stats",
    "doc_ldiversity_audit",
    "events_heavy_hitters",
    "lineitem_exact_median",
    "bipartite_butterfly_count",
    "dedup_lsh_recall",
    "graph_square_count",
    "graph_diamond_count",
    "lineitem_exact_quantiles_refine",
    "graph_scc",
    "graph_reach_profile",
    "lineitem_corr_matrix",
    "orders_chi2_status_priority",
    "events_segment_entropy_kl",
    "ann_radius_search",
    "ann_mmr_topk",
    "doc_zipf_fit",
    "copurchase_part_pairs",
    "events_user_ltv_decay",
    "graph_modularity",
    "documents_jsonl_roundtrip",
    "doc_pii_scan",
    "orders_target_encoding",
    "orders_price_position",
    "embedding_dim_stats",
    "corpus_quality_curriculum",
    "graph_reach_anf",
    "graph_coreness",
    "doc_gopher_quality",
    "orders_woe_iv",
    "events_ewma_hourly",
    "lineitem_higher_moments",
    "orders_psi_split",
    "corpus_temperature_mixture",
    "orders_snapshot_diff",
    "lineitem_benford_audit",
    "events_ab_test",
    "events_user_growth_accounting",
    "doc_readability",
    "orders_bootstrap_ci",
    "basket_association_rules",
    "events_funnel_timing",
    "part_discount_elasticity",
    # round 8
    "lineitem_kll_quantiles",
    "events_kll_value_merged",
    "events_theta_retention",
    "graph_coreness_k17",
    "graph_effective_diameter_anf",
    "join_cardinality_estimate",
    "join_skew_planner",
    "join_universe_sample",
    "customer_rfm_segments",
    "orders_monthly_ivm",
    "events_seasonal_baseline",
    "embedding_logreg_calibration",
    "doc_pmi_collocations",
    "events_cms_frequency",
    "events_multitouch_attribution",
    "events_cms_streamed",
    "orders_survival_km",
    "graph_sssp_weighted",
    "basket_frequent_triples",
    "events_concurrency_curve",
    "events_cusum_changepoints",
    "corpus_neyman_allocation",
    "events_markov_accuracy",
    "embedding_nearest_centroid",
    "embedding_jl_audit",
    "lineitem_trimmed_mean",
    "graph_hub_attack",
    "doc_heaps_law",
    "events_burstiness",
    # round 9
    "dedup_lsh_recall_sampled",
    "mm_image_decode",
    "join_key_overlap_theta",
    "layout_bucket_advisor",
    "layout_partition_advisor",
    "layout_zorder_benefit",
    "join_delta_ivm",
    "events_hourly_acf",
    "embedding_conformal_coverage",
    "graph_rich_club",
    "events_type_hour_mi",
    "doc_keyphrases",
    "events_bottomk_sample",
    "embedding_hard_negatives",
    "events_session_trigrams",
    "events_diff_in_diff",
    "customer_revenue_theil",
    "events_sliding_distinct_theta",
    "embedding_split_drift",
    "doc_split_vocab_kl",
    "embedding_uncertainty_sample",
    "embedding_hard_negatives_ivf",
]


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same as .explain("formatted")
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    from twitter_followers_patterns_mapreduce_spark.plans.registry import all_queries, get_spec
    from twitter_followers_patterns_mapreduce_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark(app_name="dump_plans", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = all_queries()
    out = io.StringIO()
    out.write(
        "# EXPLAINS — physical plans of the headline queries (sf0.01)\n\n"
        "Generated by `tools/dump_plans.py`; regenerate after plan-affecting\n"
        "changes.  Things to check in review: `PushedFilters`/`ReadSchema`\n"
        "on scans, `BroadcastHashJoin` vs `SortMergeJoin` placement, absence\n"
        "of `CartesianProduct` outside the documented brute-force baselines,\n"
        "partial aggregates before exchanges.\n"
    )
    for name in HEADLINE:
        plan = formatted_plan(qs[name](spark, sf_dir))
        out.write(f"\n## {name}\n\n> {get_spec(name).description}\n\n```\n{plan}\n```\n")
    with open("EXPLAINS.md", "w") as f:
        f.write(out.getvalue())
    print(f"wrote EXPLAINS.md ({len(HEADLINE)} plans)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
