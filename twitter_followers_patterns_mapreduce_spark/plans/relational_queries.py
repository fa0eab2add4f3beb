"""Named relational queries over the TPC-H-ish harness tables.

The reference's only relation is the edge list (SURVEY.md §1.1); this
module is the engine's general batch-analytics surface — joins
(inner/outer/anti/broadcast), hash aggregation, rollup, top-k — each
registered with its DuckDB oracle from ``operators/relational.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col as F_col

from twitter_followers_patterns_mapreduce_spark.operators import relational as R
from twitter_followers_patterns_mapreduce_spark.plans.registry import register
from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table


@register(
    "q1_pricing_summary",
    oracle=R.q1_oracle(),
    description="TPC-H Q1 shape: scan-heavy groupBy, 8 aggregates, filter pushed to parquet scan",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q1_pricing_summary(load_table(spark, sf_dir, "lineitem"))


@register(
    "top_customers_by_revenue",
    oracle=R.top_customers_oracle(k=10),
    description="3-way join (fact shuffle + dim broadcast) → agg → TakeOrdered top-k",
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.top_customers_by_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        k=10,
    )


@register(
    "customers_without_orders",
    oracle=R.CUSTOMERS_WITHOUT_ORDERS_1995_ORACLE,
    description="left-anti join (NOT EXISTS) against 1995 orders — join-type "
    "coverage beyond the reference; the year bound makes the anti-join BIND on "
    "the synthetic data (every customer has some order, so the unfiltered form "
    "is a vacuous 0-row check)",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    orders_1995 = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return R.customers_without_orders(load_table(spark, sf_dir, "customer"), orders_1995)


@register(
    "nation_revenue_rollup",
    oracle=R.NATION_ROLLUP_ORACLE,
    description="ROLLUP(region, nation) revenue — grouping sets over a broadcast dim chain",
)
def nation_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.nation_revenue_rollup(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "orders_monthly_priority",
    oracle=R.ORDERS_MONTHLY_ORACLE,
    description="per-month × priority counts + COUNT(DISTINCT) — distinct-agg coverage",
)
def orders_monthly_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.orders_monthly_priority(load_table(spark, sf_dir, "orders"))


@register(
    "repeat_customers_yoy",
    oracle=R.repeat_customers_yoy_oracle(),
    description="INTERSECT/EXCEPT cohorts: customers retained vs churned across years",
)
def repeat_customers_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.repeat_customers_yoy(load_table(spark, sf_dir, "orders"))


@register(
    "supplier_part_coverage",
    oracle=R.SUPPLIER_COVERAGE_ORACLE,
    description="left-outer join keeping zero-lineitem suppliers — outer-join coverage",
)
def supplier_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.supplier_part_coverage(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
    )


# ---------------------------------------------------------------------------
# Distribution statistics (operators/stats.py)

from twitter_followers_patterns_mapreduce_spark.operators import stats as ST  # noqa: E402


@register(
    "orders_price_quantiles",
    oracle=ST.group_quantiles_oracle("orders", "o_orderpriority", "o_totalprice"),
    description="exact per-priority p50/p90/p99 of order value — Spark percentile == "
    "DuckDB quantile_cont (type-7 interpolation), verified bit-identical",
)
def orders_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.group_quantiles(
        load_table(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice"
    )


@register(
    "lineitem_price_histogram",
    oracle=ST.fixed_width_histogram_oracle("lineitem", "l_extendedprice"),
    description="equi-width price histogram: scan-side floor-div bucket + one hash agg, "
    "whole-stage codegen end-to-end",
)
def lineitem_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.fixed_width_histogram(load_table(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "orders_priority_year_cube",
    oracle=R.ORDERS_CUBE_ORACLE,
    description="CUBE over (priority, year): all grouping sets in one shuffle, "
    "NULL keys as ANSI subtotal markers",
)
def orders_priority_year_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.orders_priority_year_cube(load_table(spark, sf_dir, "orders"))


@register(
    "customer_running_revenue",
    oracle=R.customer_running_revenue_oracle(k=200),
    description="partitioned cumulative + 3-month sliding window frames per customer "
    "(exact decimal sums; never a global window)",
)
def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customer_running_revenue(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer"), k=200
    )


#: columns profiled by the lineitem ANALYZE query (name, kind)
_PROFILE_COLS = [
    ("l_orderkey", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_shipdate", "num"),
    ("l_returnflag", "str"),
]


@register(
    "lineitem_column_profile",
    oracle=ST.column_profile_oracle("lineitem", [(c, k) for c, k in _PROFILE_COLS if c != "l_shipdate"]),
    description="ANALYZE-style column profiler: one narrow row per column with "
    "count/nulls/ndv/min/max from partial-aggregated scans",
)
def lineitem_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = [(c, k) for c, k in _PROFILE_COLS if c != "l_shipdate"]
    return ST.column_profile(load_table(spark, sf_dir, "lineitem"), cols)


from twitter_followers_patterns_mapreduce_spark.operators import cdc as CDC  # noqa: E402


@register(
    "orders_cdc_merge",
    oracle=CDC.ORDERS_CDC_MERGE_ORACLE,
    description="MERGE-style CDC apply (upsert + delete + insert) as one full-outer "
    "equi-join + conditional projection — the delta broadcasts, the base never "
    "rewrites untouched rows; vanilla-Spark stand-in for table-format MERGE INTO",
)
def orders_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CDC.orders_cdc_merge(load_table(spark, sf_dir, "orders"))


@register(
    "orders_snapshot_diff",
    oracle=CDC.ORDERS_SNAPSHOT_DIFF_ORACLE,
    description="table-version diff (data-diff promotion audit): classify every key "
    "added/removed/changed/unchanged between the base snapshot and its CDC-merged "
    "successor via scan-side payload hashes + one full-outer key join; min/max keys "
    "bind each class to content — must recover exactly the delta's change classes",
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CDC.orders_snapshot_diff(load_table(spark, sf_dir, "orders"))


@register(
    "q5_local_supplier_volume",
    oracle=R.q5_oracle(region_name="ASIA", year=1996),
    description="TPC-H Q5 shape: 6-way join chain with the local-supplier equi-conjunct "
    "— Catalyst broadcast-collapses the dim chain; only orders⋈lineitem shuffles",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q5_local_supplier_volume(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


from twitter_followers_patterns_mapreduce_spark.operators import constraints as CK  # noqa: E402


@register(
    "orders_quality_checks",
    oracle=CK.orders_quality_checks_oracle(),
    description="deequ-style declared-constraint gate: N constraints in ONE "
    "conditional-aggregate scan (+ broadcast anti-join referential check), one "
    "narrow alert-routable row per constraint",
)
def orders_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CK.orders_quality_checks(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


@register(
    "q3_shipping_priority",
    oracle=R.q3_oracle(),
    description="TPC-H Q3 shape: segment-filtered customer broadcast prunes orders "
    "before the fact shuffle, decimal-reduced revenue, TakeOrdered top-k",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q3_shipping_priority(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


@register(
    "q10_returned_items",
    oracle=R.q10_oracle(),
    description="TPC-H Q10 shape: returned-item revenue per customer over a date "
    "window — flag predicate pushed to the lineitem scan, dims broadcast, "
    "decimal-reduced revenue, TakeOrdered top-k",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q10_returned_items(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "q18_large_volume_customers",
    oracle=R.q18_oracle(min_quantity=250, k=100),
    description="TPC-H Q18 shape: HAVING-filtered per-order aggregate drives "
    "broadcast semi-pattern joins back to orders/customer; decimal-exact "
    "quantities, TakeOrdered top-k",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q18_large_volume_customers(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


# ---------------------------------------------------------------------------
# Round-3 TPC-H shape coverage
# ---------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    oracle=R.q2_oracle(),
    description="TPC-H Q2 shape: correlated min-per-part scalar subquery, decorrelated "
    "to agg + join-back (co-partitioned on the join key); oracle keeps the correlated "
    "spelling so both forms check each other",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q2_min_cost_supplier(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "q7_nation_volume",
    oracle=R.q7_oracle(),
    description="TPC-H Q7 shape: symmetric nation-pair volume via dual dimension "
    "chains — nation+supplier broadcast, customer stays a shuffle join (large dim)",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q7_nation_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "q12_priority_counts",
    oracle=R.q12_oracle(),
    description="TPC-H Q12 shape: year-filtered join then CASE conditional counts "
    "per linestatus",
)
def q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q12_priority_counts(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "q14_promo_revenue",
    oracle=R.q14_oracle(),
    description="TPC-H Q14 shape: conditional-ratio aggregate (promo revenue share) "
    "over a broadcast part join, one output row, exact decimal reduction",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q14_promo_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "q16_supplier_part_counts",
    oracle=R.q16_oracle(),
    description="TPC-H Q16 shape: COUNT(DISTINCT supplier) per part-attribute group "
    "with broadcast anti-join supplier exclusion; deterministic top-k",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q16_supplier_part_counts(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "q19_disjunctive_revenue",
    oracle=R.q19_oracle(),
    description="TPC-H Q19 shape: OR-of-conjunct-groups predicate — equi-conjunct "
    "extracted so the join stays hash; branch filters pushed into the part scan",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q19_disjunctive_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "q22_idle_rich_customers",
    oracle=R.q22_oracle(),
    description="TPC-H Q22 shape: broadcast scalar-subquery threshold + anti-join "
    "against recent orders, per-nation rollup; bit-deterministic threshold",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q22_idle_rich_customers(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "customers_lost_yoy",
    oracle=R.customers_lost_yoy_oracle(),
    description="EXCEPT set-op: customers active in 1995 but not 1996 (churn), "
    "per-nation counts — planned as distinct + left-anti join",
)
def customers_lost_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customers_lost_yoy(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


@register(
    "customer_balance_ntiles",
    oracle=R.customer_balance_ntiles_oracle(),
    description="partitioned NTILE deciles per nation (never a global window), "
    "total-order tie-break, exact per-decile decimal mass",
)
def customer_balance_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customer_balance_ntiles(load_table(spark, sf_dir, "customer"))


@register(
    "orders_grouping_sets",
    oracle=R.orders_grouping_sets_oracle(),
    description="GROUPING SETS ((priority),(year),()) via the Spark 4 DataFrame "
    "groupingSets API — one Expand + single hash agg, grouping() flags emitted",
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.orders_grouping_sets(load_table(spark, sf_dir, "orders"))


@register(
    "orders_extremes_by_priority",
    oracle=R.ORDERS_EXTREMES_ORACLE,
    description="arg-extreme aggregates (max_by/min_by vs arg_max/arg_min): witness "
    "orderkeys for the price extremes per priority — tie-proof via a fixed-width "
    "string total-order key, no self-join or window",
)
def orders_extremes_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.orders_extremes_by_priority(load_table(spark, sf_dir, "orders"))


@register(
    "nation_revenue_pareto",
    oracle=R.nation_revenue_pareto_oracle(),
    description="Pareto concentration: customers needed for 80% of each nation's "
    "revenue — partitioned cumulative decimal window, exact threshold comparisons",
)
def nation_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.nation_revenue_pareto(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


@register(
    "brand_affinity_pairs",
    oracle=R.brand_affinity_oracle(k=50),
    description="market-basket brand affinity: basket-keyed pair self-join over "
    "DISTINCT (order, brand) items — never order x order; exact-integer support, "
    "lift via zero-key broadcast N",
)
def brand_affinity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.brand_affinity_pairs(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


# --- round 4: the remaining TPC-H shapes (completes all 22) ----------------


@register(
    "q4_order_priority",
    oracle=R.q4_oracle(),
    description="TPC-H Q4 shape: correlated-EXISTS semi-join (non-equi conjunct) → priority counts",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q4_order_priority(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "q6_forecast_revenue",
    oracle=R.q6_oracle(),
    description="TPC-H Q6 shape: zero-join scan-filter-aggregate, all predicates pushed to parquet",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q6_forecast_revenue(load_table(spark, sf_dir, "lineitem"))


@register(
    "q8_market_share",
    oracle=R.q8_oracle(),
    description="TPC-H Q8 shape: 8-way join (one fact shuffle, 6 broadcast dims) → per-year share",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q8_market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "q9_product_type_profit",
    oracle=R.q9_oracle(),
    description="TPC-H Q9 shape: part-name LIKE filter, 5-way join → profit per nation × year",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q9_product_type_profit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "q11_important_parts",
    oracle=R.q11_oracle(),
    description="TPC-H Q11 shape: per-part value HAVING > frac × global scalar (exact DECIMAL)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q11_important_parts(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "q13_customer_distribution",
    oracle=R.q13_oracle(),
    description="TPC-H Q13 shape: filtered LEFT OUTER join → count-of-counts distribution",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q13_customer_distribution(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "q15_top_supplier",
    oracle=R.q15_oracle(),
    description="TPC-H Q15 shape: revenue view joined against its own MAX (exact-DECIMAL argmax)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q15_top_supplier(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "supplier")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=R.q17_oracle(),
    description="TPC-H Q17 shape: decorrelated per-part avg-quantity scalar subquery (exact compare)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q17_small_quantity_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "q20_promo_suppliers",
    oracle=R.q20_oracle(),
    description="TPC-H Q20 shape: nested semi-join chain via per-(supp,part) HAVING threshold",
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q20_promo_suppliers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
    )


@register(
    "q21_waiting_suppliers",
    oracle=R.q21_oracle(),
    description="TPC-H Q21 shape: EXISTS + NOT-EXISTS pair decorrelated to per-order distinct counts",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.q21_waiting_suppliers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "supplier"),
    )


@register(
    "orders_scd2_history",
    oracle=R.orders_scd2_oracle(),
    description="SCD type-2 history build (the CDC/merge-upsert pattern): a "
    "deterministic change feed folded into per-key half-open validity intervals "
    "via one key-partitioned lead() window — one shuffle on the business key; "
    "the engine-side semantics of MERGE INTO on a dimension table",
)
def orders_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.orders_scd2_history(load_table(spark, sf_dir, "orders"))


@register(
    "orders_scd2_asof",
    oracle=R.orders_scd2_asof_oracle(),
    description="point-in-time snapshot of the SCD2 dimension (time travel): "
    "per-key argmax version among feed rows effective by the as-of date — one "
    "max_by aggregate with map-side partials, no interval materialization, no "
    "per-key history window; snapshot == interval-filtered history pinned by "
    "differential test",
)
def orders_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.orders_scd2_asof(load_table(spark, sf_dir, "orders"))


@register(
    "orders_scd2_deletes",
    oracle=R.orders_scd2_deletes_oracle(),
    description="SCD2 fold over the full CDC alphabet (inserts, updates, DELETES): "
    "tombstones ride the same lead() window — closing the predecessor's interval at "
    "the delete date — and are filtered from the output, leaving deleted keys with a "
    "fully-closed history and no current row; zero extra joins vs the plain fold",
)
def orders_scd2_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.orders_scd2_deletes(load_table(spark, sf_dir, "orders"))


def _stage_scd2_feed(spark: SparkSession, sf_dir: str) -> tuple[str, str, str]:
    """Stage the deterministic change feed as one parquet file PER
    VERSION TIER (f0 = base rows, f1 = updates) in a per-sf_dir temp
    dir, so ``maxFilesPerTrigger=1`` replays it as two micro-batches.
    Returns (feed_dir, state_dir, checkpoint_dir); state + checkpoint
    are wiped so every invocation is a fresh deterministic replay."""
    import glob as _glob
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"spark_scd2_{tag}")
    feed_dir = os.path.join(root, "feed")
    state_dir = os.path.join(root, "state")
    ckpt_dir = os.path.join(root, "ckpt")
    for d in (state_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    if not os.path.exists(feed_dir):
        os.makedirs(feed_dir)
        feed = R._scd2_feed(load_table(spark, sf_dir, "orders"), mod=7, bump_days=30)
        for ver in (0, 1):
            tmp = os.path.join(root, f"stage_v{ver}")
            feed.where(F_col("version") == ver).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            (part,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
            os.rename(part, os.path.join(feed_dir, f"f{ver}.parquet"))
            shutil.rmtree(tmp)
    return feed_dir, state_dir, ckpt_dir


@register(
    "orders_scd2_streamed",
    oracle=R.orders_scd2_oracle(),
    description="incremental SCD2 maintenance under the oracle gate: the change feed "
    "replayed as micro-batches (base rows, then updates), each applied by a "
    "foreachBatch merge that re-folds ONLY affected keys' intervals against parquet "
    "state — the MERGE INTO ingest path; final state must hash-equal the one-shot "
    "batch fold (stream == batch == oracle); seventh streaming query class under the gate",
)
def orders_scd2_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming form of ``orders_scd2_history`` — see
    ``streaming/scd2.py`` for the merge semantics and scale shape."""
    from twitter_followers_patterns_mapreduce_spark.streaming.scd2 import (
        read_scd2_state,
        scd2_apply_stream,
        scd2_feed_stream,
    )

    feed_dir, state_dir, ckpt_dir = _stage_scd2_feed(spark, sf_dir)
    scd2_apply_stream(
        spark, scd2_feed_stream(spark, feed_dir), state_dir, ckpt_dir
    )
    return read_scd2_state(spark, state_dir)


@register(
    "lineitem_exact_median",
    oracle=ST.exact_median_refine_oracle("lineitem", "l_extendedprice"),
    description="exact global median WITHOUT a global sort: 3 histogram-refinement "
    "passes (1024-way fanout, range predicate pushed to the scan, integer-cent "
    "rank accounting), driver sees only the per-pass histogram — distributed "
    "selection vs sort-everything",
)
def lineitem_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.exact_median_refine(load_table(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "lineitem_exact_quantiles_refine",
    oracle=ST.exact_quantiles_refine_oracle("lineitem", "l_extendedprice"),
    description="exact p50/p90/p99 WITHOUT a global sort: per-rank histogram "
    "refinement chains over ONE shared checkpointed projection — the multi-rank "
    "generalization of the exact-median selector (type-1 quantiles, ceil(q*n))",
)
def lineitem_exact_quantiles_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.exact_quantiles_refine(load_table(spark, sf_dir, "lineitem"), "l_extendedprice")


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "lineitem_corr_matrix",
    oracle=ST.corr_matrix_oracle("lineitem", _CORR_COLS),
    description="pairwise Pearson correlation matrix over 4 numeric lineitem columns "
    "— one scan + ONE wide reduce of exact DECIMAL(38,0) second moments (order-"
    "independent, headroom to n~6e11), six closed-form doubles unstacked at the end",
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.corr_matrix(load_table(spark, sf_dir, "lineitem"), _CORR_COLS)


@register(
    "lineitem_ols_qty_price",
    oracle=ST.ols_fit_oracle("lineitem", "l_quantity", "l_extendedprice"),
    description="closed-form simple OLS l_extendedprice ~ l_quantity via the normal "
    "equations — slope/intercept/r2 from the same exact-moment machinery as the "
    "correlation matrix (one scan, one reduce, zero iterations)",
)
def lineitem_ols_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.ols_fit(load_table(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice")


@register(
    "orders_chi2_status_priority",
    oracle=ST.chi_square_oracle("orders", "o_orderstatus", "o_orderpriority"),
    description="Pearson chi-square independence test + Cramér's V between order "
    "status and priority — three margin hash aggs, broadcast margin cross (bounded "
    "by category cardinality), integer identity (obs·n - rc·cc)²/(n·rc·cc) per cell, "
    "1e-9-floored BIGINT term sum (exact, order-independent)",
)
def orders_chi2_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.chi_square(load_table(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority")


@register(
    "part_discount_elasticity",
    oracle=ST.grouped_ols_slopes_oracle(
        "lineitem JOIN part ON l_partkey = p_partkey",
        "p_brand",
        "l_discount",
        "l_quantity",
    ),
    description="per-brand discount elasticity: closed-form OLS slope + r2 of "
    "quantity on discount fitted for EVERY brand in one scan + one grouped "
    "exact-moment reduce (no iteration, no per-group loop) — ols_fit generalized "
    "to groups",
)
def part_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    joined = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
        "p_brand", "l_discount", "l_quantity"
    )
    return ST.grouped_ols_slopes(joined, "p_brand", "l_discount", "l_quantity")


@register(
    "orders_bootstrap_ci",
    oracle=ST.bootstrap_mean_ci_oracle("orders", "o_totalprice", key_col="o_orderkey"),
    description="deterministic Poisson-bootstrap 95% CI for the mean total price: "
    "per-(row, replica) weight = h64 ROW-IDENTITY hash (o_orderkey:value — duplicate "
    "values draw independently) through the Poisson(1) inverse CDF (one-pass "
    "streaming bootstrap, no resample shuffles, rerun/retry/oracle identical), "
    "32 exact integer replica aggregates, type-7 percentile bounds",
)
def orders_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.bootstrap_mean_ci(
        load_table(spark, sf_dir, "orders"), "o_totalprice", key_col="o_orderkey"
    )


@register(
    "lineitem_kll_quantiles",
    oracle=ST.kll_quantile_profile_oracle("lineitem", "l_extendedprice"),
    description="Datasketches KLL quantile-sketch profile of extended price vs exact "
    "percentile companions: the mergeable fixed-size one-pass quantile structure for "
    "100 TB; per-probe rank-error booleans (est within [exact(q-eps), exact(q+eps)]) "
    "asserted TRUE by the oracle, all exact quantiles from ONE percentile(array) agg "
    "sharing the sketch's single scan",
)
def lineitem_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.kll_quantile_profile(load_table(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "lineitem_benford_audit",
    oracle=ST.benford_profile_oracle("lineitem", "l_extendedprice"),
    description="Benford's-law first-digit audit of extended price (fabricated-data "
    "/ ETL-corruption screen): leading digit from the cents integer (engine-portable, "
    "scale-invariant), observed shares vs log10(1+1/d) with per-digit chi-square "
    "contributions over exact counts",
)
def lineitem_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.benford_profile(load_table(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "lineitem_higher_moments",
    oracle=ST.higher_moments_oracle("lineitem", "l_extendedprice"),
    description="skewness + excess kurtosis of extended price via exact scaled "
    "raw sums s1..s4 (square in LONG codegen, cube/quartic as two DECIMAL(38,0) "
    "products per row): one scan, one reduce, central-moment identities as "
    "closed-form doubles floored at 1e-6, zero-variance guarded",
)
def lineitem_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.higher_moments(load_table(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "orders_psi_split",
    oracle=ST.psi_profile_oracle(
        "orders",
        "CAST(floor(o_totalprice / 25000) AS BIGINT)",
        "o_orderkey % 2 = 0",
    ),
    description="population-stability-index drift profile between the even/odd "
    "orderkey halves over 25k price buckets — the model-monitoring score (per-"
    "bucket (p-q)*ln(p/q) terms over exact BIGINT counts, NULL where a side is "
    "empty instead of the epsilon hack); the population-vs-population twin of "
    "orders_woe_iv",
)
def orders_psi_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.psi_profile(
        load_table(spark, sf_dir, "orders"),
        "CAST(floor(o_totalprice / 25000) AS BIGINT)",
        "o_orderkey % 2 = 0",
    )


@register(
    "orders_woe_iv",
    oracle=ST.woe_iv_oracle("orders", "o_orderpriority", "o_orderstatus = 'F'"),
    description="weight-of-evidence / information-value of order priority against "
    "the finished-status label (Siddiqi scorecard encoding): exact BIGINT cell "
    "counts from one |categories|-row hash agg + broadcast totals cross, WoE and "
    "IV term as single closed-form doubles floored at 1e-6, NULL-guarded "
    "degenerate categories (cramers_v convention)",
)
def orders_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.woe_iv(
        load_table(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus = 'F'"
    )


@register(
    "copurchase_part_pairs",
    oracle=R.copurchase_part_pairs_oracle(k=20),
    description="item-item co-occurrence: top-20 part pairs bought in the same "
    "order — distinct (order, part), self-equi-join on the order key with p1<p2, "
    "hash agg, TakeOrdered; fan-out bounded by basket size",
)
def copurchase_part_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.copurchase_part_pairs(load_table(spark, sf_dir, "lineitem"), k=20)


@register(
    "basket_association_rules",
    oracle=R.basket_association_rules_oracle(k=20, min_pair=2),
    description="association rules over order baskets (Apriori readout on the "
    "copurchase counting primitive): support/confidence/lift from exact pair / "
    "item / total basket counts, min-support pruned, top-20 by lift via "
    "TakeOrdered",
)
def basket_association_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.basket_association_rules(load_table(spark, sf_dir, "lineitem"), k=20)


@register(
    "orders_target_encoding",
    oracle=R.target_encoding_oracle(),
    description="smoothed target (mean) encoding of order priority against order "
    "value — enc = (sum_c + m*global_mean)/(n_c + m) with exact DECIMAL cent sums "
    "and ONE closed-form double (never a pre-rounded intermediate mean); category "
    "agg + 1-row broadcast",
)
def orders_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.target_encoding(load_table(spark, sf_dir, "orders"))


@register(
    "orders_price_position",
    oracle=R.price_position_profile_oracle(),
    description="percent_rank + cume_dist within each priority class (window "
    "partitioned on the bounded key, never global), thinned to deterministic "
    "probe rows AFTER the window so output stays hashable at any sf",
)
def orders_price_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.price_position_profile(load_table(spark, sf_dir, "orders"))


@register(
    "orders_iqr_outliers",
    oracle=ST.iqr_outlier_profile_oracle("orders", "o_orderpriority", "o_totalprice"),
    description="per-priority Tukey-fence outlier profile (q1/q3 exact type-7 "
    "percentiles broadcast back onto the scan, fence comparisons pointwise "
    "bit-identical) — the robust anomaly screen of column profiling",
)
def orders_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.iqr_outlier_profile(load_table(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice")


@register(
    "customer_rfm_segments",
    oracle=R.CUSTOMER_RFM_ORACLE,
    description="RFM customer segmentation: per-customer aggregate (one fact-table "
    "pass) + three partitioned NTILE(4) windows on (segment, nation) — never a "
    "global sort; fixed literal recency anchor, no scalar cross",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customer_rfm_segments(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


@register(
    "orders_monthly_ivm",
    oracle=R.ORDERS_MONTHLY_IVM_ORACLE,
    description="aggregate-level incremental view maintenance: base + delta algebraic "
    "state (count/sum/min/max) merged by union→re-agg; the oracle recomputes the "
    "rollup in one pass — hash match proves merged state == full recompute",
)
def orders_monthly_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.orders_monthly_ivm(load_table(spark, sf_dir, "orders"))


@register(
    "join_delta_ivm",
    oracle=R.JOIN_DELTA_IVM_ORACLE,
    description="JOIN-level incremental view maintenance: the bilinear delta rule "
    "d(LxR) = dLxR0 + L0xdR + dLxdR maintains a monthly revenue view over "
    "lineitem x orders when both sides ingest new slices — four slice-joins "
    "produce mergeable count+decimal state, merged by union re-agg; the oracle "
    "recomputes the view directly from the full join",
)
def join_delta_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.join_delta_ivm(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


# ---- join planning & estimation (operators/planner.py) ------------------
from twitter_followers_patterns_mapreduce_spark.operators import planner as PL  # noqa: E402


@register(
    "join_cardinality_estimate",
    oracle=PL.join_cardinality_oracle("events", "orders", "user_id", "o_custkey"),
    description="exact join cardinality without the join: Σ c_L(k)·c_R(k) over "
    "full-outer-joined key-degree tables, plus the uniform-keys optimizer estimate "
    "and the skew ratio saying how wrong it is — one degree agg per side, spine is "
    "|keys| rows never |data| rows",
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_events

    return PL.join_cardinality_estimate(
        load_events(spark, sf_dir),
        load_table(spark, sf_dir, "orders"),
        "user_id",
        "o_custkey",
    )


@register(
    "join_skew_planner",
    oracle=PL.join_skew_planner_oracle(
        "events", "orders", "user_id", "o_custkey", target_rows_per_task=100, k=10
    ),
    description="hot-key skew diagnosis for a planned equi-join: top-10 keys by exact "
    "join-output contribution with per-key salt-factor prescription "
    "(ceil(out_rows/target)) — the measurement half of the salting playbook",
)
def join_skew_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_events

    # target_rows_per_task=100 so salt factors BIND at test sf (>1 for
    # hot keys); production would pass ~5e6
    return PL.join_skew_planner(
        load_events(spark, sf_dir),
        load_table(spark, sf_dir, "orders"),
        "user_id",
        "o_custkey",
        target_rows_per_task=100,
        k=10,
    )


@register(
    "join_universe_sample",
    oracle=PL.join_universe_sample_oracle(
        "events", "orders", "user_id", "o_custkey", pct=10, bound=0.15
    ),
    description="hash-universe sampled join-size estimate (keep key iff h64(key)%100<10, "
    "same md5-derived hash both sides AND both engines) gated against the exact "
    "degree-product count with an asserted ≤15% error boolean — the only sampling "
    "scheme unbiased for equi-join COUNT",
)
def join_universe_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_events

    return PL.join_universe_sample_estimate(
        load_events(spark, sf_dir),
        load_table(spark, sf_dir, "orders"),
        "user_id",
        "o_custkey",
        pct=10,
        bound=0.15,
    )


@register(
    "customer_revenue_theil",
    oracle=R.revenue_theil_oracle(),
    description="Theil index of per-customer revenue concentration — the decomposable "
    "entropy-family inequality scalar next to the Pareto 80/20 cut: exact cent "
    "revenue spine, 1e-9-floored pointwise terms, one cardinality-x-1 totals cross",
)
def customer_revenue_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.revenue_theil(load_table(spark, sf_dir, "orders"))


@register(
    "join_key_overlap_theta",
    oracle=PL.join_key_overlap_oracle("orders", "customer", "o_custkey", "c_custkey"),
    description="theta-sketch key-overlap profile for a prospective join (left-only / "
    "common / right-only distinct keys from two fixed-size mergeable sketches — the "
    "strategy question before any 100 TB join), gated by exact COUNT(DISTINCT) "
    "inclusion-exclusion over one tagged union scan",
)
def join_key_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PL.join_key_overlap_profile(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        "o_custkey",
        "c_custkey",
    )


@register(
    "layout_bucket_advisor",
    oracle=PL.bucket_layout_oracle("lineitem", "l_orderkey", target_rows_per_bucket=5000),
    description="bucket-count prescription for bucketing lineitem on l_orderkey: "
    "next-power-of-two sizing plus the REALIZED h64-assigned distribution (max bucket, "
    "imbalance, salt flag when one hot key alone overflows a bucket) measured on the "
    "key-degree spine, never the data",
)
def layout_bucket_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PL.bucket_layout_advisor(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey", target_rows_per_bucket=5000
    )


#: TESTDATA.md schemas, pinned here so the advisor's Spark side (which
#: reads df.dtypes) and its oracle (built at import time) price columns
#: identically; a schema drift fails the oracle gate loudly.
_LINEITEM_DTYPES = [
    ("l_orderkey", "bigint"), ("l_partkey", "bigint"), ("l_suppkey", "bigint"),
    ("l_linenumber", "int"), ("l_quantity", "double"),
    ("l_extendedprice", "double"), ("l_discount", "double"), ("l_tax", "double"),
    ("l_returnflag", "string"), ("l_linestatus", "string"),
    ("l_shipdate", "timestamp"),
]
_PART_DTYPES = [
    ("p_partkey", "bigint"), ("p_name", "string"), ("p_brand", "string"),
    ("p_type", "string"), ("p_size", "int"), ("p_retailprice", "double"),
]


@register(
    "join_strategy_advisor",
    oracle=PL.join_strategy_advisor_oracle(
        "lineitem", _LINEITEM_DTYPES, "part", _PART_DTYPES
    ),
    description="physical-join-strategy prescription from MEASURED side sizes: exact "
    "per-side byte estimates (typed column widths, one map-side agg per side) vs the "
    "broadcast threshold, with Spark's own JoinSelection decision (broadcast_hash / "
    "shuffled_hash when the build side fits a task / sort_merge) and the build side "
    "named - the byte companion of join_cardinality_estimate and join_skew_planner; "
    "the reference hard-codes this choice per job (RS vs RJ)",
)
def join_strategy_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PL.join_strategy_advisor(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "layout_bucketed_join",
    oracle=PL.bucketed_join_twin_oracle(
        "orders", "o_custkey", "customer", "c_custkey", "c_mktsegment", "o_totalprice"
    ),
    description="EXECUTION twin of layout_bucket_advisor (the salted-join twin "
    "discipline): orders and customer persist hash-bucketed on the join key — the "
    "shuffle paid ONCE at write — then the sort-merge join reads co-located buckets "
    "with ZERO Exchange nodes (plan-pinned); per-segment rollup with exact "
    "floored-cents BIGINT sums equals the plain join, which is what the oracle checks",
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"spark_bktjoin_{tag}")
    return PL.bucketed_join_twin(
        spark,
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
        "c_mktsegment",
        "o_totalprice",
        f"bktjoin_{tag}",
        root,
        n_buckets=8,
    )


@register(
    "layout_partition_advisor",
    oracle=PL.partition_layout_oracle("orders", "o_orderdate", min_rows_per_partition=2000),
    description="partition-granularity prescription (day/week/month) for date-partitioning "
    "orders: one fact scan collapses to the epoch-day spine, week/month profiles regroup "
    "the spine, and the finest granularity clearing the small-files floor is recommended",
)
def layout_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PL.partition_layout_advisor(
        load_table(spark, sf_dir, "orders"), "o_orderdate", min_rows_per_partition=2000
    )


@register(
    "layout_zorder_benefit",
    oracle=PL.zorder_benefit_oracle("lineitem", "l_partkey", "l_suppkey", bits=4),
    description="z-order vs linear-sort layout benefit WITHOUT writing files: rows "
    "assign to 256 blocks under each layout (normalized integer cells, Morton "
    "interleave), min-max file pruning replays for a 1/8x1/8 probe rectangle, and "
    "scan amplification + block prune fraction quantify what ZORDER BY would buy",
)
def layout_zorder_benefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PL.zorder_benefit_estimate(
        load_table(spark, sf_dir, "lineitem"), "l_partkey", "l_suppkey", bits=4
    )


from twitter_followers_patterns_mapreduce_spark.operators import stats as ST  # noqa: E402


@register(
    "orders_survival_km",
    oracle=ST.kaplan_meier_oracle(churn_cutoff="1998-01-01"),
    description="Kaplan-Meier product-limit survival over customer active lifespans "
    "(monthly grain, churn-cutoff censoring): one per-customer agg is the only "
    "data-sized pass; n_risk and the exp(Σln) product ride the bounded duration "
    "spine — the degree_gini bounded-spine-window discipline",
)
def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.kaplan_meier_survival(load_table(spark, sf_dir, "orders"))


@register(
    "basket_frequent_triples",
    oracle=R.basket_frequent_triples_oracle(modulus=53, min_support=5, k=20),
    description="level-3 Apriori over category baskets: downward-closure pruning — "
    "only L2-frequent pairs extend to candidate triples, two more L2 semi-joins "
    "prune (a,c)/(b,c) before the support count; broadcast L2, capped baskets",
)
def basket_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.basket_frequent_triples(
        load_table(spark, sf_dir, "lineitem"), modulus=53, min_support=5, k=20
    )


@register(
    "lineitem_trimmed_mean",
    oracle=ST.trimmed_mean_oracle("lineitem", "l_extendedprice", trim=0.05),
    description="robust location: 5% trimmed + winsorized means vs the raw mean — "
    "one exact-percentile band broadcast over the scan, conditional cents-BIGINT "
    "sums in a single second pass",
)
def lineitem_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ST.trimmed_mean(load_table(spark, sf_dir, "lineitem"), "l_extendedprice", trim=0.05)


@register(
    "join_bloom_prefilter",
    oracle=PL.bloom_prefilter_oracle(
        "lineitem", "part", "l_partkey", "p_partkey", "p_size < 15"
    ),
    description="Bloom runtime-prefilter execution twin: a selective part predicate "
    "builds a 16384-bit / 4-probe content-hash Bloom filter as word-packed 32-bit lanes "
    "(one bit_or hash-agg), the <=512-row word table broadcasts, and lineitem keys "
    "are pruned BEFORE any shuffle join would run — deterministic probes make the "
    "false-positive count exact in both engines (measured, not modeled), with the "
    "semi-join truth riding the same per-key count table and the no-false-negative "
    "soundness gate pinned TRUE",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PL.bloom_prefilter_twin(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        "l_partkey",
        "p_partkey",
        "p_size < 15",
    )


def _stage_part_batches(spark: SparkSession, sf_dir: str, n_batches: int = 4):
    """Stage the part dim's (p_partkey, p_size) as ``n_batches`` parquet
    files split by key hash, with every 16th key ALSO re-sent in the
    next batch (duplicate re-arrival path) — key-set union and bit_or
    are commutative, so no mtime-ordered replay semantics are needed;
    ascending mtimes keep the drain deterministic.  State/checkpoint
    wiped per invocation for a fresh replay."""
    import glob as _glob
    import hashlib
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"spark_bloomstream_{tag}")
    feed_dir = os.path.join(root, "feed")
    state_dir = os.path.join(root, "state")
    ckpt_dir = os.path.join(root, "ckpt")
    for d in (state_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    if not os.path.exists(feed_dir):
        os.makedirs(feed_dir)
        part = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
        now = _time.time()
        for b in range(n_batches):
            tmp = os.path.join(root, f"stage_b{b}")
            h = F.pmod(F.xxhash64(F.col("p_partkey")), F.lit(n_batches))
            dup = F.pmod(F.xxhash64(F.col("p_partkey"), F.lit(1)), F.lit(16))
            part.where(
                (h == b)
                | ((dup == 0) & (F.pmod(h + 1, F.lit(n_batches)) == b))
            ).coalesce(1).write.mode("overwrite").parquet(tmp)
            (pf,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
            dst = os.path.join(feed_dir, f"b{b}.parquet")
            os.rename(pf, dst)
            os.utime(dst, (now + b, now + b))
            shutil.rmtree(tmp)
    return feed_dir, state_dir, ckpt_dir


@register(
    "join_bloom_prefilter_streamed",
    oracle=PL.bloom_prefilter_oracle(
        "lineitem", "part", "l_partkey", "p_partkey", "p_size < 15"
    ),
    description="streamed Bloom runtime-filter maintenance (twentieth streaming "
    "class): dim rows drain as 4 micro-batches (with duplicate re-arrivals) into "
    "versioned key-set + word-table state — per batch an anti-join isolates "
    "genuinely-new keys, probe words are built for the delta alone, and the "
    "standing <=512-row word table folds them in by bit_or re-aggregation; set "
    "union and bit_or are commutative monoids, so the drained filter equals the "
    "one-shot build under any chunking and the query shares the batch twin's "
    "full-recompute oracle, scoring lineitem against the STANDING state with the "
    "no-false-negative soundness gate",
)
def join_bloom_prefilter_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_followers_patterns_mapreduce_spark.streaming.bloom import (
        bloom_apply_stream,
        bloom_score_from_state,
        dim_file_stream,
    )

    feed_dir, state_dir, ckpt_dir = _stage_part_batches(spark, sf_dir)
    bloom_apply_stream(
        spark, dim_file_stream(spark, feed_dir), state_dir, ckpt_dir
    )
    return bloom_score_from_state(
        spark, state_dir, load_table(spark, sf_dir, "lineitem"), "l_partkey"
    )


@register(
    "part_skyline",
    oracle=R.part_skyline_oracle(),
    description="2-D skyline / Pareto frontier over part (minimize retail price in "
    "exact cents AND size): sort-based linear identity — per-x min, then survive "
    "iff y < strict prefix min — decomposed by the house two-level discipline "
    "(partitioned within-bucket running min + exclusive bucket-spine prefix min "
    "via the sort_array fold, zero unpartitioned windows); oracle is the "
    "INDEPENDENT quadratic NOT-EXISTS dominance formulation",
)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.part_skyline(load_table(spark, sf_dir, "part"))
