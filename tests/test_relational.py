"""Hand-computed goldens for the relational operators on tiny tables."""

from __future__ import annotations

import datetime as dt

import pytest

from twitter_followers_patterns_mapreduce_spark.operators import relational as R

TS = dt.datetime(1995, 6, 1)


@pytest.fixture(scope="module")
def lineitem(spark):
    rows = [
        # orderkey, partkey, suppkey, qty, price, discount, tax, flag, status, shipdate
        (1, 10, 100, 2.0, 100.0, 0.10, 0.05, "N", "O", TS),
        (1, 11, 100, 3.0, 200.0, 0.00, 0.00, "N", "O", TS),
        (2, 10, 101, 1.0, 50.0, 0.50, 0.10, "R", "F", TS),
        (3, 12, 102, 4.0, 80.0, 0.25, 0.00, "N", "O", dt.datetime(1999, 1, 1)),  # after cutoff
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_quantity DOUBLE, "
            "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
            "l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP"
        ),
    )


@pytest.fixture(scope="module")
def orders(spark):
    rows = [
        (1, 7, dt.datetime(1995, 3, 5), "1-URGENT", 300.0),
        (2, 8, dt.datetime(1995, 4, 6), "2-HIGH", 50.0),
        (3, 7, dt.datetime(1995, 3, 7), "1-URGENT", 320.0),
    ]
    return spark.createDataFrame(
        rows,
        schema="o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP, o_orderpriority STRING, o_totalprice DOUBLE",
    )


@pytest.fixture(scope="module")
def customer(spark):
    rows = [(7, "Alice", "BUILDING", 1), (8, "Bob", "AUTO", 1), (9, "Carol", "AUTO", 2)]
    return spark.createDataFrame(
        rows, schema="c_custkey LONG, c_name STRING, c_mktsegment STRING, c_nationkey LONG"
    )


def test_q1_goldens(lineitem):
    r = {(x["l_returnflag"], x["l_linestatus"]): x for x in R.q1_pricing_summary(lineitem).collect()}
    no = r[("N", "O")]
    # rows 1+2 only (row 4 fails the shipdate cutoff)
    assert no["count_order"] == 2
    assert no["sum_qty"] == 5.0
    assert no["sum_base_price"] == 300.0
    # disc_price: 100*0.9 + 200*1.0 = 290; charge: 90*1.05 + 200*1.0 = 294.5
    assert no["sum_disc_price"] == 290.0
    assert no["sum_charge"] == 294.5
    rf = r[("R", "F")]
    assert rf["sum_disc_price"] == 25.0
    assert rf["sum_charge"] == 27.5


def test_top_customers_goldens(lineitem, orders, customer):
    rows = R.top_customers_by_revenue(lineitem, orders, customer, k=2).collect()
    got = [(r["rank"], r["c_custkey"], r["revenue"], r["n_items"]) for r in rows]
    # Alice: order 1 (90 + 200) + order 3 (80×0.75 = 60) = 350 over 3 items
    assert got == [(1, 7, 350.0, 3), (2, 8, 25.0, 1)]


def test_customers_without_orders(customer, orders):
    rows = R.customers_without_orders(customer, orders).collect()
    assert [(r["c_custkey"], r["c_mktsegment"]) for r in rows] == [(9, "AUTO")]


def test_orders_monthly_priority(orders):
    r = {
        (x["month"], x["priority"]): (x["n_orders"], x["n_customers"], x["total_price"])
        for x in R.orders_monthly_priority(orders).collect()
    }
    assert r[("1995-03", "1-URGENT")] == (2, 1, 620.0)
    assert r[("1995-04", "2-HIGH")] == (1, 1, 50.0)


def test_supplier_part_coverage_keeps_zero_suppliers(spark, lineitem):
    supplier = spark.createDataFrame(
        [(100, "S1"), (101, "S2"), (999, "S-empty")], schema="s_suppkey LONG, s_name STRING"
    )
    part = spark.createDataFrame([(10, "P")], schema="p_partkey LONG, p_name STRING")
    r = {x["s_suppkey"]: (x["n_parts"], x["n_items"]) for x in R.supplier_part_coverage(lineitem, supplier, part).collect()}
    assert r[100] == (2, 2)
    assert r[101] == (1, 1)
    assert r[999] == (0, 0)  # left-outer keeps the supplier with no lineitems


# ---------------------------------------------------------------------------
# Round-3 TPC-H shape additions
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def part3(spark):
    rows = [
        (10, "widget", "Brand#12", "SMALL", 3, 9.0),
        (11, "gadget", "Brand#23", "SMALL", 7, 9.0),
        (12, "gizmo", "Brand#34", "LARGE", 40, 9.0),
    ]
    return spark.createDataFrame(
        rows,
        schema="p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE",
    )


@pytest.fixture(scope="module")
def supplier3(spark):
    rows = [(100, "ACME", 1, 50.0), (101, "BadCo", 1, -5.0), (102, "Duo", 2, 10.0)]
    return spark.createDataFrame(
        rows, schema="s_suppkey LONG, s_name STRING, s_nationkey INT, s_acctbal DOUBLE"
    )


def test_q2_min_per_part_join_back(lineitem, part3, supplier3):
    # part 10 appears at prices 100 (supp 100) and 50 (supp 101): only
    # the min-price row survives the correlated-min join-back
    out = R.q2_min_cost_supplier(part3, supplier3, lineitem, max_size=10, ptype="SMALL")
    rows = {(r.p_partkey, r.s_suppkey, r.min_price) for r in out.collect()}
    assert rows == {(10, 101, 50.0), (11, 100, 200.0)}


def test_q12_priority_case_counts(orders, lineitem):
    out = R.q12_priority_counts(orders, lineitem, year=1995)
    got = {r.l_linestatus: (r.high_line_count, r.low_line_count) for r in out.collect()}
    # 1995 lineitems: orders 1 (URGENT, 2 lines, status O) and 2 (HIGH, 1 line, F)
    assert got == {"O": (2, 0), "F": (1, 0)}


def test_q14_promo_ratio_exact(lineitem, part3):
    out = R.q14_promo_revenue(
        lineitem, part3, month_lo="1995-06-01", month_hi="1995-07-01"
    ).collect()[0]
    # June-1995 lineitems: part 10 (SMALL) 90+25, part 11 (SMALL) 200 — no
    # PROMO p_type at all → promo share 0
    assert out.promo_revenue_pct == 0.0
    assert out.total_revenue == 315.0


def test_q16_excludes_negative_balance_suppliers(lineitem, part3, supplier3):
    out = R.q16_supplier_part_counts(part3, supplier3, lineitem, excl_brand="Brand#99")
    got = {(r.p_brand, r.p_type, r.p_size): r.supplier_cnt for r in out.collect()}
    # supplier 101 (acctbal<0) is anti-joined away: part 10 keeps only supp 100
    assert got[("Brand#12", "SMALL", 3)] == 1
    assert got[("Brand#23", "SMALL", 7)] == 1


def test_q22_threshold_and_anti_join(spark, orders):
    cust = spark.createDataFrame(
        [(7, 1, 100.0), (8, 1, 1000.0), (9, 2, 1000.0), (10, 2, -50.0)],
        schema="c_custkey LONG, c_nationkey INT, c_acctbal DOUBLE",
    )
    # avg positive balance = (100+1000+1000)/3 = 700; rich = {8, 9};
    # customer 8 ordered in 1995 → idle rich = {9}
    out = R.q22_idle_rich_customers(cust, orders, cutoff="1995-01-01").collect()
    assert [(r.c_nationkey, r.numcust, r.totacctbal) for r in out] == [(2, 1, 1000.0)]


def test_customers_lost_yoy_except(spark, customer):
    import datetime as dt

    orders = spark.createDataFrame(
        [
            (1, 7, dt.datetime(1995, 1, 1)),
            (2, 8, dt.datetime(1995, 2, 1)),
            (3, 8, dt.datetime(1996, 3, 1)),
        ],
        schema="o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP",
    )
    out = R.customers_lost_yoy(orders, customer, 1995, 1996).collect()
    # 1995 actives {7, 8} minus 1996 actives {8} → lost {7} (nation 1)
    assert [(r.c_nationkey, r.n_lost_customers) for r in out] == [(1, 1)]


def test_ntile_partitioned_and_deterministic(spark):
    cust = spark.createDataFrame(
        [(i, 1, float(i)) for i in range(1, 5)] + [(10, 2, 7.0)],
        schema="c_custkey LONG, c_nationkey INT, c_acctbal DOUBLE",
    )
    out = R.customer_balance_ntiles(cust, n=2)
    got = {(r.c_nationkey, r.decile): (r.n_customers, r.sum_bal) for r in out.collect()}
    assert got == {(1, 1): (2, 3.0), (1, 2): (2, 7.0), (2, 1): (1, 7.0)}
    # the window must be PARTITIONED by nation — a bare global ntile is
    # the single-task sort this engine bans
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ntile" in plan
    assert "windowspecdefinition(c_nationkey" in plan


def test_grouping_sets_three_sets(orders):
    out = R.orders_grouping_sets(orders).collect()
    total = [r for r in out if r.g_priority == 1 and r.g_year == 1]
    assert len(total) == 1 and total[0].n_orders == 3 and total[0].sum_totalprice == 670.0
    by_year = [r for r in out if r.g_priority == 1 and r.g_year == 0]
    assert {(r.o_year, r.n_orders) for r in by_year} == {(1995, 3)}
    by_prio = [r for r in out if r.g_priority == 0 and r.g_year == 1]
    assert {(r.o_orderpriority, r.n_orders) for r in by_prio} == {
        ("1-URGENT", 2),
        ("2-HIGH", 1),
    }


def test_extremes_witness_tie_broken_by_orderkey(spark):
    import datetime as dt

    orders = spark.createDataFrame(
        [
            (5, 1, dt.datetime(1995, 1, 1), "1-URGENT", 100.0),
            (2, 1, dt.datetime(1995, 6, 1), "1-URGENT", 100.0),  # price tie
            (9, 1, dt.datetime(1995, 3, 1), "1-URGENT", 50.0),
        ],
        schema="o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING, o_totalprice DOUBLE",
    )
    out = R.orders_extremes_by_priority(orders).collect()[0]
    # tie at 100.0 → larger orderkey wins max, smaller... min is the 50.0 row
    assert out.priciest_orderkey == 5 and out.cheapest_orderkey == 9
    assert out.first_order == "1995-01-01" and out.last_order == "1995-06-01"


def test_pareto_cutoff_golden(spark):
    import datetime as dt

    # nation 1: revenues 70, 20, 10 → 80% of 100 needs the top TWO
    # (70 < 80, 70+20 ≥ 80); nation 2: single customer needs itself
    orders = spark.createDataFrame(
        [
            (1, 7, dt.datetime(1995, 1, 1), "1-URGENT", 70.0),
            (2, 8, dt.datetime(1995, 1, 2), "1-URGENT", 20.0),
            (3, 9, dt.datetime(1995, 1, 3), "1-URGENT", 10.0),
            (4, 10, dt.datetime(1995, 1, 4), "1-URGENT", 5.0),
        ],
        schema="o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP, "
        "o_orderpriority STRING, o_totalprice DOUBLE",
    )
    cust = spark.createDataFrame(
        [(7, 1), (8, 1), (9, 1), (10, 2)], schema="c_custkey LONG, c_nationkey INT"
    )
    got = {r.c_nationkey: r for r in R.nation_revenue_pareto(orders, cust).collect()}
    assert got[1].n_customers == 3 and got[1].n_top_customers == 2
    assert got[1].nation_revenue == 100.0
    assert got[2].n_top_customers == 1


def test_brand_affinity_counts_each_basket_once(spark, part3):
    li = spark.createDataFrame(
        # order 1 holds brands 12 and 23 (23 twice — still ONE item);
        # order 2 holds 12 only
        [(1, 10), (1, 11), (1, 11), (2, 10)],
        schema="l_orderkey LONG, l_partkey LONG",
    )
    out = R.brand_affinity_pairs(li, part3, k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.brand_a, r.brand_b, r.support, r.cnt_a, r.cnt_b) == (
        "Brand#12", "Brand#23", 1, 2, 1,
    )
    # lift = support·N / (cnt_a·cnt_b) = 1·2/(2·1) = 1.0
    assert r.lift == 1.0


def test_scd2_history_intervals_golden(spark):
    import datetime as dt

    d0 = dt.date(1995, 6, 1)
    orders = spark.createDataFrame(
        [
            # o_orderkey % 7 == 0 -> gets a version-1 bump
            (7, 1, "O", 10.0, d0, "3-MEDIUM", "c", 0, "x"),
            (8, 2, "O", 20.0, d0, "5-LOW", "c", 0, "x"),
        ],
        schema="o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING, "
        "o_clerk STRING, o_shippriority LONG, o_comment STRING",
    )
    rows = {
        (r["o_orderkey"], r["version"]): r
        for r in R.orders_scd2_history(orders).collect()
    }
    assert set(rows) == {(7, 0), (7, 1), (8, 0)}
    # changed key: base version closed by the update, update current
    assert rows[(7, 0)]["valid_from"] == "1995-06-01"
    assert rows[(7, 0)]["valid_to"] == "1995-07-01"
    assert rows[(7, 0)]["is_current"] is False
    assert rows[(7, 1)]["priority"] == "1-URGENT"
    assert rows[(7, 1)]["valid_to"] is None
    assert rows[(7, 1)]["is_current"] is True
    # unchanged key: single open interval, priority as loaded
    assert rows[(8, 0)]["priority"] == "5-LOW"
    assert rows[(8, 0)]["valid_to"] is None
    assert rows[(8, 0)]["is_current"] is True


def test_scd2_deletes_golden(spark):
    """Key 70 (bump at +30d AND delete at +60d): v0 closed by the bump,
    v1 closed by the DELETE, no current row.  Key 10 (delete only):
    v0 closed at the delete date, not current.  Key 8 (neither):
    untouched open interval."""
    import datetime as dt

    d0 = dt.date(1995, 6, 1)
    orders = spark.createDataFrame(
        [
            (70, 1, "O", 1.0, d0, "3-MEDIUM", "c", 0, "x"),
            (10, 2, "O", 1.0, d0, "5-LOW", "c", 0, "x"),
            (8, 3, "O", 1.0, d0, "2-HIGH", "c", 0, "x"),
        ],
        schema="o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING, "
        "o_clerk STRING, o_shippriority LONG, o_comment STRING",
    )
    rows = {
        (r["o_orderkey"], r["version"]): r
        for r in R.orders_scd2_deletes(orders).collect()
    }
    assert set(rows) == {(70, 0), (70, 1), (10, 0), (8, 0)}
    assert rows[(70, 0)]["valid_to"] == "1995-07-01"  # closed by bump
    assert rows[(70, 1)]["valid_to"] == "1995-07-31"  # closed by DELETE
    assert rows[(70, 1)]["is_current"] is False  # deleted key: no current row
    assert rows[(10, 0)]["valid_to"] == "1995-07-31"
    assert rows[(10, 0)]["is_current"] is False
    assert rows[(8, 0)]["valid_to"] is None and rows[(8, 0)]["is_current"] is True


def test_scd2_asof_equals_interval_filtered_history(spark):
    """The argmax snapshot must equal the naive plan: build the full
    SCD2 history, keep rows whose half-open interval covers the as-of
    date.  Run on real orders at sf0.001 so the date straddles bumps
    (some keys show version 1, some still version 0, some absent)."""
    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    d = "1995-06-01"
    snap = {
        (r["o_orderkey"], r["version"], r["priority"], r["valid_from"])
        for r in R.orders_scd2_asof(orders, as_of=d).collect()
    }
    hist = R.orders_scd2_history(orders)
    naive = {
        (r["o_orderkey"], r["version"], r["priority"], r["valid_from"])
        for r in hist.where(
            (F.col("valid_from") <= d)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
        ).collect()
    }
    assert snap == naive and len(snap) > 0
    # the date is mid-range: all three member states must occur
    versions = {v for (_, v, _, _) in snap}
    assert versions == {0, 1}
    n_keys = orders.select("o_orderkey").distinct().count()
    assert len(snap) < n_keys  # some keys postdate the snapshot


def test_copurchase_part_pairs_counts_baskets_once(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.relational import (
        copurchase_part_pairs,
    )

    rows = [
        # order 1: parts 10, 20 (20 listed twice — still ONE basket pair), 30
        (1, 10), (1, 20), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20),
    ]
    df = spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O") for o, p in rows],
        schema="l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag STRING, l_linestatus STRING",
    )
    got = [(r["p1"], r["p2"], r["n_baskets"]) for r in copurchase_part_pairs(df, k=10).collect()]
    assert got == [(10, 20, 3), (10, 30, 1), (20, 30, 1)]


def test_target_encoding_shrinks_toward_global_mean(spark):
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.relational import (
        target_encoding,
    )

    # category A: 2 rows @ 100.00; category B: 1 row @ 400.00
    rows = [
        (1, 1, "O", 100.0, None, "A"),
        (2, 1, "O", 100.0, None, "A"),
        (3, 1, "O", 400.0, None, "B"),
    ]
    df = spark.createDataFrame(
        rows,
        schema="o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    got = {
        r["category"]: r["encoding"]
        for r in target_encoding(df, smoothing=2).collect()
    }
    gmean_cents = (10000 + 10000 + 40000) / 3
    enc_a = math.floor((20000 + 2 * gmean_cents) / (2 + 2) / 100 * 1e6) / 1e6
    enc_b = math.floor((40000 + 2 * gmean_cents) / (1 + 2) / 100 * 1e6) / 1e6
    assert got == {"A": enc_a, "B": enc_b}
    # shrinkage: both encodings sit between their raw mean and the global mean
    assert 100.0 < got["A"] < gmean_cents / 100
    assert gmean_cents / 100 < got["B"] < 400.0


def test_basket_association_rules_hand_case(spark):
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.relational import (
        basket_association_rules,
    )

    # baskets: {1,2} x3, {1,3} x1, {2,3} x1, {4} x1  -> 6 baskets
    rows = []
    ok = 0
    for _ in range(3):
        ok += 1
        rows += [(ok, 1), (ok, 2)]
    ok += 1
    rows += [(ok, 1), (ok, 3)]
    ok += 1
    rows += [(ok, 2), (ok, 3)]
    ok += 1
    rows += [(ok, 4)]
    df = spark.createDataFrame(rows, schema="l_orderkey LONG, l_partkey LONG")
    out = {(r["p1"], r["p2"]): r for r in basket_association_rules(df, k=5, min_pair=2).collect()}
    # only (1,2) passes min_pair=2: n_pair=3, n1=4, n2=4, N=6
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    fl = lambda x: math.floor(x * 1e6) / 1e6
    assert r["n_pair"] == 3
    assert r["support"] == fl(3 / 6)
    assert r["conf_p1_p2"] == fl(3 / 4) and r["conf_p2_p1"] == fl(3 / 4)
    assert r["lift"] == fl(3 * 6 / (4 * 4))  # 1.125 > 1: bought together


def test_basket_cap_excludes_constructed_mega_basket(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.relational import (
        basket_association_rules,
        copurchase_part_pairs,
    )

    # hand-case baskets: {1,2} x3, {1,3}, {2,3}, {4}  (6 baskets, <=2 items)
    rows = []
    ok = 0
    for _ in range(3):
        ok += 1
        rows += [(ok, 1), (ok, 2)]
    ok += 1
    rows += [(ok, 1), (ok, 3)]
    ok += 1
    rows += [(ok, 2), (ok, 3)]
    ok += 1
    rows += [(ok, 4)]
    normal = list(rows)
    # one adversarial mega-basket: 70 distinct parts (> the 64 cap),
    # Σ|basket|² contribution 70*69/2 = 2415 pairs on its own
    rows += [(100, p) for p in range(1, 71)]
    base = spark.createDataFrame(normal, schema="l_orderkey LONG, l_partkey LONG")
    hot = spark.createDataFrame(rows, schema="l_orderkey LONG, l_partkey LONG")

    # default cap=64: the mega-basket is excluded — ALL outputs (counts
    # AND denominators) are identical to the data without it
    want_rules = sorted(map(tuple, basket_association_rules(base, k=5).collect()))
    got_rules = sorted(map(tuple, basket_association_rules(hot, k=5).collect()))
    assert got_rules == want_rules and len(got_rules) == 1
    want_pairs = sorted(map(tuple, copurchase_part_pairs(base, k=100).collect()))
    got_pairs = sorted(map(tuple, copurchase_part_pairs(hot, k=100).collect()))
    assert got_pairs == want_pairs

    # cap disabled: the mega-basket floods the pair table — every pair
    # among its 70 parts becomes a candidate (70·69/2 = 2415, absorbing
    # the 3 normal pairs) and every denominator shifts — the lever binds
    uncapped = copurchase_part_pairs(hot, k=10000, basket_cap=None).collect()
    assert len(uncapped) == 70 * 69 // 2
    rules = {
        (r["p1"], r["p2"]): r
        for r in basket_association_rules(hot, k=10, basket_cap=None).collect()
    }
    # mega boosts (1,2)->4, (1,3)->2, (2,3)->2 past min_pair
    assert set(rules) == {(1, 2), (1, 3), (2, 3)}
    import math

    fl = lambda x: math.floor(x * 1e6) / 1e6
    r12 = rules[(1, 2)]
    assert r12["n_pair"] == 4
    assert r12["support"] == fl(4 / 7)  # 7 baskets now
    assert r12["lift"] == fl(4 * 7 / (5 * 5))  # n1 = n2 = 5 with mega


def test_join_delta_ivm_equals_direct_join_rollup(spark):
    """The bilinear delta expansion merged over four slice-joins must
    equal the one-shot join rollup — the IVM correctness property."""
    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.operators.relational import join_delta_ivm
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    lineitem, orders = load_table(spark, sf, "lineitem"), load_table(spark, sf, "orders")
    merged = {r["order_month"]: r for r in join_delta_ivm(lineitem, orders).collect()}
    rev = "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
    direct = {
        r["order_month"]: r
        for r in lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.expr(f"CAST(SUM({rev}) AS DOUBLE)").alias("revenue"),
        )
        .collect()
    }
    assert set(merged) == set(direct)
    for mth in merged:
        assert merged[mth]["n_items"] == direct[mth]["n_items"]
        assert merged[mth]["revenue"] == direct[mth]["revenue"]  # decimal-exact merge


def test_revenue_theil_bounds_and_equality_case(spark):
    """All-equal revenues -> Theil 0; a dominant customer pushes it
    toward ln n; exact value checked against the Python formula."""
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.relational import revenue_theil

    def mk(prices_by_cust):
        rows = [(c * 100 + i, c, float(p), f"199{c % 3 + 4}-01-0{i % 9 + 1}")
                for c, prices in prices_by_cust.items()
                for i, p in enumerate(prices)]
        return spark.createDataFrame(
            rows, schema="o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, d STRING"
        ).selectExpr("o_orderkey", "o_custkey", "o_totalprice",
                     "CAST(d AS TIMESTAMP) AS o_orderdate")

    (eq,) = revenue_theil(mk({1: [50.0], 2: [25.0, 25.0], 3: [50.0]})).collect()
    assert eq["n_customers"] == 3 and eq["theil"] == 0.0
    xs = [1000.0, 10.0, 10.0, 10.0]
    (skew,) = revenue_theil(mk({c: [x] for c, x in enumerate(xs, 1)})).collect()
    mu = sum(xs) / 4
    want = sum((x / mu) * math.log(x / mu) for x in xs) / 4
    assert abs(skew["theil"] - want) < 2e-6
    assert 0 < skew["theil"] < math.log(4)


def test_skyline_2d_closed_form_with_ties_and_dups(spark):
    """Hand-checked dominance: duplicates aggregate into n_rows, an
    equal-y at smaller x dominates (strict rule), and the frontier is
    exactly the undominated point set regardless of bucketing width."""
    from twitter_followers_patterns_mapreduce_spark.operators.relational import (
        skyline_2d,
    )

    pts = [
        (1, 9), (1, 9),        # frontier (dup -> n_rows 2)
        (2, 7),                # frontier
        (3, 7),                # dominated by (2,7): equal y, smaller x
        (4, 3),                # frontier
        (5, 3),                # dominated by (4,3)
        (6, 8),                # dominated by (2,7)
        (7, 1),                # frontier
        (8, 2),                # dominated by (7,1)
    ]
    df = spark.createDataFrame(pts, "a LONG, b LONG")
    for nb in (1, 3, 64):
        got = {
            (r["x"], r["y"]): r["n_rows"]
            for r in skyline_2d(df, "a", "b", n_buckets=nb).collect()
        }
        assert got == {(1, 9): 2, (2, 7): 1, (4, 3): 1, (7, 1): 1}, nb
