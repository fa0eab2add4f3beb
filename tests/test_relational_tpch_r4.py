"""Hand-computed goldens for the round-4 TPC-H shapes (Q4/Q6/Q8/Q9/Q11/
Q13/Q15/Q17/Q20/Q21) on tiny inline tables — each pins the semantic the
harness-schema adaptation must keep (quantifier behavior, exact-DECIMAL
boundaries, NULL/zero-group handling)."""

from __future__ import annotations

import datetime as dt

import pytest

from twitter_followers_patterns_mapreduce_spark.operators import relational as R


def ts(s: str) -> dt.datetime:
    return dt.datetime.strptime(s, "%Y-%m-%d")


LI_SCHEMA = (
    "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_quantity DOUBLE, "
    "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
    "l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP"
)
ORD_SCHEMA = (
    "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, "
    "o_orderdate TIMESTAMP, o_orderpriority STRING"
)


@pytest.fixture(scope="module")
def supplier(spark):
    rows = [(100, "Supplier#100", 1, 10.0), (101, "Supplier#101", 1, 20.0), (102, "Supplier#102", 2, 30.0)]
    return spark.createDataFrame(
        rows, schema="s_suppkey LONG, s_name STRING, s_nationkey INT, s_acctbal DOUBLE"
    )


@pytest.fixture(scope="module")
def nation(spark):
    rows = [(1, "NATION_1", 0), (2, "NATION_2", 1)]
    return spark.createDataFrame(rows, schema="n_nationkey INT, n_name STRING, n_regionkey INT")


@pytest.fixture(scope="module")
def region(spark):
    return spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], schema="r_regionkey INT, r_name STRING"
    )


def test_q4_counts_orders_not_lineitems(spark):
    # order 1: TWO late lineitems → still counts once (EXISTS, not join
    # multiplicity); order 2: on-time only → excluded; order 3: outside
    # the quarter → excluded by the date band.
    orders = spark.createDataFrame(
        [
            (1, 7, "O", 1.0, ts("1997-02-01"), "1-URGENT"),
            (2, 7, "O", 1.0, ts("1997-03-01"), "2-HIGH"),
            (3, 7, "O", 1.0, ts("1997-06-01"), "1-URGENT"),
        ],
        schema=ORD_SCHEMA,
    )
    li = spark.createDataFrame(
        [
            (1, 10, 100, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-04-01")),
            (1, 11, 100, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-05-01")),
            (2, 10, 100, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-03-05")),
            (3, 10, 100, 1.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-12-01")),
        ],
        schema=LI_SCHEMA,
    )
    got = {r.o_orderpriority: r.order_count for r in R.q4_order_priority(orders, li).collect()}
    assert got == {"1-URGENT": 1}


def test_q6_band_and_revenue(spark):
    li = spark.createDataFrame(
        [
            (1, 10, 100, 10.0, 1000.0, 0.06, 0.0, "N", "O", ts("1997-01-01")),  # in
            (2, 10, 100, 30.0, 1000.0, 0.06, 0.0, "N", "O", ts("1997-01-01")),  # qty ≥ 24
            (3, 10, 100, 10.0, 1000.0, 0.10, 0.0, "N", "O", ts("1997-01-01")),  # disc out
            (4, 10, 100, 10.0, 1000.0, 0.05, 0.0, "N", "O", ts("1996-01-01")),  # year out
        ],
        schema=LI_SCHEMA,
    )
    out = R.q6_forecast_revenue(li).collect()[0]
    assert out.n_lineitems == 1
    assert out.revenue == 60.0  # 1000 × 0.06


def test_q8_share_per_year(spark, supplier, nation, region):
    # Both lineitems sell ECONOMY parts into ASIA (customer nation 1);
    # supplier 100 is NATION_1 (target), supplier 102 is NATION_2.
    part = spark.createDataFrame(
        [(10, "red widget", "Brand#1", "ECONOMY", 1, 5.0)],
        schema="p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING, p_size INT, p_retailprice DOUBLE",
    )
    customer = spark.createDataFrame(
        [(7, "Customer#7", 1, 0.0, "BUILDING")],
        schema="c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING",
    )
    orders = spark.createDataFrame(
        [(1, 7, "O", 1.0, ts("1996-05-01"), "1-URGENT")], schema=ORD_SCHEMA
    )
    li = spark.createDataFrame(
        [
            (1, 10, 100, 1.0, 300.0, 0.0, 0.0, "N", "O", ts("1996-05-02")),
            (1, 10, 102, 1.0, 100.0, 0.0, 0.0, "N", "O", ts("1996-05-03")),
        ],
        schema=LI_SCHEMA,
    )
    out = R.q8_market_share(
        li, orders, customer, supplier, part, nation, region, target_nation="NATION_1"
    ).collect()
    assert len(out) == 1 and out[0].o_year == 1996
    assert out[0].nation_revenue == 300.0
    assert out[0].total_revenue == 400.0
    assert out[0].mkt_share == 0.75


def test_q9_profit_formula(spark, supplier, nation):
    part = spark.createDataFrame(
        [(10, "red widget", "Brand#1", "ECONOMY", 1, 50.0),
         (11, "blue bolt", "Brand#1", "ECONOMY", 1, 50.0)],
        schema="p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING, p_size INT, p_retailprice DOUBLE",
    )
    orders = spark.createDataFrame(
        [(1, 7, "O", 1.0, ts("1997-05-01"), "1-URGENT")], schema=ORD_SCHEMA
    )
    li = spark.createDataFrame(
        [
            (1, 10, 100, 2.0, 200.0, 0.10, 0.0, "N", "O", ts("1997-05-02")),  # red: in
            (1, 11, 100, 2.0, 999.0, 0.00, 0.0, "N", "O", ts("1997-05-02")),  # blue: name-filtered out
        ],
        schema=LI_SCHEMA,
    )
    out = R.q9_product_type_profit(li, orders, supplier, part, nation, name_frag="red").collect()
    # profit = 200×0.9 − 50×2×0.1 = 180 − 10 = 170, under supplier 100 → NATION_1
    assert [(r.nation, r.o_year, r.profit) for r in out] == [("NATION_1", 1997, 170.0)]


def test_q11_threshold_is_global_fraction(spark, supplier, nation):
    # suppliers 100/101 are NATION_1; part values: 10 → 900, 11 → 90,
    # 12 → 10 (from a NATION_2 supplier: excluded entirely).
    li = spark.createDataFrame(
        [
            (1, 10, 100, 1.0, 900.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
            (1, 11, 101, 1.0, 90.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
            (1, 12, 102, 1.0, 10.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
        ],
        schema=LI_SCHEMA,
    )
    out = R.q11_important_parts(li, supplier, nation, target_nation="NATION_1", frac="0.1").collect()
    # total = 990; threshold 99 → part 10 (900) only; part 11 (90 < 99) out
    assert [(r.l_partkey, r.part_value) for r in out] == [(10, 900.0)]


def test_q13_keeps_zero_order_customers(spark):
    customer = spark.createDataFrame(
        [(7, "a", 1, 0.0, "X"), (8, "b", 1, 0.0, "X"), (9, "c", 1, 0.0, "X")],
        schema="c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING",
    )
    orders = spark.createDataFrame(
        [
            (1, 7, "O", 1.0, ts("1997-01-01"), "1-URGENT"),
            (2, 7, "O", 1.0, ts("1997-02-01"), "2-HIGH"),
            (3, 8, "O", 1.0, ts("1997-03-01"), "4-NOT SPECIFIED"),  # filtered out pre-join
        ],
        schema=ORD_SCHEMA,
    )
    out = R.q13_customer_distribution(customer, orders).collect()
    # counts: cust 7 → 2, cust 8 → 0 (its only order excluded), cust 9 → 0
    assert [(r.c_count, r.custdist) for r in out] == [(0, 2), (2, 1)]


def test_q15_max_with_tie(spark, supplier):
    li = spark.createDataFrame(
        [
            (1, 10, 100, 1.0, 500.0, 0.0, 0.0, "N", "O", ts("1997-02-01")),
            (2, 10, 101, 1.0, 250.0, 0.0, 0.0, "N", "O", ts("1997-02-01")),
            (3, 10, 101, 1.0, 250.0, 0.0, 0.0, "N", "O", ts("1997-02-02")),
            (4, 10, 102, 1.0, 100.0, 0.0, 0.0, "N", "O", ts("1997-02-03")),
        ],
        schema=LI_SCHEMA,
    )
    out = R.q15_top_supplier(li, supplier).collect()
    # suppliers 100 and 101 tie at exactly 500.0000 (DECIMAL compare) → both emitted
    assert [(r.s_suppkey, r.total_revenue) for r in out] == [(100, 500.0), (101, 500.0)]


def test_q17_small_quantity_boundary(spark):
    part = spark.createDataFrame(
        [(10, "red widget", "Brand#23", "MEDIUM", 1, 5.0)],
        schema="p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING, p_size INT, p_retailprice DOUBLE",
    )
    # part 10 quantities: 1, 10, 10, 19 → Σ=40, cnt=4, avg=10, cut = 2.
    # qty 1 qualifies (5·1·4=20 < 40); qty 10 does not (200 > 40).
    li = spark.createDataFrame(
        [
            (1, 10, 100, 1.0, 70.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
            (2, 10, 100, 10.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
            (3, 10, 100, 10.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
            (4, 10, 100, 19.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
        ],
        schema=LI_SCHEMA,
    )
    out = R.q17_small_quantity_revenue(li, part).collect()[0]
    assert out.n_small == 1
    assert out.avg_yearly == 10.0  # 70 / 7


def test_q20_having_per_supplier_part(spark, supplier):
    part = spark.createDataFrame(
        [(10, "x", "B", "PROMO", 1, 1.0), (11, "y", "B", "ECONOMY", 1, 1.0)],
        schema="p_partkey LONG, p_name STRING, p_brand STRING, p_type STRING, p_size INT, p_retailprice DOUBLE",
    )
    li = spark.createDataFrame(
        [
            # supp 100 moves 60 units of promo part 10 → qualifies
            (1, 10, 100, 60.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
            # supp 101: 30 + 30 across TWO promo parts? no — same part
            # twice but split under threshold per (supp, part)… 30+15=45 < 50
            (2, 10, 101, 30.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
            (3, 10, 101, 15.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
            # supp 102: 100 units but of a non-promo part
            (4, 11, 102, 100.0, 1.0, 0.0, 0.0, "N", "O", ts("1997-01-01")),
        ],
        schema=LI_SCHEMA,
    )
    out = R.q20_promo_suppliers(li, supplier, part).collect()
    assert [r.s_suppkey for r in out] == [100]


def test_q21_sole_late_supplier(spark, supplier):
    orders = spark.createDataFrame(
        [
            (1, 7, "F", 1.0, ts("1997-01-01"), "1-URGENT"),  # multi-supp, one late
            (2, 7, "F", 1.0, ts("1997-01-01"), "1-URGENT"),  # multi-supp, TWO late
            (3, 7, "F", 1.0, ts("1997-01-01"), "1-URGENT"),  # single-supp late
            (4, 7, "O", 1.0, ts("1997-01-01"), "1-URGENT"),  # not finished
        ],
        schema=ORD_SCHEMA,
    )
    late, ontime = ts("1997-06-01"), ts("1997-01-15")
    li = spark.createDataFrame(
        [
            (1, 10, 100, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
            (1, 10, 101, 1.0, 1.0, 0.0, 0.0, "N", "O", ontime),
            (2, 10, 100, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
            (2, 10, 101, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
            (3, 10, 100, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
            (4, 10, 100, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
        ],
        schema=LI_SCHEMA,
    )
    out = R.q21_waiting_suppliers(li, orders, supplier).collect()
    # only order 1 qualifies (≥2 suppliers, exactly one late) → supp 100 waits once
    assert [(r.s_name, r.numwait) for r in out] == [("Supplier#100", 1)]
