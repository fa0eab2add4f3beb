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
