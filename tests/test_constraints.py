"""Constraint gate: violations are counted exactly, the single-pass
unpivot keeps one row per check, and referential integrity flags
orphans."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators.constraints import (
    check_constraints,
    orders_quality_checks,
)


def test_check_constraints_counts_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (None, 7.0)],
        schema="k LONG, price DOUBLE",
    )
    got = {
        r["check_name"]: r
        for r in check_constraints(
            df,
            [
                ("k_not_null", "k IS NULL"),
                ("price_positive", "price IS NULL OR price <= 0"),
            ],
        ).collect()
    }
    assert got["k_not_null"]["n_violations"] == 1
    assert got["k_not_null"]["passed"] is False
    assert got["price_positive"]["n_violations"] == 2
    assert all(r["n_rows"] == 4 for r in got.values())


def test_referential_check_flags_orphans(spark):
    orders = spark.createDataFrame(
        [(1, 10, "O", None, "1-URGENT", 5.0)],
        schema="o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_orderdate TIMESTAMP, o_orderpriority STRING, o_totalprice DOUBLE",
    )
    customer = spark.createDataFrame([(99,)], schema="c_custkey LONG")
    got = {r["check_name"]: r for r in orders_quality_checks(orders, customer).collect()}
    assert got["o_custkey_references_customer"]["n_violations"] == 1
    assert got["o_orderdate_in_range"]["n_violations"] == 0  # NULL date: no range claim
    assert len(got) == 6


def test_kanonymity_audit_flags_small_groups(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.constraints import (
        kanonymity_audit,
    )

    rows = [(i, "t", "en", "web", 150) for i in range(10)]  # big safe group
    rows += [(100, "t", "zh", "rare", 999)]  # singleton → flagged
    rows += [(101, "t", "en", "web", 920), (102, "t", "en", "web", 980)]  # pair → flagged
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    got = {(r["lang"], r["source"], r["chars_bucket"]): r["group_size"]
           for r in kanonymity_audit(docs, k=5).collect()}
    assert got == {("zh", "rare", 9): 1, ("en", "web", 9): 2}


def test_ldiversity_flags_homogeneous_groups(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.constraints import ldiversity_audit

    rows = [
        # QI group (web, bucket 0): 3 docs, all 'en' → 1 distinct lang, flagged
        (1, "en", "web", 10), (2, "en", "web", 20), (3, "en", "web", 30),
        # QI group (web, bucket 1): 3 docs, 3 langs → diverse, not flagged
        (4, "en", "web", 110), (5, "es", "web", 120), (6, "de", "web", 130),
        # QI group (book, bucket 0): 4 docs, 2 langs (3 en, 1 es) → flagged at l=3
        (7, "en", "book", 10), (8, "en", "book", 20),
        (9, "en", "book", 30), (10, "es", "book", 40),
    ]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, lang STRING, source STRING, n_chars LONG"
    )
    got = {
        (r["source"], r["chars_bucket"]): (r["group_size"], r["n_langs"], r["majority_share"])
        for r in ldiversity_audit(docs, l=3).collect()
    }
    assert got == {
        ("web", 0): (3, 1, 1.0),
        ("book", 0): (4, 2, 0.75),
    }
