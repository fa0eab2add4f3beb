"""Cross-engine hash parity: the dedup/text oracles are only valid if
h64/minhash/shingles produce IDENTICAL values in Spark SQL and DuckDB.
This is the test ``functions/hashing.py`` promises (bit-for-bit md5
prefix → BIGINT parity).
"""

from __future__ import annotations

import duckdb
import pytest

from twitter_followers_patterns_mapreduce_spark.functions.hashing import (
    MINHASH_K,
    h64_sql,
    minhash_perm_sql,
    minhash_sql,
)
from twitter_followers_patterns_mapreduce_spark.functions.textfns import (
    doc_fingerprint_sql,
    shingles_sql,
    tokens_sql,
)

FIXTURE_STRINGS = [
    "the quick brown fox jumps over the lazy dog",
    "hello world",
    "a b c d e f g",
    "   leading and  multiple   spaces\tand tabs",
    "short",
    "",
    "unicode: café naïve 北京 ёж",
]


def _spark_vals(spark, expr: str) -> list:
    df = spark.createDataFrame([(s,) for s in FIXTURE_STRINGS], ["text"])
    return [r[0] for r in df.selectExpr(f"{expr} AS v").collect()]


def _duck_vals(expr: str) -> list:
    con = duckdb.connect()
    con.sql("CREATE TABLE t (text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in FIXTURE_STRINGS])
    return [r[0] for r in con.sql(f"SELECT {expr} AS v FROM t").fetchall()]


def test_h64_parity(spark):
    assert _spark_vals(spark, h64_sql("text", "spark")) == _duck_vals(
        h64_sql("text", "duckdb")
    )


@pytest.mark.parametrize("j", [0, MINHASH_K - 1])
def test_minhash_parity(spark, j):
    assert _spark_vals(spark, minhash_sql("text", j, "spark")) == _duck_vals(
        minhash_sql("text", j, "duckdb")
    )


def test_minhash_perm_matches_composed(spark):
    """minhash_perm_sql(h64(x)) must equal minhash_sql(x) — the staged
    hash-once-permute-K-times path and the direct path are one hash."""
    composed = _spark_vals(spark, minhash_perm_sql(h64_sql("text", "spark"), 3))
    direct = _spark_vals(spark, minhash_sql("text", 3, "spark"))
    assert composed == direct


def test_tokens_parity(spark):
    s = _spark_vals(spark, tokens_sql("text", "spark"))
    d = _duck_vals(tokens_sql("text", "duckdb"))
    assert s == d


def test_shingles_parity(spark):
    s = _spark_vals(spark, shingles_sql(tokens_sql("text", "spark"), 3, "spark"))
    d = _duck_vals(shingles_sql(tokens_sql("text", "duckdb"), 3, "duckdb"))
    assert [sorted(x) for x in s] == [sorted(x) for x in d]


def test_fingerprint_parity(spark):
    assert _spark_vals(spark, doc_fingerprint_sql("text", "spark")) == _duck_vals(
        doc_fingerprint_sql("text", "duckdb")
    )
