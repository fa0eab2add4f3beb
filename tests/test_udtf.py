"""Python UDTF sentence explosion: golden on hand-built docs, including
the index-before-filter and spaces-only-trim contract the oracle pins."""

from __future__ import annotations

from twitter_followers_patterns_mapreduce_spark.functions.udtfs import doc_sentences


def test_udtf_sentences_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello world. Second one.  . Third"),
            (2, ""),
            (3, None),
        ],
        schema="doc_id LONG, text STRING",
    )
    got = sorted(map(tuple, doc_sentences(docs).collect()))
    # doc 1 parts: ['Hello world', ' Second one', '  ', ' Third'] →
    # index 2 is whitespace-only and is filtered, indices keep pre-filter positions
    assert got == [
        (1, 0, "Hello world"),
        (1, 1, "Second one"),
        (1, 3, "Third"),
    ]


def test_grouped_agg_pandas_udafs(spark):
    """§2.8 UDAF surface: Series→scalar pandas_udf in groupBy().agg —
    exact median / MAD per group vs hand values."""
    from twitter_followers_patterns_mapreduce_spark.functions.udafs import (
        count_udaf,
        mad_udaf,
        median_udaf,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.5), ("a", 3.5), ("a", 7.0), ("b", 5.0)],
        schema="grp STRING, v DOUBLE",
    )
    out = {
        r["grp"]: r
        for r in df.groupBy("grp")
        .agg(
            count_udaf("v").alias("n"),
            median_udaf("v").alias("med"),
            mad_udaf("v").alias("mad"),
        )
        .collect()
    }
    assert out["a"]["n"] == 4 and out["a"]["med"] == 3.0
    # |x - 3.0| = [2.0, 0.5, 0.5, 4.0] → median = 1.25
    assert out["a"]["mad"] == 1.25
    assert out["b"]["n"] == 1 and out["b"]["med"] == 5.0 and out["b"]["mad"] == 0.0
