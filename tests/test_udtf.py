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
