"""Hand-computed goldens for the text-analysis operators."""

from __future__ import annotations

import pytest

from twitter_followers_patterns_mapreduce_spark.operators import text as TX

DOCS_SCHEMA = "doc_id LONG, text STRING, lang STRING"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat", "en"),
        (2, "el perro es la casa y que un", "es"),
        (3, "x", "en"),
        (4, "hello, world! 123", "en"),
    ]
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def test_token_stats_goldens(docs):
    r = {x["doc_id"]: x for x in TX.doc_token_stats(docs).collect()}
    assert r[1]["n_tokens"] == 3
    assert r[1]["n_unique_tokens"] == 3
    assert r[1]["n_chars"] == 11
    assert r[1]["avg_token_len"] == 3.0
    assert r[1]["punct_ratio"] == 0.0
    assert r[1]["stopword_ratio"] == round(1 / 3, 6)  # "the"
    # "hello, world! 123" → whitespace tokens 3; bpe-ish: hello , world ! 123 = 5
    assert r[4]["n_tokens"] == 3
    assert r[4]["n_bpe_tokens"] == 5
    assert r[4]["punct_ratio"] == round(2 / 17, 6)


def test_language_id(docs):
    r = {x["doc_id"]: x["pred_lang"] for x in TX.doc_language_id(docs).collect()}
    assert r[1] == "en"
    assert r[2] == "es"
    assert r[3] == "und"  # no stopword hits


def test_quality_score_bounds_and_order(docs):
    r = {x["doc_id"]: x["quality_score"] for x in TX.doc_quality_score(docs).collect()}
    assert all(0.0 <= v <= 1.0 for v in r.values())
    # longer, diverse, clean text scores above the single-char doc
    assert r[2] > r[3]


def test_fingerprint_deterministic_and_fallback(spark):
    rows = [(1, "a b c d"), (2, "a b c d"), (3, "ab"), (4, "zz top hits")]
    docs = spark.createDataFrame(rows, schema="doc_id LONG, text STRING")
    r = {x["doc_id"]: x["fingerprint"] for x in TX.doc_fingerprint(docs).collect()}
    assert r[1] == r[2]  # same text → same fingerprint
    assert r[3] is not None  # <3 tokens → h64(text) fallback, non-null
    assert r[1] != r[4]


def test_token_stats_and_quality_survive_empty_docs(spark):
    """Regression: empty / whitespace-only documents (0 tokens, length 0)
    must not throw ANSI divide-by-zero; ratios read 0."""
    from twitter_followers_patterns_mapreduce_spark.operators.text import (
        doc_quality_score,
        doc_token_stats,
    )

    rows = [(1, "", "en"), (2, "   ", "en"), (3, "hello world", "en")]
    df = spark.createDataFrame(rows, schema="doc_id LONG, text STRING, lang STRING")
    stats = {r["doc_id"]: r for r in doc_token_stats(df).collect()}
    assert stats[1]["n_tokens"] == 0 and stats[1]["avg_token_len"] == 0.0
    assert stats[2]["punct_ratio"] == 0.0
    assert stats[3]["n_tokens"] == 2
    q = {r["doc_id"]: r["quality_score"] for r in doc_quality_score(df).collect()}
    assert all(v is not None for v in q.values())
    assert q[3] > q[1]


def test_curation_funnel_monotone_and_matches_curate(spark):
    """Funnel stages are monotone non-increasing and the final stage
    equals curate_documents' row count (semantics identical by
    construction — pinned here)."""
    from twitter_followers_patterns_mapreduce_spark.operators import text as TX
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    funnel = {r.stage: r.n_docs for r in TX.curation_funnel(docs).collect()}
    assert funnel["raw"] >= funnel["exact_dedup"] >= funnel["quality"] >= funnel["lang_agreement"]
    assert funnel["lang_agreement"] == TX.curate_documents(docs).count()


def test_lang_confusion_diagonal_and_shares(spark):
    from twitter_followers_patterns_mapreduce_spark.operators import text as TX

    docs = spark.createDataFrame(
        [
            (1, "the of and to in is", "en", "s", 10),   # clearly English
            (2, "el la de que los una", "es", "s", 10),  # clearly Spanish
            (3, "zqx wvv qqq", "en", "s", 10),           # no stopwords → und
        ],
        schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    got = {(r.labeled_lang, r.pred_lang): r for r in TX.lang_confusion_matrix(docs).collect()}
    assert got[("en", "en")].n_docs == 1 and got[("en", "en")].agree
    assert got[("es", "es")].n_docs == 1
    assert got[("en", "und")].n_docs == 1 and not got[("en", "und")].agree
    assert got[("en", "en")].share_of_label == 0.5 and got[("en", "und")].share_of_label == 0.5


def test_normalize_documents_cleanup(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.text import normalize_documents

    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!! #42\t(ok) "), (2, "a-b_c")],
        schema="doc_id LONG, text STRING",
    )
    rows = {r["doc_id"]: r for r in normalize_documents(df).collect()}
    assert rows[1]["norm_text"] == "hello, world!! 42 ok"
    assert rows[2]["norm_text"] == "a b c"
    assert rows[1]["orig_chars"] == len("  Hello,   WORLD!! #42\t(ok) ")
    assert rows[1]["norm_chars"] == len("hello, world!! 42 ok")


def test_pii_scan_counts_synthetic_hits(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.text import pii_scan_documents

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e.org, call +1-555-123-4567"),
            (2, "ssn 123-45-6789 card 4111 1111 1111 1111"),
            (3, "clean document with no pii at all"),
        ],
        schema="doc_id LONG, text STRING",
    )
    (row,) = pii_scan_documents(df).collect()
    assert row["n_docs"] == 3
    assert row["total_emails"] == 2
    assert row["total_phones"] >= 1
    assert row["total_ssns"] == 1
    assert row["total_cards"] == 1
    assert row["docs_with_pii"] == 2


def test_pii_phone_not_double_counted_inside_cards(spark):
    # the phone pattern alone would match '111 1111 1111' INSIDE the
    # card run; phones are counted on card-redacted text, so a card is
    # a card hit only, and a genuine phone still counts
    from twitter_followers_patterns_mapreduce_spark.operators.text import pii_scan_documents

    df = spark.createDataFrame(
        [
            (1, "card 4111 1111 1111 1111 only"),
            (2, "call 555-123-4567 and card 4111-1111-1111-1111"),
        ],
        schema="doc_id LONG, text STRING",
    )
    (row,) = pii_scan_documents(df).collect()
    assert row["total_cards"] == 2
    assert row["total_phones"] == 1


def test_gopher_quality_rules(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.text import gopher_quality

    good = " ".join(["the quick brown fox jumps over that lazy dog today"] * 6)  # 60 words
    short = "the tiny doc"
    symbols = " ".join(["the of and is ##### ... ### ..."] * 10)  # symbol-heavy, 80 words
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], schema="doc_id LONG, text STRING"
    )
    got = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert got[1]["n_words"] == 60
    assert got[1]["gopher_pass"] is True
    assert got[1]["alpha_word_ratio"] == 1.0
    assert got[2]["gopher_pass"] is False          # word-count floor
    assert got[3]["gopher_pass"] is False          # symbol ratio
    # 5 '#' + 1 '...'-triple + '...' = per repeat: '#####'(5) + '###'(3) = 8 hashes,
    # 2 '...' groups -> (8 + 2) per repeat, 10 repeats = 100 symbols / 80 words
    assert got[3]["symbol_word_ratio"] == 1.25


def test_readability_flesch_hand_case(spark):
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.text import readability_documents

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "")],
        schema="doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r for r in readability_documents(df).collect()}
    r = got[1]
    assert (r["n_words"], r["n_sentences"]) == (6, 2)
    # vowel groups: e,a,a,e,o,a -> 6 single-vowel groups
    assert r["n_syllables"] == 6
    expect = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r["flesch"] - math.floor(expect * 1e6) / 1e6) < 1e-9
    # empty doc: zero-guards, no division error
    assert got[2]["n_words"] == 0 and got[2]["n_sentences"] == 1
