"""Hand-computed goldens for the corpus operators (vocabulary, TF-IDF,
chunking, redaction) plus the PII presets on synthetic strings."""

from __future__ import annotations

import math

import pytest

from twitter_followers_patterns_mapreduce_spark.operators import corpus as CP

DOCS_SCHEMA = "doc_id LONG, text STRING"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry"),
        (3, "apple date"),
    ]
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def test_vocabulary_counts_and_docfreq(docs):
    rows = CP.doc_vocabulary(docs, min_count=2, k=10).collect()
    got = {r["token"]: (r["term_count"], r["doc_freq"]) for r in rows}
    assert got == {"apple": (3, 2), "cherry": (3, 2), "banana": (2, 2)}
    # top-k ordering: count desc, token asc
    assert [r["token"] for r in rows] == ["apple", "cherry", "banana"]


def test_vocabulary_min_count_filters(docs):
    rows = CP.doc_vocabulary(docs, min_count=3, k=10).collect()
    assert sorted(r["token"] for r in rows) == ["apple", "cherry"]


def test_tfidf_golden(docs):
    # doc 3 = "apple date": tf(date)=1/2, df(date)=1, N=3 → idf=ln(3)
    # tf(apple)=1/2, df(apple)=2 → idf=ln(1.5); date outranks apple.
    rows = CP.doc_tfidf_topk(docs, k=2).collect()
    d3 = sorted((r for r in rows if r["doc_id"] == 3), key=lambda r: r["rank"])
    assert [r["token"] for r in d3] == ["date", "apple"]
    assert d3[0]["tfidf"] == math.floor(0.5 * math.log(3.0) * 1e6) / 1e6
    assert d3[1]["tfidf"] == math.floor(0.5 * math.log(1.5) * 1e6) / 1e6


def test_tfidf_rank_is_dense_per_doc(docs):
    rows = CP.doc_tfidf_topk(docs, k=10).collect()
    for doc_id in (1, 2, 3):
        ranks = sorted(r["rank"] for r in rows if r["doc_id"] == doc_id)
        assert ranks == list(range(1, len(ranks) + 1))


@pytest.mark.parametrize(
    "text,size,stride,expected",
    [
        # shorter than one chunk → exactly one chunk, full text
        ("abcdef", 10, 5, [(0, 0, "abcdef")]),
        # len 10, size 6, stride 4 → ceil((10-6)/4)=1 → chunks at 0 and 4
        ("0123456789", 6, 4, [(0, 0, "012345"), (1, 4, "456789")]),
        # exact multiple: len 8, size 4, stride 4 → starts 0 and 4
        ("01234567", 4, 4, [(0, 0, "0123"), (1, 4, "4567")]),
        # last chunk ragged: len 9, size 4, stride 4 → starts 0, 4, 8
        ("012345678", 4, 4, [(0, 0, "0123"), (1, 4, "4567"), (2, 8, "8")]),
    ],
)
def test_chunks_boundaries(spark, text, size, stride, expected):
    df = spark.createDataFrame([(1, text)], schema=DOCS_SCHEMA)
    rows = sorted(
        CP.doc_chunks(df, size=size, stride=stride).collect(), key=lambda r: r["chunk_idx"]
    )
    got = [(r["chunk_idx"], r["chunk_start"], r["chunk_text"]) for r in rows]
    assert got == expected
    assert all(r["chunk_len"] == len(r["chunk_text"]) for r in rows)


def test_chunks_cover_text_with_overlap(spark):
    text = "x" * 1000
    df = spark.createDataFrame([(1, text)], schema=DOCS_SCHEMA)
    rows = sorted(CP.doc_chunks(df, size=200, stride=150).collect(), key=lambda r: r["chunk_idx"])
    # starts advance by stride; union of [start, start+len) covers [0, 1000)
    assert [r["chunk_start"] for r in rows] == [150 * i for i in range(len(rows))]
    assert rows[-1]["chunk_start"] + rows[-1]["chunk_len"] == 1000
    assert all(r["chunk_len"] == 200 for r in rows[:-1])


def test_redact_email_preset(spark):
    df = spark.createDataFrame(
        [(1, "mail me at alice@example.com or bob.smith+x@sub.org today"),
         (2, "no pii here")],
        schema=DOCS_SCHEMA,
    )
    r = {x["doc_id"]: x for x in CP.redact(df, CP.REDACT_PRESETS["email"]).collect()}
    assert r[1]["n_redactions"] == 2
    assert r[1]["clean_text"] == "mail me at [REDACTED] or [REDACTED] today"
    assert r[2]["n_redactions"] == 0
    assert r[2]["clean_text"] == "no pii here"


def test_redact_phone_and_ssn_presets(spark):
    df = spark.createDataFrame(
        [(1, "call +1 (555) 123-4567 now"), (2, "ssn 123-45-6789 leaked")],
        schema=DOCS_SCHEMA,
    )
    phone = {x["doc_id"]: x for x in CP.redact(df, CP.REDACT_PRESETS["phone"]).collect()}
    assert phone[1]["n_redactions"] == 1
    assert "555" not in phone[1]["clean_text"]
    ssn = {x["doc_id"]: x for x in CP.redact(df, CP.REDACT_PRESETS["ssn"]).collect()}
    assert ssn[2]["n_redactions"] == 1
    assert ssn[2]["clean_text"] == "ssn [REDACTED] leaked"


def test_redact_terms_word_boundary(spark):
    # "order" redacts, "orders"/"reorder" don't (word-boundary anchors)
    df = spark.createDataFrame([(1, "order orders reorder customer")], schema=DOCS_SCHEMA)
    r = CP.doc_redact_terms(df, terms=("customer", "order")).collect()[0]
    assert r["n_redactions"] == 2
    assert r["clean_text"] == "[REDACTED] orders reorder [REDACTED]"


# ---------------------------------------------------------------------------
# repetition stats + stratified sample
# ---------------------------------------------------------------------------

def test_repetition_stats_goldens(spark):
    from twitter_followers_patterns_mapreduce_spark.operators import text as TX

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # 1 unique of 4; top=4/4; bigrams: "a a" ×3 dup ratio 1-1/3
            (2, "w x y z"),          # all unique, no dup bigrams
            (3, "a b a b a"),        # uniq 2/5; top 3/5; bigrams: "a b","b a" → 1-2/4
            (4, "solo"),             # n=1: bigram ratio defined as 0
        ],
        schema=DOCS_SCHEMA,
    )
    r = {x["doc_id"]: x for x in TX.doc_repetition_stats(df).collect()}
    assert r[1]["dup_token_ratio"] == 0.75
    assert r[1]["top_token_ratio"] == 1.0
    assert r[1]["dup_bigram_ratio"] == round(1 - 1 / 3, 6)
    assert r[2]["dup_token_ratio"] == 0.0
    assert r[2]["top_token_ratio"] == 0.25
    assert r[2]["dup_bigram_ratio"] == 0.0
    assert r[3]["dup_token_ratio"] == round(1 - 2 / 5, 6)
    assert r[3]["top_token_ratio"] == round(3 / 5, 6)
    assert r[3]["dup_bigram_ratio"] == 0.5
    assert r[4]["dup_bigram_ratio"] == 0.0
    assert r[4]["top_token_ratio"] == 1.0


def test_stratified_sample_deterministic_and_sized(spark):
    from twitter_followers_patterns_mapreduce_spark.operators import splits as SP

    rows = [(i, f"text {i}", ["en", "es", "de"][i % 3], len(f"text {i}")) for i in range(60)]
    df = spark.createDataFrame(rows, schema="doc_id LONG, text STRING, lang STRING, n_chars LONG")
    got1 = SP.stratified_sample(df, per_stratum=5).collect()
    # exactly 5 per stratum, ranks 1..5
    by_lang = {}
    for r in got1:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "es", "de"}
    for lang, rs in by_lang.items():
        assert sorted(x["sample_rank"] for x in rs) == [1, 2, 3, 4, 5]
    # deterministic: same membership after a repartition (order-insensitive)
    got2 = SP.stratified_sample(df.repartition(7), per_stratum=5).collect()
    key = lambda r: (r["lang"], r["sample_rank"], r["doc_id"])
    assert sorted(map(key, got1)) == sorted(map(key, got2))


def test_chunk_dedup_stats_detects_shared_boilerplate(spark):
    # two docs share an identical 200-char head chunk; doc-level exact
    # dedup would keep both, chunk-level stats see the duplication
    boiler = "b" * 200
    df = spark.createDataFrame(
        [(1, boiler + "tail-one", "en"), (2, boiler + "tail-two", "en"), (3, "c" * 120, "de")],
        schema="doc_id LONG, text STRING, lang STRING",
    )
    r = {x["lang"]: x for x in CP.chunk_dedup_stats(df, size=200, stride=200).collect()}
    # en: docs 1,2 → chunks [b*200, tail-one], [b*200, tail-two] → 4 chunks, 3 unique
    assert r["en"]["n_chunks"] == 4
    assert r["en"]["n_unique_chunks"] == 3
    assert r["en"]["dup_chunk_ratio"] == 0.25
    assert r["de"]["n_chunks"] == 1
    assert r["de"]["dup_chunk_ratio"] == 0.0


def test_corpus_training_set_composes(spark):
    # 6 'en' docs that pass curation (quality needs some length and
    # diversity; en stopwords so lang-id agrees), two sharing one
    # identical chunk-sized head; summary must count the shared chunk ONCE
    base = ("the quick brown fox jumps over a lazy dog and then it runs "
            "to the old stone bridge where a quiet river bends south ")
    boiler = ("z" * 50).join([""])  # distinct filler head
    rows = [(i, base + f"unique tail number {i} of the story", "en") for i in range(4)]
    rows += [(10, "the " + "shared head " * 30 + "ending one", "en"),
             (11, "the " + "shared head " * 30 + "ending two", "en")]
    df = spark.createDataFrame(rows, schema="doc_id LONG, text STRING, lang STRING")
    out = {r["lang"]: r for r in
           __import__("twitter_followers_patterns_mapreduce_spark.operators.corpus",
                      fromlist=["corpus_training_set"]).corpus_training_set(df).collect()}
    assert "en" in out
    r = out["en"]
    assert r["n_docs"] >= 2            # curation kept some docs
    assert r["n_chunks"] >= r["n_docs"]  # every kept doc yields >= 1 chunk
    # duplicate-chunk dedup: chunk totals < raw chunk count when the two
    # shared-head docs both survive (their first chunks are identical)
    from twitter_followers_patterns_mapreduce_spark.operators.corpus import doc_chunks
    raw = doc_chunks(df).count()
    assert r["n_chunks"] < raw


def test_token_chunks_goldens(spark):
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6"), (2, "a b"), (3, "x")],
        schema=DOCS_SCHEMA,
    )
    rows = CP.doc_token_chunks(df, window=4, stride=3).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["token_start"], r["n_tokens"], r["chunk_text"])
           for r in rows}
    # doc 1: 7 tokens, windows at 0 and 3 (ceil((7-4)/3)=1)
    assert got[(1, 0)] == (0, 4, "t0 t1 t2 t3")
    assert got[(1, 1)] == (3, 4, "t3 t4 t5 t6")
    # doc 2: shorter than one window → single ragged chunk
    assert got[(2, 0)] == (0, 2, "a b")
    assert got[(3, 0)] == (0, 1, "x")
    assert len(got) == 4


def test_oov_rate_against_tiny_vocab(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.corpus import doc_oov_rate

    docs = spark.createDataFrame(
        [
            (1, "aa aa aa bb", "en", "web", 11),   # aa x3, bb x1
            (2, "aa zz yy xx", "en", "web", 11),   # aa in vocab, 3 OOV
        ],
        schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    # min_count=2: vocab = {aa} only (bb/zz/yy/xx occur once)
    got = {r["doc_id"]: r for r in doc_oov_rate(docs, min_count=2, k=10).collect()}
    assert got[1]["n_tokens"] == 4 and got[1]["n_oov"] == 1
    assert got[1]["oov_rate"] == 0.25
    assert got[2]["n_oov"] == 3 and got[2]["oov_rate"] == 0.75


def test_token_surprisal_golden(spark):
    """Hand-computed: N=8 tokens → len(bin(8))=4; count(a)=6 → 3 bits of
    surprisal 1 each; count(b)=count(c)=1 → 3 bits each."""
    rows = [(1, "a a a a"), (2, "a a b c")]
    df = spark.createDataFrame(rows, schema="doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in CP.doc_token_surprisal(df).collect()}
    assert got[1]["n_tokens"] == 4 and got[1]["sum_bits"] == 4
    assert got[1]["mean_surprisal_bits"] == 1.0
    assert got[2]["n_tokens"] == 4 and got[2]["sum_bits"] == 8
    assert got[2]["mean_surprisal_bits"] == 2.0


def test_token_surprisal_rare_scores_above_common(spark):
    """A doc of one-off tokens must outscore a doc of the corpus's most
    common token."""
    rows = [(1, "the the the the the the the the"), (2, "zyx wvu tsr qpo")]
    df = spark.createDataFrame(rows, schema="doc_id LONG, text STRING")
    got = {r["doc_id"]: r["mean_surprisal_bits"] for r in CP.doc_token_surprisal(df).collect()}
    assert got[2] > got[1]


def test_token_surprisal_bounds(spark):
    """Property: per-token surprisal lies in [0, len(bin(N)) - 1], so the
    per-doc mean must too; n_tokens sums to the corpus total."""
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = CP.doc_token_surprisal(docs).collect()
    n_total = sum(r["n_tokens"] for r in rows)
    ceiling = len(bin(n_total)) - 2  # bin() prefixes '0b'
    assert n_total > 0
    for r in rows:
        assert 0.0 <= r["mean_surprisal_bits"] <= ceiling


def test_pack_sequences_golden(spark):
    # seq_len=5, window=2: doc 1 chunks (2,2,1) tokens, doc 2 chunks (2,1);
    # exclusive prefixes 0,2,4,5,7 → seq 0 gets doc 1 entirely (5 tokens,
    # fill 1.0), seq 1 gets doc 2 (3 tokens, fill 0.6)
    rows = [(1, "a b c d e", "en"), (2, "f g h", "en")]
    docs = spark.createDataFrame(rows, schema="doc_id LONG, text STRING, lang STRING")
    got = {
        (r["lang"], r["seq_id"]): (r["n_docs"], r["n_chunks"], r["n_tokens"], r["fill_ratio"])
        for r in CP.pack_sequences(docs, seq_len=5, window=2).collect()
    }
    assert got == {("en", 0): (1, 3, 5, 1.0), ("en", 1): (1, 2, 3, 0.6)}


def test_pack_sequences_partitioned_by_lang(spark):
    # each lang packs independently: same prefix arithmetic per lang
    rows = [(1, "a b c", "en"), (2, "x y z", "fr")]
    docs = spark.createDataFrame(rows, schema="doc_id LONG, text STRING, lang STRING")
    got = {
        (r["lang"], r["seq_id"]): r["n_tokens"]
        for r in CP.pack_sequences(docs, seq_len=4, window=2).collect()
    }
    assert got == {("en", 0): 3, ("fr", 0): 3}


def test_bpe_pair_counts_golden(spark):
    from twitter_followers_patterns_mapreduce_spark.operators import corpus as CP

    docs = spark.createDataFrame(
        [(1, "aba ab X 7 a", "en", "s", 12), (2, "ab", "en", "s", 2)],
        schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    out = [(r.pair, r.n_occurrences) for r in CP.bpe_pair_counts(docs, k=10).collect()]
    # words: aba(1), ab(2 — once per doc; 'X' lowercases to x len-1 skip,
    # '7' non-letter skip, 'a' len-1 skip) → pairs: ab:1+2=3, ba:1
    assert out == [("ab", 3), ("ba", 1)]


def test_token_budget_shares_sum_to_one(spark):
    from twitter_followers_patterns_mapreduce_spark.operators import corpus as CP

    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "web", 13),
            (2, "uno dos", "es", "web", 7),
            (3, "a b c d e", "en", "books", 9),
        ],
        schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    rows = CP.corpus_token_budget(docs).collect()
    got = {(r.source, r.lang): (r.n_docs, r.n_tokens, r.token_share) for r in rows}
    assert got[("web", "en")] == (1, 3, 0.3)
    assert got[("web", "es")] == (1, 2, 0.2)
    assert got[("books", "en")] == (1, 5, 0.5)
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

def test_bm25_golden_single_term(spark):
    """One query term, hand-computed: N=3, avgdl=3, term 'x' in docs 1
    (tf=2, dl=3) and 2 (tf=1, dl=3); idf = ln(1 + (3-2+0.5)/(2+0.5)) =
    ln(1.6); dl=avgdl makes the length norm collapse to
    tf*2.2/(tf+1.2)."""
    rows = [(1, "x x a"), (2, "x b c"), (3, "d e f")]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    got = {
        r["doc_id"]: (r["n_terms"], r["bm25"])
        for r in CP.doc_bm25_topk(docs, terms=("x",), k=10).collect()
    }
    idf = math.log(1.6)
    exp1 = math.floor(idf * (2 * 2.2 / (2 + 1.2)) * 1e6) / 1e6
    exp2 = math.floor(idf * (1 * 2.2 / (1 + 1.2)) * 1e6) / 1e6
    assert got == {1: (1, exp1), 2: (1, exp2)}
    assert got[1][1] > got[2][1]  # higher tf wins at equal length


def test_bm25_length_normalization_prefers_short_doc(spark):
    # same tf, shorter doc scores higher (b > 0)
    rows = [(1, "x a"), (2, "x a b c d e f g")]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    got = {r["doc_id"]: r["bm25"] for r in CP.doc_bm25_topk(docs, terms=("x",), k=10).collect()}
    assert got[1] > got[2]


def test_bm25_rare_term_outscores_common(spark):
    # 'rare' appears in 1 of 4 docs, 'common' in all 4 — at equal tf/dl
    # the rare-term doc must rank first
    rows = [
        (1, "rare common pad"),
        (2, "common pad pad"),
        (3, "common pad pad"),
        (4, "common pad pad"),
    ]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    out = CP.doc_bm25_topk(docs, terms=("rare", "common"), k=10).collect()
    assert out[0]["doc_id"] == 1 and out[0]["n_terms"] == 2


def test_bm25_no_match_yields_empty(spark):
    docs = spark.createDataFrame([(1, "a b c")], schema=DOCS_SCHEMA)
    assert CP.doc_bm25_topk(docs, terms=("zzz",), k=5).count() == 0


# ---------------------------------------------------------------------------
# Bigram surprisal
# ---------------------------------------------------------------------------

def test_bigram_surprisal_golden(spark):
    """Corpus bigrams: 'a b' ×2, 'a c' ×1, 'b a' ×1 → prefix a:3, b:1.
    bits(a→b) = len(bin(3)) - len(bin(2)) = 0; bits(a→c) = 2-1 = 1;
    bits(b→a) = 1-1 = 0."""
    rows = [(1, "a b a c"), (2, "a b")]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_bits"])
        for r in CP.doc_bigram_surprisal(docs).collect()
    }
    # doc 1 bigrams: (a,b) 0 bits, (b,a) 0 bits, (a,c) 1 bit
    assert got == {1: (3, 1), 2: (1, 0)}


def test_bigram_surprisal_short_docs_drop(spark):
    rows = [(1, "solo"), (2, ""), (3, "a b")]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    assert [r["doc_id"] for r in CP.doc_bigram_surprisal(docs).collect()] == [3]


def test_bigram_surprisal_repetitive_below_novel(spark):
    # pure repetition = fully predictable transitions = 0 bits/bigram
    rows = [(1, "x y x y x y x y"), (2, "p q r s t u v w")]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    got = {r["doc_id"]: r["mean_bigram_bits"] for r in CP.doc_bigram_surprisal(docs).collect()}
    assert got[1] <= got[2]


# ---------------------------------------------------------------------------
# BPE training
# ---------------------------------------------------------------------------

def test_bpe_train_low_lower_golden(spark):
    """The Sennrich paper's running example: low ×3, lower ×2.
    Pairs: (l,o)=5, (o,w)=5, (w,e)=2, (e,r)=2 → round 1 is the tie
    (l,o) vs (o,w), lexicographic s1 picks (l,o); round 2 merges
    (lo,w)=5; round 3 ties (low,e)=2 vs (e,r)=2 → (e,r); round 4
    merges (low,er)=2."""
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low lower")], schema=DOCS_SCHEMA
    )
    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in CP.corpus_bpe_train(docs, rounds=4).collect()
    ]
    assert got == [
        (1, "l", "o", "lo", 5),
        (2, "lo", "w", "low", 5),
        (3, "e", "r", "er", 2),
        (4, "low", "er", "lower", 2),
    ]


def test_bpe_train_repeated_run_semantics(spark):
    """Pins the declared replace() semantics on single-symbol runs:
    'aaaa' round 1 merges (a,a)=3 occurrences counted, rewrite yields
    [aa,a,a] (scanner resumes past the consumed delimiter), so round 2
    sees (aa,a)=1 and (a,a)=1 and merges (a,a) lexicographically."""
    docs = spark.createDataFrame([(1, "aaaa")], schema=DOCS_SCHEMA)
    got = [
        (r["round"], r["merged"], r["pair_count"])
        for r in CP.corpus_bpe_train(docs, rounds=2).collect()
    ]
    assert got == [(1, "aa", 3), (2, "aa", 1)]


def test_bpe_train_stops_when_fully_merged(spark):
    # "ab" ×1: round 1 merges (a,b); nothing left → early stop
    docs = spark.createDataFrame([(1, "ab")], schema=DOCS_SCHEMA)
    got = CP.corpus_bpe_train(docs, rounds=5).collect()
    assert [(r["round"], r["merged"]) for r in got] == [(1, "ab")]


def test_bpe_train_skips_non_alnum_words(spark):
    # punctuation-bearing tokens are excluded from the vocabulary
    docs = spark.createDataFrame([(1, "a|b a|b cd cd cd")], schema=DOCS_SCHEMA)
    got = [(r["merged"], r["pair_count"]) for r in CP.corpus_bpe_train(docs, rounds=1).collect()]
    assert got == [("cd", 3)]


def test_bpe_train_rejects_bad_rounds(spark):
    docs = spark.createDataFrame([(1, "ab")], schema=DOCS_SCHEMA)
    with pytest.raises(ValueError):
        CP.corpus_bpe_train(docs, rounds=0)


def test_bpe_encode_stats_compression(spark):
    """low×3 + lower×2: merges (lo,low,er,lower?) at rounds=2 →
    'low' encodes to 1 symbol, 'lower' to [low,e,r] = 3 symbols;
    chars_total = 3*3 + 5*2 = 19, symbols_after = 3*1 + 2*3 = 9."""
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "low lower")], schema=DOCS_SCHEMA
    )
    docs = docs.selectExpr("doc_id", "text", "'web' AS source")
    r = CP.corpus_bpe_encode_stats(docs, rounds=2).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["n_words"], row["chars_total"], row["symbols_after"]) == (5, 19, 9)
    import math as _m
    assert row["compression"] == _m.floor(19 / 9 * 1e6) / 1e6


def test_zipf_fit_matches_numpy_on_floored_logs(spark):
    import math

    import numpy as np

    from twitter_followers_patterns_mapreduce_spark.operators.corpus import zipf_fit

    # corpus with a clean frequency spectrum: word i repeated counts[i] times
    counts = [40, 20, 13, 10, 8, 6, 5, 4]
    text = " ".join(f"w{i}" * 1 for i in range(len(counts)))  # placeholder
    docs = [(1, " ".join(" ".join([f"w{i}"] * c) for i, c in enumerate(counts)))]
    df = spark.createDataFrame(docs, schema="doc_id LONG, text STRING")
    (row,) = zipf_fit(df).collect()
    assert row["n_types"] == len(counts)
    x = np.array([math.floor(math.log(r) * 1e9) / 1e9 for r in range(1, len(counts) + 1)])
    y = np.array([math.floor(math.log(c) * 1e9) / 1e9 for c in sorted(counts, reverse=True)])
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row["slope"] - slope) < 1e-5
    assert abs(row["intercept"] - intercept) < 1e-5
    assert -1.3 < row["slope"] < -0.7  # this spectrum is Zipf-ish by construction


def test_temperature_mixture_sqrt_shares_and_determinism(spark):
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.corpus import (
        corpus_temperature_mixture,
    )

    rows = [(i, f"text {i}", "en", "srcA", 10) for i in range(16)] + [
        (100 + i, f"text {100 + i}", "en", "srcB", 10) for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    out = {r["source"]: r for r in corpus_temperature_mixture(df).collect()}
    wa, wb = math.floor(4.0 * 1e6), math.floor(2.0 * 1e6)  # sqrt(16), sqrt(4)
    tot = wa + wb
    assert out["srcA"]["share6"] == math.floor(wa / tot * 1e6) / 1e6
    assert out["srcB"]["share6"] == math.floor(wb / tot * 1e6) / 1e6
    # target = 20 // 2 = 10 docs: A gets 10*(2/3)/16, B 10*(1/3)/4
    assert out["srcA"]["threshold"] == math.floor(wa / tot * 10 / 16 * 1e6)
    assert out["srcB"]["threshold"] == math.floor(wb / tot * 10 / 4 * 1e6)
    # tau < 1 upsamples the tail: B's keep RATE must exceed A's
    assert out["srcB"]["threshold"] > out["srcA"]["threshold"]
    assert 0 <= out["srcA"]["n_kept"] <= 16 and 0 <= out["srcB"]["n_kept"] <= 4
    again = {r["source"]: r["n_kept"] for r in corpus_temperature_mixture(df).collect()}
    assert again == {s: r["n_kept"] for s, r in out.items()}


def test_doc_keyphrases_rank_by_corpus_pmi(spark):
    """Phrase pairs that always co-occur outrank promiscuous pairs, the
    min_count floor drops hapax bigrams, and ranks are per-doc."""
    from twitter_followers_patterns_mapreduce_spark.operators.corpus import doc_keyphrases

    # "alpha beta" always adjacent (PMI high); "the xN" spreads "the"
    # over many successors (PMI low); "rare once" appears once (floored)
    docs = spark.createDataFrame(
        [
            (i, f"alpha beta the x{i} the x{i + 1} rare once" if i == 0
             else f"alpha beta the x{i} the x{i + 1}")
            for i in range(8)
        ],
        schema="doc_id LONG, text STRING",
    )
    out = doc_keyphrases(docs, min_count=5, per_doc=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(8))
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        # the always-adjacent pair ranks first everywhere
        assert (rows[0]["t1"], rows[0]["t2"]) == ("alpha", "beta")
        assert all((r["t1"], r["t2"]) != ("rare", "once") for r in rows)


def test_corpus_mixture_ivm_closed_form_and_differential(spark):
    """IVM recipe on a hand-computable corpus: source A has 4 docs
    (2 even + 2 odd ids, exercising BOTH the base and delta slices),
    source B has 1.  w6 = floor(sqrt(n)*1e6): A 2e6, B 1e6; tw6 3e6;
    n_total div 2 = 2.  And differentially: the IVM output equals a
    direct single-pass recompute of the same formulas."""
    from twitter_followers_patterns_mapreduce_spark.operators.corpus import (
        corpus_mixture_ivm,
    )

    rows = [
        (0, "t", "en", "A", 10),
        (1, "t", "en", "A", 20),
        (2, "t", "en", "A", 30),
        (3, "t", "en", "A", 40),
        (4, "t", "en", "B", 50),
    ]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    got = {r["source"]: r for r in corpus_mixture_ivm(docs, keep_div=2).collect()}
    a, b = got["A"], got["B"]
    assert (a["n_docs"], a["n_chars"], a["w6"]) == (4, 100, 2_000_000)
    assert (b["n_docs"], b["n_chars"], b["w6"]) == (1, 50, 1_000_000)
    assert a["share6"] == 0.666666 and b["share6"] == 0.333333
    # budgets: share * (n_total div keep_div) = share * 2
    assert a["target_docs"] == 1 and b["target_docs"] == 0
    # thresholds: floor(min(1, share*2/n_docs)*1e6)
    assert a["threshold"] == 333_333
    assert b["threshold"] == 666_666


def test_collocation_communities_closed_form(spark):
    """Hand-built collocation graph: doc 1 repeats 'alpha beta' (one
    2-token community), docs 2-3 chain gamma-delta-epsilon through the
    shared token delta (one 3-token community glued transitively).
    Community label = lexicographically smallest reachable token."""
    from twitter_followers_patterns_mapreduce_spark.operators.corpus import (
        collocation_communities,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta " * 6),
            (2, "gamma delta " * 6),
            (3, "delta epsilon " * 6),
        ],
        "doc_id long, text string",
    )
    got = {
        r["token"]: r["community"]
        for r in collocation_communities(docs, min_count=5, n_edges=100).collect()
    }
    assert got == {
        "alpha": "alpha",
        "beta": "alpha",
        "gamma": "delta",
        "delta": "delta",
        "epsilon": "delta",
    }
