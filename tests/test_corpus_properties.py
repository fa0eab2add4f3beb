"""Property tests (hypothesis) and streaming-composability proofs for
the corpus operators.

The streaming tests demonstrate the structural claim that stateless
corpus transforms (chunking, redaction) are streaming-safe as-is: the
SAME operator function applied to a ``readStream`` DataFrame runs
unmodified in a micro-batch query and emits exactly the batch result —
no separate streaming implementation needed (Structured Streaming's
incrementalization of stateless plans).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators import corpus as CP

DOCS_SCHEMA = "doc_id LONG, text STRING"

# ---------------------------------------------------------------------------
# hypothesis: chunk covering/reconstruction invariants
# ---------------------------------------------------------------------------

texts = st.text(
    alphabet=st.sampled_from("ab x"), min_size=1, max_size=400
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(text=texts, size=st.integers(2, 50), overlap=st.integers(0, 1))
def test_chunks_cover_and_reconstruct(spark, text, size, overlap):
    """Every char of the doc appears in some chunk at its exact offset,
    and stitching chunks at stride offsets reproduces the text."""
    stride = size - overlap * (size // 2)
    df = spark.createDataFrame([(1, text)], schema=DOCS_SCHEMA)
    rows = sorted(
        CP.doc_chunks(df, size=size, stride=stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # coverage: chunk i starts at i*stride; last chunk reaches the end
    assert rows[0]["chunk_start"] == 0
    assert rows[-1]["chunk_start"] + rows[-1]["chunk_len"] == len(text)
    rebuilt = {}
    for r in rows:
        for off, ch in enumerate(r["chunk_text"]):
            pos = r["chunk_start"] + off
            # overlapping chunks must agree on shared positions
            assert rebuilt.setdefault(pos, ch) == ch
    assert "".join(rebuilt[i] for i in range(len(text))) == text


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.text(alphabet=st.sampled_from("abc "), min_size=0, max_size=60),
        min_size=1,
        max_size=6,
    )
)
def test_vocabulary_matches_counter(spark, docs):
    """doc_vocabulary ≡ collections.Counter on the same tokenization."""
    from collections import Counter

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    got = {
        r["token"]: (r["term_count"], r["doc_freq"])
        for r in CP.doc_vocabulary(df, min_count=1, k=1000).collect()
    }
    tc: Counter = Counter()
    dfreq: Counter = Counter()
    for t in docs:
        toks = [x for x in t.split() if x]
        tc.update(toks)
        dfreq.update(set(toks))
    assert got == {w: (tc[w], dfreq[w]) for w in tc}


# ---------------------------------------------------------------------------
# streaming: stateless corpus ops run unmodified on a stream
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs_stream_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docs_stream"))
    rows = [
        (1, "order alpha beta"),
        (2, "x" * 250),
        (3, "customer gamma order"),
        (4, "plain text here"),
    ]
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    df.repartition(2).write.mode("overwrite").parquet(path)
    return path


def _drain(stream_df, name):
    from twitter_followers_patterns_mapreduce_spark.streaming.windows import (
        run_available_now,
    )

    run_available_now(stream_df, name, output_mode="append")
    return name


def test_redact_is_streaming_safe(spark, docs_stream_dir):
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    batch = spark.read.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    name = _drain(CP.doc_redact_terms(stream, terms=("customer", "order")), "redact_stream")
    got = {r["doc_id"]: r for r in spark.table(name).collect()}
    want = {r["doc_id"]: r for r in CP.doc_redact_terms(batch, terms=("customer", "order")).collect()}
    assert {k: (v["n_redactions"], v["clean_text"]) for k, v in got.items()} == {
        k: (v["n_redactions"], v["clean_text"]) for k, v in want.items()
    }
    assert got[1]["n_redactions"] == 1 and got[3]["n_redactions"] == 2


def test_chunks_are_streaming_safe(spark, docs_stream_dir):
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    batch = spark.read.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    name = _drain(CP.doc_chunks(stream, size=100, stride=80), "chunks_stream")
    key = lambda r: (r["doc_id"], r["chunk_idx"], r["chunk_start"], r["chunk_text"])
    got = sorted(map(key, spark.table(name).collect()))
    want = sorted(map(key, CP.doc_chunks(batch, size=100, stride=80).collect()))
    assert got == want and len(got) >= 5  # doc 2 (250 chars) yields 3 chunks


def test_vocabulary_agg_is_streaming_safe(spark, docs_stream_dir):
    """Stateful streaming form of the vocabulary aggregation: the same
    explode+groupBy body runs over micro-batches in complete mode and
    converges to the batch counts (Structured Streaming keeps the
    running aggregation state; no separate streaming implementation)."""
    from twitter_followers_patterns_mapreduce_spark.functions.textfns import tokens_sql
    from twitter_followers_patterns_mapreduce_spark.streaming.windows import (
        run_available_now,
    )

    def vocab_body(df):
        toks = df.selectExpr("doc_id", f"{tokens_sql('text', 'spark')} AS toks")
        ex = toks.select(F.explode_outer("toks").alias("token")).where(
            F.col("token").isNotNull()
        )
        return ex.groupBy("token").count()

    stream = spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        docs_stream_dir
    )
    run_available_now(vocab_body(stream), "vocab_stream", output_mode="complete")
    got = {r["token"]: r["count"] for r in spark.table("vocab_stream").collect()}
    batch = spark.read.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    want = {r["token"]: r["count"] for r in vocab_body(batch).collect()}
    assert got == want and len(want) >= 5


# ---------------------------------------------------------------------------
# hypothesis: surprisal equals a pure-Python recomputation
# ---------------------------------------------------------------------------

@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=6),
        min_size=1,
        max_size=6,
    )
)
def test_token_surprisal_matches_python_oracle(spark, token_lists):
    """mean_surprisal_bits == avg over tokens of
    (len(bin(N)) - len(bin(count))) recomputed in pure Python."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    got = {r["doc_id"]: r for r in CP.doc_token_surprisal(df).collect()}

    from collections import Counter

    all_tokens = [t for toks in token_lists for t in toks]
    counts = Counter(all_tokens)
    n_total = len(all_tokens)
    bits = {t: len(bin(n_total)) - len(bin(c)) for t, c in counts.items()}
    for i, toks in enumerate(token_lists):
        want_sum = sum(bits[t] for t in toks)
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["sum_bits"] == want_sum
        assert got[i]["mean_surprisal_bits"] == round(want_sum / len(toks), 6)


def test_pack_sequences_conserves_tokens(spark):
    # packing must move every token of every non-empty chunk into exactly
    # one sequence: per-lang token totals are conserved and sequence ids
    # start at 0 with no gaps
    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.operators.corpus import (
        doc_token_chunks,
        pack_sequences,
    )

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(1 + (i * 7) % 11)), ["en", "fr"][i % 2])
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, schema="doc_id LONG, text STRING, lang STRING")
    packed = pack_sequences(docs, seq_len=16, window=4).collect()
    chunks = (
        doc_token_chunks(docs, window=4, stride=4)
        .where(F.col("n_tokens") > 0)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    )
    want_totals = {r["lang"]: r["total"] for r in chunks}
    got_totals = {}
    seq_ids = {}
    for r in packed:
        got_totals[r["lang"]] = got_totals.get(r["lang"], 0) + r["n_tokens"]
        seq_ids.setdefault(r["lang"], set()).add(r["seq_id"])
        assert r["n_chunks"] >= 1 and r["n_tokens"] >= 1
    assert got_totals == want_totals
    for lang, ids in seq_ids.items():
        assert ids == set(range(len(ids))), f"gapped seq ids for {lang}"
