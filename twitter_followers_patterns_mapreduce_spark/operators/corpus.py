"""Corpus-level training-data operators over ``documents``: vocabulary
building, TF-IDF term weighting, fixed-size chunking, and regex
redaction (PII-scrub machinery).

Extension surface (the reference has no text processing beyond
split/concat, SURVEY.md §2.6); these are the standard corpus-prep steps
of an LLM data pipeline.  Like ``operators/text.py``, every operator is
expressed once and emitted in two dialects — Spark SQL (inside
whole-stage codegen, zero Python UDFs) and DuckDB (the oracle) — so
parity is by construction.

Scale notes (100 TB):
- ``doc_vocabulary`` is one map-side-combinable hash aggregation keyed
  by token, then a distributed top-k (``orderBy().limit()`` →
  TakeOrderedAndProject: per-partition heaps, single small merge; no
  global sort of the vocabulary).
- ``doc_tfidf_topk`` carries the per-doc token count *through* the
  explode (scan-side ``size(toks)``) so term frequency needs no second
  shuffle by doc; document frequency is a second hash-agg keyed by
  token; the final per-doc top-k window partitions by ``doc_id`` —
  never a global window.
- ``doc_chunks`` is embarrassingly parallel (generate + substring, no
  shuffle at all).
- ``doc_redact_terms`` is a pure projection (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from twitter_followers_patterns_mapreduce_spark.functions.checkpoint import lazy_ckpt
from twitter_followers_patterns_mapreduce_spark.functions.textfns import tokens_sql

# PII-style redaction presets. The synthetic corpus contains no
# digits/emails (vacuously green oracles are worthless), so the
# *registered* query redacts corpus words; the presets exercise the
# same machinery and are covered by unit tests on synthetic strings.
REDACT_PRESETS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def _term_pattern(terms: tuple[str, ...]) -> str:
    """Word-boundary alternation over LITERAL terms: each term is
    regex-escaped, so 'a.b' cannot match 'axb' and a term like 'c++'
    cannot produce an invalid pattern (both Spark's Java regex and
    DuckDB's RE2 accept escaped punctuation identically)."""
    import re as _re

    return r"\b(" + "|".join(_re.escape(t) for t in terms) + r")\b"


# ---------------------------------------------------------------------------
# Vocabulary
# ---------------------------------------------------------------------------

def doc_vocabulary(df: DataFrame, min_count: int = 5, k: int = 100) -> DataFrame:
    """Corpus vocabulary: token → total occurrences + document frequency,
    kept when seen ≥ ``min_count`` times, top-``k`` by count.

    Plan: stage tokens as their own projection (CollapseProject keeps the
    multi-referenced array out of the explode lambda), ``explode_outer``
    (no inferred scan-side ``size>0`` filter re-running the tokenizer —
    see the staged-projection notes in operators/dedup.py), one hash-agg
    with map-side partial aggregation, TakeOrderedAndProject for top-k.
    """
    toks = df.selectExpr("doc_id", f"{tokens_sql('text', 'spark')} AS toks")
    exploded = (
        toks.select("doc_id", F.explode_outer("toks").alias("token"))
        .where(F.col("token").isNotNull())
    )
    return (
        exploded.groupBy("token")
        .agg(
            F.count("*").alias("term_count"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .where(F.col("term_count") >= min_count)
        .orderBy(F.desc("term_count"), F.asc("token"))
        .limit(k)
    )


def doc_vocabulary_oracle(min_count: int = 5, k: int = 100) -> str:
    toks = tokens_sql("text", "duckdb")
    return f"""
        SELECT token,
               count(*) AS term_count,
               count(DISTINCT doc_id) AS doc_freq
        FROM (SELECT doc_id, unnest({toks}) AS token FROM documents)
        GROUP BY token
        HAVING count(*) >= {min_count}
        ORDER BY term_count DESC, token ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------

def doc_tfidf_topk(df: DataFrame, k: int = 5) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    tf = occurrences / doc tokens; idf = ln(N / df); the score is
    floored to 6 dp via exact integer arithmetic (``floor(x*1e6)/1e6``)
    so Spark and DuckDB agree bit-for-bit, and the per-doc rank breaks
    ties on the token so row selection is deterministic.
    """
    toks = df.selectExpr("doc_id", f"{tokens_sql('text', 'spark')} AS toks")
    exploded = (
        toks.selectExpr("doc_id", "size(toks) AS n_toks", "toks")
        .select("doc_id", "n_toks", F.explode_outer("toks").alias("token"))
        .where(F.col("token").isNotNull())
    )
    tf = exploded.groupBy("doc_id", "n_toks", "token").agg(F.count("*").alias("cnt"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    # Global doc count, attached via a BroadcastHashJoin on a
    # data-derived always-zero key (a literal key would be constant-
    # folded and a bare crossJoin would plan BroadcastNestedLoopJoin —
    # this keeps the engine's "no cross-join nodes" invariant intact).
    n_docs = df.select(F.count("*").alias("n_docs")).selectExpr(
        "n_docs", "n_docs - n_docs AS _k"
    )
    scored = (
        tf.join(dfreq, "token")
        .withColumn("_k", F.expr("pmod(cnt, 1)"))
        .join(F.broadcast(n_docs), "_k")
        .selectExpr(
            "doc_id",
            "token",
            "floor((CAST(cnt AS DOUBLE) / n_toks) * ln(CAST(n_docs AS DOUBLE) / df) * 1e6)"
            " / 1e6 AS tfidf",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "token", "tfidf")
    )


def doc_tfidf_topk_oracle(k: int = 5) -> str:
    toks = tokens_sql("text", "duckdb")
    return f"""
        WITH exploded AS (
            SELECT doc_id, len({toks}) AS n_toks, unnest({toks}) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, n_toks, token, count(*) AS cnt
            FROM exploded GROUP BY doc_id, n_toks, token
        ),
        dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token,
                   floor((CAST(cnt AS DOUBLE) / n_toks)
                         * ln(CAST(n_docs AS DOUBLE) / df) * 1e6) / 1e6 AS tfidf
            FROM tf JOIN dfreq USING (token) CROSS JOIN n
        )
        SELECT doc_id, rank, token, tfidf
        FROM (
            SELECT doc_id, token, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, token ASC) AS rank
            FROM scored
        )
        WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Chunking
# ---------------------------------------------------------------------------

def doc_chunks(df: DataFrame, size: int = 200, stride: int = 150) -> DataFrame:
    """Fixed-size character chunks with overlap (training-sample prep).

    Chunk *i* covers ``[i*stride, i*stride + size)``; the count is
    ``1 + ceil(max(len - size, 0) / stride)`` computed with exact
    integer arithmetic, so every document yields ≥ 1 chunk and the last
    chunk reaches the end of the text.  Pure generate + substring — no
    shuffle, scales linearly.
    """
    m = f"(greatest(length(text) - {size}, 0) + {stride - 1}) div {stride}"
    staged = df.selectExpr("doc_id", "text", f"sequence(0, {m}) AS idxs")
    return (
        staged.select("doc_id", "text", F.explode_outer("idxs").alias("chunk_idx"))
        .selectExpr(
            "doc_id",
            "CAST(chunk_idx AS BIGINT) AS chunk_idx",
            f"CAST(chunk_idx * {stride} AS BIGINT) AS chunk_start",
            f"substring(text, chunk_idx * {stride} + 1, {size}) AS chunk_text",
        )
        .selectExpr(
            "doc_id", "chunk_idx", "chunk_start",
            "CAST(length(chunk_text) AS BIGINT) AS chunk_len", "chunk_text",
        )
    )


def doc_chunks_oracle(size: int = 200, stride: int = 150, table: str = "documents") -> str:
    m = f"(greatest(length(text) - {size}, 0) + {stride - 1}) // {stride}"
    return f"""
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(i * {stride} AS BIGINT) AS chunk_start,
               CAST(length(substring(text, i * {stride} + 1, {size})) AS BIGINT) AS chunk_len,
               substring(text, i * {stride} + 1, {size}) AS chunk_text
        FROM (
            SELECT doc_id, text, unnest(generate_series(0, {m})) AS i
            FROM {table}
        )
    """


# ---------------------------------------------------------------------------
# Redaction
# ---------------------------------------------------------------------------

def redact(df: DataFrame, pattern: str, tag: str = "[REDACTED]",
           text_col: str = "text") -> DataFrame:
    """Redact every regex match in ``text_col``; counts matches first.

    ``pattern`` is a raw regex (use :data:`REDACT_PRESETS` for
    email/phone/SSN).  Spark's ``regexp_replace`` is global by default;
    the DuckDB oracle must pass the ``'g'`` flag (see
    :func:`redact_oracle`).
    """
    return df.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all({text_col}, '{_sql_quote(pattern)}', 0)"))
        .cast("bigint")
        .alias("n_redactions"),
        F.regexp_replace(F.col(text_col), pattern, tag).alias("clean_text"),
    )


def _sql_quote(pattern: str) -> str:
    # Spark SQL string literals process backslashes; double them.
    return pattern.replace("\\", "\\\\").replace("'", "\\'")


def doc_redact_terms(df: DataFrame, terms: tuple[str, ...] = ("customer", "supplier", "order"),
                     tag: str = "[REDACTED]") -> DataFrame:
    """Registered, non-vacuous form of :func:`redact`: scrub a term set
    that actually occurs in the corpus (entity-style redaction; the
    synthetic corpus has no digits/emails, so the PII presets would be
    vacuously green — they are unit-tested on synthetic strings
    instead)."""
    return redact(df, _term_pattern(terms), tag)


def doc_redact_terms_oracle(terms: tuple[str, ...] = ("customer", "supplier", "order"),
                            tag: str = "[REDACTED]") -> str:
    pat = _term_pattern(terms)
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_redactions,
               regexp_replace(text, '{pat}', '{tag}', 'g') AS clean_text
        FROM documents
    """


# ---------------------------------------------------------------------------
# Chunk-level duplication rate
# ---------------------------------------------------------------------------

def chunk_dedup_stats(documents: DataFrame, size: int = 200, stride: int = 150) -> DataFrame:
    """Per-language chunk-duplication rate: how much of the corpus is
    redundant at training-sample granularity (finer than doc-level
    dedup — two distinct docs sharing boilerplate paragraphs show up
    here, not there).

    Plan: chunking is shuffle-free, chunks hash scan-side (md5), one
    equi-join to recover the language label, one hash-agg.  The
    distinct-count shuffles on (lang, hash) — at 100 TB swap in
    ``approx_count_distinct`` for the one-pass sketch form; the exact
    form is kept here because the oracle must be exact."""
    ch = doc_chunks(documents, size=size, stride=stride).select(
        "doc_id", F.md5("chunk_text").alias("h")
    )
    labeled = ch.join(documents.select("doc_id", "lang"), "doc_id")
    return (
        labeled.groupBy("lang")
        .agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("h").alias("n_unique_chunks"),
        )
        .selectExpr(
            "lang",
            "n_chunks",
            "n_unique_chunks",
            "round(1.0 - CAST(n_unique_chunks AS DOUBLE) / n_chunks, 6) AS dup_chunk_ratio",
        )
    )


def chunk_dedup_stats_oracle(size: int = 200, stride: int = 150) -> str:
    return f"""
        WITH ch AS ({doc_chunks_oracle(size=size, stride=stride)})
        SELECT d.lang,
               count(*) AS n_chunks,
               count(DISTINCT md5(c.chunk_text)) AS n_unique_chunks,
               round(1.0 - CAST(count(DISTINCT md5(c.chunk_text)) AS DOUBLE) / count(*), 6)
                 AS dup_chunk_ratio
        FROM ch c JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """


# ---------------------------------------------------------------------------
# End-to-end training-set pipeline
# ---------------------------------------------------------------------------

def corpus_training_set(documents: DataFrame, size: int = 200, stride: int = 150,
                        min_quality: float = 0.45) -> DataFrame:
    """The whole corpus-prep pipeline as ONE lazy DAG: curate (keep-best
    dedup + quality + language agreement) → chunk → drop duplicate
    chunks (keep the first (doc_id, chunk_idx) per content hash) →
    per-language training-set summary.

    This is the flagship composition: four operators, one plan, no
    intermediate materialization — Catalyst sees every stage, so
    column pruning reaches the scan and the only shuffles are the
    curation semi-join, the per-hash dedup window, and the final
    summary agg.  Deterministic keep-first makes the result (and the
    oracle) exact."""
    from pyspark.sql import Window

    from twitter_followers_patterns_mapreduce_spark.operators.text import (
        curate_documents,
    )

    kept = curate_documents(documents, min_quality=min_quality).select("doc_id")
    docs2 = documents.join(kept, "doc_id", "left_semi")
    ch = doc_chunks(docs2, size=size, stride=stride).withColumn("h", F.md5("chunk_text"))
    w = Window.partitionBy("h").orderBy(F.asc("doc_id"), F.asc("chunk_idx"))
    uniq = ch.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    # lang comes from the base table, NOT from curate_documents — the
    # curation subtree is expensive (dedup + quality + lang-id) and is
    # already paid once inside the semi-join; joining it again for one
    # label column would compute the whole pipeline a second time
    # (curation keeps only pred_lang == lang docs, so base lang is
    # identical by construction).
    return (
        uniq.join(documents.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_chunks"),
            F.sum("chunk_len").alias("sum_chunk_chars"),
        )
    )


def corpus_training_set_oracle(size: int = 200, stride: int = 150,
                               min_quality: float = 0.45) -> str:
    from twitter_followers_patterns_mapreduce_spark.operators.text import (
        curate_documents_oracle,
    )

    return f"""
        WITH kept AS (SELECT doc_id FROM ({curate_documents_oracle(min_quality)}) k),
        docs2 AS (
            SELECT d.* FROM documents d WHERE d.doc_id IN (SELECT doc_id FROM kept)
        ),
        ch AS (
            SELECT c.*, md5(c.chunk_text) AS h
            FROM ({doc_chunks_oracle(size=size, stride=stride, table="docs2")}) c
        ),
        uniq AS (
            SELECT * FROM (
                SELECT ch.*, row_number() OVER (PARTITION BY h
                                                ORDER BY doc_id ASC, chunk_idx ASC) AS rn
                FROM ch
            ) WHERE rn = 1
        )
        SELECT d.lang,
               count(DISTINCT u.doc_id) AS n_docs,
               count(*) AS n_chunks,
               CAST(SUM(u.chunk_len) AS BIGINT) AS sum_chunk_chars
        FROM uniq u JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """


def doc_token_chunks(df: DataFrame, window: int = 64, stride: int = 48) -> DataFrame:
    """Token-budget chunking: windows of ``window`` whitespace tokens
    advancing by ``stride`` — the unit an LLM training sampler actually
    consumes (char chunks approximate it; token chunks are exact).

    Same shape as :func:`doc_chunks`: stage the token array once,
    generate window indices with exact integer arithmetic, slice and
    re-join per window — scan-side only, no shuffle.  NB Spark
    ``slice(arr, start, LENGTH)`` vs DuckDB ``list_slice(l, begin,
    END)`` — same logical window spelled per dialect."""
    toks = tokens_sql("text", "spark")
    m = f"(greatest(size(toks) - {window}, 0) + {stride - 1}) div {stride}"
    staged = df.selectExpr("doc_id", f"coalesce({toks}, array()) AS toks").selectExpr(
        "doc_id", "toks", f"sequence(0, {m}) AS idxs"
    )
    return (
        staged.select("doc_id", "toks", F.explode_outer("idxs").alias("chunk_idx"))
        .selectExpr(
            "doc_id",
            "CAST(chunk_idx AS BIGINT) AS chunk_idx",
            f"CAST(chunk_idx * {stride} AS BIGINT) AS token_start",
            f"slice(toks, chunk_idx * {stride} + 1, {window}) AS win",
        )
        .selectExpr(
            "doc_id",
            "chunk_idx",
            "token_start",
            "CAST(size(win) AS BIGINT) AS n_tokens",
            "concat_ws(' ', win) AS chunk_text",
        )
    )


def doc_token_chunks_oracle(window: int = 64, stride: int = 48,
                            table: str = "documents") -> str:
    toks = tokens_sql("text", "duckdb")
    m = f"(greatest(len(toks) - {window}, 0) + {stride - 1}) // {stride}"
    return f"""
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(i * {stride} AS BIGINT) AS token_start,
               CAST(len(list_slice(toks, i * {stride} + 1, i * {stride} + {window}))
                    AS BIGINT) AS n_tokens,
               array_to_string(list_slice(toks, i * {stride} + 1, i * {stride} + {window}), ' ')
                 AS chunk_text
        FROM (
            SELECT doc_id, toks, unnest(generate_series(0, {m})) AS i
            FROM (SELECT doc_id, {toks} AS toks FROM {table})
        )
    """


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV rate
# ---------------------------------------------------------------------------

def doc_oov_rate(df: DataFrame, min_count: int = 5, k: int = 100) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-``k``
    vocabulary (:func:`doc_vocabulary`) — the tokenizer-health metric a
    training pipeline tracks per source/snapshot: rising OOV means the
    vocab (or the corpus) drifted.

    Plan: the vocabulary is a k-row aggregate → broadcast; per-doc
    tokens explode scan-side and LEFT-join the broadcast vocab; one
    hash aggregate rolls up (n_tokens, n_oov, oov_rate) per doc.  The
    corpus is scanned twice (once to build the vocab, once to score) —
    at 100 TB the vocab side is the thing you persist and reuse, which
    is why it is a separate operator.
    """
    vocab = doc_vocabulary(df, min_count=min_count, k=k).select(
        "token", F.lit(1).alias("_in_vocab")
    )
    toks = df.selectExpr("doc_id", "lang", f"{tokens_sql('text', 'spark')} AS toks")
    exploded = (
        toks.select("doc_id", "lang", F.explode_outer("toks").alias("token"))
        .where(F.col("token").isNotNull())
    )
    return (
        exploded.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)) / F.count("*"),
                6,
            ).alias("oov_rate"),
        )
    )


def doc_oov_rate_oracle(min_count: int = 5, k: int = 100) -> str:
    toks = tokens_sql("text", "duckdb")
    return f"""WITH vocab AS ({doc_vocabulary_oracle(min_count=min_count, k=k)}),
exploded AS (
  SELECT doc_id, lang, unnest({toks}) AS token FROM documents
)
SELECT e.doc_id, e.lang,
  COUNT(*) AS n_tokens,
  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
  round(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) / COUNT(*), 6) AS oov_rate
FROM exploded e LEFT JOIN vocab v ON e.token = v.token
GROUP BY e.doc_id, e.lang"""


# ---------------------------------------------------------------------------
# Unigram surprisal scoring (deterministic LM-style quality signal)
# ---------------------------------------------------------------------------

def doc_token_surprisal(df: DataFrame) -> DataFrame:
    """Per-doc unigram surprisal score — the LM-perplexity-style quality
    filter (CCNet-family corpus curation uses an LM score per doc; the
    reference has no text surface at all — extension op), made
    cross-engine EXACT by measuring surprisal in whole bits:

        surprisal_bits(t) = len(bin(N)) - len(bin(count(t)))
                          = floor(log2 N) - floor(log2 count(t))

    Integer arithmetic end to end (``bin()`` exists in both engines with
    identical output), so no libm ``log`` — whose last-ulp behavior is
    platform- and engine-specific — ever enters the comparable result.
    Rare tokens score high, boilerplate scores ~0; the per-doc mean is
    the quality signal (high = novel/rare-heavy, low = repetitive).

    Plan shape (100 TB): tokens explode scan-side (one pass, lazily
    checkpointed — the exploded view feeds both the count build and the
    scoring join), unigram counts are ONE hash aggregate with map-side
    partials, the corpus-total row attaches via a constant-key broadcast
    equi-join (never a nested-loop cross), scoring is a token equi-join
    (vocab broadcasts while it fits, shuffle-hash beyond), and the
    per-doc rollup is one more hash aggregate.  Nothing is all-pairs,
    nothing is a global sort.
    """
    toks = df.selectExpr("doc_id", f"{tokens_sql('text', 'spark')} AS toks")
    exploded = (
        toks.select("doc_id", F.explode_outer("toks").alias("token"))
        .where(F.col("token").isNotNull())
        .localCheckpoint(eager=False)
    )
    counts = exploded.groupBy("token").agg(F.count("*").alias("cnt"))
    # corpus-total row attached via a BroadcastHashJoin on a data-derived
    # always-zero key — a literal key constant-folds into a
    # BroadcastNestedLoopJoin (same trick as doc_tfidf_topk above)
    total = exploded.agg(F.count("*").alias("n_total")).selectExpr(
        "n_total", "n_total - n_total AS _k"
    )
    scored_vocab = (
        counts.withColumn("_k", F.expr("pmod(cnt, 1)"))
        .join(F.broadcast(total), "_k")
        .selectExpr(
            "token",
            "CAST(length(bin(n_total)) - length(bin(cnt)) AS BIGINT) AS bits",
        )
    )
    return (
        exploded.join(scored_vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("bits").cast("long").alias("sum_bits"),
            F.round(F.sum("bits") / F.count("*"), 6).alias("mean_surprisal_bits"),
        )
    )


def doc_token_surprisal_oracle() -> str:
    toks = tokens_sql("text", "duckdb")
    return f"""WITH exploded AS (
  SELECT doc_id, unnest({toks}) AS token FROM documents
),
counts AS (SELECT token, COUNT(*) AS cnt FROM exploded GROUP BY token),
total AS (SELECT COUNT(*) AS n_total FROM exploded),
scored_vocab AS (
  SELECT token,
         CAST(length(bin(n_total)) - length(bin(cnt)) AS BIGINT) AS bits
  FROM counts CROSS JOIN total
)
SELECT e.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(s.bits) AS BIGINT) AS sum_bits,
       round(SUM(s.bits) / COUNT(*), 6) AS mean_surprisal_bits
FROM exploded e JOIN scored_vocab s ON e.token = s.token
GROUP BY e.doc_id"""


# ---------------------------------------------------------------------------
# Training-sequence packing (contiguous fill at chunk granularity)
# ---------------------------------------------------------------------------

def pack_sequences(
    documents: DataFrame, seq_len: int = 256, window: int = 64
) -> DataFrame:
    """Pack non-overlapping token chunks into fixed-budget training
    sequences — the "concat corpus, cut every ``seq_len`` tokens" step
    of an LLM data pipeline, at chunk granularity: chunks stream in the
    deterministic corpus order (lang, doc_id, chunk_idx) and each chunk
    joins the sequence its START token offset falls into
    (``seq_id = floor(exclusive_prefix_tokens / seq_len)``).  Output is
    the per-sequence manifest: (lang, seq_id, n_docs, n_chunks,
    n_tokens, fill_ratio) — the table a sampler reads to draw packed
    batches and the audit for padding waste.

    Plan shape: chunks are scan-side (``doc_token_chunks`` with
    stride = window → no overlap, no shuffle), one equi-join carries
    lang, ONE partitioned window (partition lang, order doc_id ×
    chunk_idx — a defined shuffle key, never a global running sum)
    computes the exclusive token prefix, one hash aggregate summarizes.
    fill_ratio divides exact BIGINTs — bit-exact cross-engine.

    Scale note: one partition per lang caps parallelism at |langs| for
    the window stage; the production extension shards the partition key
    to (lang, h64(doc_id) % n_shards), trading per-shard boundary waste
    (< seq_len tokens each) for full parallelism — same plan shape.
    """
    from pyspark.sql import Window

    chunks = doc_token_chunks(documents, window=window, stride=window).where(
        F.col("n_tokens") > 0
    )
    with_lang = chunks.join(documents.select("doc_id", "lang"), "doc_id")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.asc("doc_id"), F.asc("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # integer floor-division (div), NOT double '/'+cast: past 2^53
    # prefix tokens the double rounding could move a chunk across a
    # sequence boundary the oracle's exact `//` does not
    seq = with_lang.withColumn(
        "prefix", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn("seq_id", F.expr(f"prefix div {seq_len}")).drop("prefix")
    return seq.groupBy("lang", "seq_id").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        (F.sum("n_tokens").cast("long") / F.lit(seq_len).cast("long")).alias("fill_ratio"),
    )


def pack_sequences_oracle(
    seq_len: int = 256, window: int = 64, table: str = "documents"
) -> str:
    return f"""
WITH chunks AS (
  SELECT * FROM ({doc_token_chunks_oracle(window=window, stride=window, table=table)})
  WHERE n_tokens > 0),
with_lang AS (
  SELECT c.*, d.lang FROM chunks c JOIN {table} d USING (doc_id)),
seq AS (
  SELECT lang, doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id, chunk_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {seq_len}
           AS BIGINT) AS seq_id
  FROM with_lang)
SELECT lang, seq_id,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_tokens) AS BIGINT) / {seq_len} AS fill_ratio
FROM seq GROUP BY lang, seq_id"""


# ---------------------------------------------------------------------------
# Tokenizer fit: BPE merge-candidate statistics
# ---------------------------------------------------------------------------

def bpe_pair_counts(df: DataFrame, k: int = 50) -> DataFrame:
    """The first BPE training iteration's core statistic: corpus-wide
    frequencies of ADJACENT CHARACTER PAIRS inside lower-cased word
    pre-tokens — the candidates the first merge rule would be chosen
    from (Sennrich et al. 2016).

    Scale shape — the trick real BPE trainers use: aggregate the corpus
    to its distinct-word VOCABULARY first (one hash agg over exploded
    words), then explode character pairs over the vocab only, weighting
    each pair by the word's corpus count.  Pair generation cost is
    O(|vocab|·word_len), independent of corpus size; the corpus-sized
    work is a single word-count agg.  Top-k is TakeOrdered, never a
    global sort."""
    toks = tokens_sql("lower(text)", "spark")
    words = (
        df.selectExpr(f"explode(filter({toks}, t -> t rlike '^[a-z]+$')) AS w")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    # length-1 words have no pairs — filter BEFORE sequence(): Spark's
    # sequence(1, 0) auto-steps DOWNWARD to [1, 0] instead of yielding
    # an empty array, which would fabricate junk pairs
    pairs = words.where(F.length("w") >= 2).selectExpr(
        "n",
        "explode(transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))) AS pair",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(k)
    )


def bpe_pair_counts_oracle(k: int = 50) -> str:
    toks = tokens_sql("lower(text)", "duckdb")
    return f"""WITH words AS (
  SELECT w, COUNT(*) AS n FROM (
    SELECT unnest(list_filter({toks}, t -> regexp_full_match(t, '[a-z]+'))) AS w
    FROM documents) GROUP BY w
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> substring(w, CAST(i AS INT), 2)))
           AS pair,
         n
  FROM words WHERE length(w) >= 2
)
SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC LIMIT {k}"""


def corpus_token_budget(df: DataFrame) -> DataFrame:
    """The mixture report a training run starts from: per (source,
    lang) document/token/char mass and each cell's share of the total
    token budget — the table DoReMi-style mixture reweighting and
    epoch planning consume.

    One scan computes per-cell integer masses (map-side combinable hash
    agg); the grand total joins back as a broadcast 1-row aggregate.
    Shares are one bigint/bigint IEEE division rounded to 6dp — exact
    cross-engine, no float accumulation anywhere."""
    toks = tokens_sql("text", "spark")
    cells = (
        df.selectExpr(
            "source",
            "lang",
            "n_chars",
            f"CAST(size({toks}) AS BIGINT) AS n_tokens",
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    # grand total attached via a BroadcastHashJoin on a data-derived
    # always-zero key (the doc_tfidf_topk idiom) — a bare crossJoin
    # would plan BroadcastNestedLoopJoin and break the engine's
    # "no cross-join nodes" invariant
    total = cells.agg(F.sum("n_tokens").cast("long").alias("total_tokens")).selectExpr(
        "total_tokens", "total_tokens - total_tokens AS _k"
    )
    return cells.withColumn("_k", F.expr("pmod(n_docs, 1)")).join(
        F.broadcast(total), "_k"
    ).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_tokens").cast("double") / F.col("total_tokens").cast("double"), 6)
        .alias("token_share"),
    )


def corpus_token_budget_oracle() -> str:
    toks = tokens_sql("text", "duckdb")
    return f"""WITH cells AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(len({toks})) AS BIGINT) AS n_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY source, lang
), total AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM cells)
SELECT source, lang, n_docs, n_tokens, n_chars,
       round(CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6) AS token_share
FROM cells CROSS JOIN total"""


#: Denominator of the deterministic keep-rate used by
#: :func:`corpus_domain_mixture` (rate = threshold / DENOM).
MIXTURE_DENOM = 1_000_000


def corpus_domain_mixture(documents: DataFrame) -> DataFrame:
    """Deterministic domain-mixture resampling — the "data recipe" step
    of an LLM pipeline: each source domain gets a target weight and is
    downsampled to ``weight / max_weight`` of its rows, so the kept
    corpus follows the recipe instead of the crawl's accidental mix.

    Membership is a pure function of the row key (same h64-bucket
    machinery as ``operators/splits.py``): a doc's keep/drop decision
    survives reruns, repartitioning, and corpus growth — ``rand()``
    sampling has none of those guarantees.  Weights here derive from
    the source id (``(n % 3) + 1`` ∈ {1,2,3}) so the oracle is
    self-contained; production callers pass a broadcastable weight dim
    table instead.

    Plan shape (100 TB): weight lookup and bucket hash are scan-side
    projections (zero shuffles), the verdict aggregate is one map-side
    combinable hash agg keyed by the low-cardinality ``source``.
    Writing the kept rows is the same scan with ``bucket < threshold``
    pushed down — no second pass over the corpus.
    """
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    src_num = F.regexp_replace(F.col("source"), "^src", "").cast("int")
    weight = (src_num % 3) + 1
    threshold = (
        F.when(weight == 3, F.lit(MIXTURE_DENOM))
        .when(weight == 2, F.lit(666_666))
        .otherwise(F.lit(333_333))
    )
    bucket = F.expr(h64_sql("cast(doc_id as string)", "spark")) % MIXTURE_DENOM
    flagged = documents.select(
        "source",
        weight.alias("target_weight"),
        (bucket < threshold).cast("int").alias("kept"),
        "n_chars",
    )
    return flagged.groupBy("source").agg(
        F.max("target_weight").alias("target_weight"),
        F.count("*").alias("n_docs"),
        F.sum("kept").alias("n_kept"),
        F.sum(F.col("kept") * F.col("n_chars")).alias("kept_chars"),
        F.round(F.sum("kept") / F.count("*"), 6).alias("achieved_rate"),
    )


def corpus_domain_mixture_oracle() -> str:
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(doc_id AS VARCHAR)", "duckdb")
    return f"""WITH flagged AS (
  SELECT source,
         (CAST(regexp_replace(source, '^src', '') AS INT) % 3) + 1 AS target_weight,
         CASE WHEN ({h} % {MIXTURE_DENOM}) <
              (CASE (CAST(regexp_replace(source, '^src', '') AS INT) % 3) + 1
                 WHEN 3 THEN {MIXTURE_DENOM} WHEN 2 THEN 666666 ELSE 333333 END)
              THEN 1 ELSE 0 END AS kept,
         n_chars
  FROM documents
)
SELECT source,
       MAX(target_weight) AS target_weight,
       COUNT(*) AS n_docs,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(SUM(kept * n_chars) AS BIGINT) AS kept_chars,
       ROUND(SUM(kept)::DOUBLE / COUNT(*), 6) AS achieved_rate
FROM flagged GROUP BY source"""


def corpus_temperature_mixture(documents: DataFrame, keep_div: int = 2) -> DataFrame:
    """Temperature-scaled domain resampling with DATA-DERIVED weights —
    the multilingual-LLM recipe (sample domain i with probability
    ∝ n_i^τ; τ < 1 upsamples the tail relative to its natural share —
    the XLM-R / mBERT data-balancing scheme).  τ is fixed at 0.5 so the
    weight is ``sqrt(n_i)``: sqrt is correctly-rounded IEEE and thus
    bit-identical across engines, while ``power(n, 0.7)`` is a libm
    call whose last ulp differs between Java and C — a floor at a
    threshold boundary away from a corpus-sized divergence.

    Contrast :func:`corpus_domain_mixture` (static recipe weights):
    here the rates come from the corpus itself — count per source,
    w_i = sqrt(n_i) floored to a 1e-6-scaled BIGINT (so the weight SUM
    is exact and order-independent), share p_i = w6_i / Σw6, target
    keep count p_i · (N / keep_div), per-source keep threshold =
    floor(min(1, target/n_i)·1e6).  Membership is then the standard
    deterministic h64 bucket test — stable across reruns,
    repartitioning, and growth.

    Plan shape (100 TB): one map-side-combinable count agg by the
    low-cardinality source, thresholds broadcast back onto the scan
    (production reads the counts from table stats instead of the first
    pass), verdict agg by source.  Output per source:
    (source, n_docs, share6, threshold, n_kept, achieved_rate).
    """
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    counts = documents.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    w6 = counts.selectExpr(
        "source",
        "n_docs",
        "CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS w6",
    )
    tot = w6.selectExpr(
        "CAST(SUM(w6) AS BIGINT) AS tw6",
        "CAST(SUM(n_docs) AS BIGINT) AS n_total",
    )
    rates = w6.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "n_docs",
        "floor(CAST(w6 AS DOUBLE) / tw6 * 1000000) / 1000000 AS share6",
        "CAST(floor(least(CAST(1.0 AS DOUBLE),"
        f" (CAST(w6 AS DOUBLE) / tw6) * (n_total div {keep_div}) / n_docs)"
        " * 1000000) AS BIGINT) AS threshold",
    )
    bucket = F.expr(h64_sql("cast(doc_id as string)", "spark")) % MIXTURE_DENOM
    flagged = documents.select("source", bucket.alias("b")).join(
        F.broadcast(rates), "source"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("share6").alias("share6"),
            F.max("threshold").alias("threshold"),
            F.sum((F.col("b") < F.col("threshold")).cast("int")).cast("long").alias("n_kept"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "share6",
            "threshold",
            "n_kept",
            "floor(CAST(n_kept AS DOUBLE) / n_docs * 1000000) / 1000000 AS achieved_rate",
        )
    )


def corpus_temperature_mixture_oracle(keep_div: int = 2) -> str:
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(doc_id AS VARCHAR)", "duckdb")
    return f"""WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
w AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS w6
  FROM counts),
tot AS (
  SELECT CAST(SUM(w6) AS BIGINT) AS tw6, CAST(SUM(n_docs) AS BIGINT) AS n_total FROM w),
rates AS (
  SELECT source, n_docs,
         floor(CAST(w6 AS DOUBLE) / tw6 * 1000000) / 1000000 AS share6,
         CAST(floor(least(CAST(1.0 AS DOUBLE),
           (CAST(w6 AS DOUBLE) / tw6) * (n_total // {keep_div}) / n_docs)
           * 1000000) AS BIGINT) AS threshold
  FROM w CROSS JOIN tot),
flagged AS (
  SELECT d.source, ({h} % {MIXTURE_DENOM}) AS b, r.n_docs, r.share6, r.threshold
  FROM documents d JOIN rates r ON d.source = r.source)
SELECT source,
  MAX(n_docs) AS n_docs,
  MAX(share6) AS share6,
  MAX(threshold) AS threshold,
  CAST(SUM(CASE WHEN b < threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  floor(CAST(SUM(CASE WHEN b < threshold THEN 1 ELSE 0 END) AS DOUBLE)
    / MAX(n_docs) * 1000000) / 1000000 AS achieved_rate
FROM flagged GROUP BY source"""


def corpus_mixture_ivm(documents: DataFrame, keep_div: int = 2) -> DataFrame:
    """Domain-mixture recipe maintained INCREMENTALLY — the IVM twin of
    :func:`corpus_temperature_mixture`: per-source (doc, char) totals
    are mergeable algebraic state, so an ingest updates them from the
    DELTA alone (union → re-aggregate, the ``orders_monthly_ivm`` /
    ``join_delta_ivm`` rule) and the whole temperature recipe —
    sqrt-weights, shares, per-source doc budgets, keep thresholds —
    recomputes from the |sources|-row state without ever rescanning the
    corpus.  Here base = even doc_ids, delta = odd (the house parity
    split); the DuckDB oracle computes the recipe DIRECTLY from the
    full table — the hash match proves delta maintenance ≡ full
    recompute.

    At 100 TB the base aggregate is the standing per-source stats
    table; a daily ingest pays |Δ| + |sources| — and because every
    downstream quantity (w6 = floor(sqrt(n)·1e6), share, budget,
    threshold) is a pure function of the state row, the recipe refresh
    is O(|sources|), the cheapest possible mixture re-plan.

    Output per source: (source, n_docs, n_chars, w6, share6,
    target_docs, threshold) — exact BIGINT state, floored 1e-6 shares
    (sqrt is correctly-rounded IEEE, bit-identical cross-engine).
    """
    base = documents.where(F.pmod("doc_id", F.lit(2)) == 0)
    delta = documents.where(F.pmod("doc_id", F.lit(2)) == 1)

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("source").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )

    merged = (
        state(base)
        .unionByName(state(delta))
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    return mixture_recipe_from_counts(merged, keep_div)


def mixture_recipe_from_counts(state: DataFrame, keep_div: int = 2) -> DataFrame:
    """The temperature recipe as a pure function of the |sources|-row
    (source, n_docs, n_chars) state — shared by the batch IVM above and
    the streamed state maintainer (``streaming/mixture.py``): every
    downstream quantity recomputes from the state alone, O(|sources|)."""
    w6 = state.selectExpr(
        "source",
        "n_docs",
        "n_chars",
        "CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS w6",
    )
    tot = w6.selectExpr(
        "CAST(SUM(w6) AS BIGINT) AS tw6",
        "CAST(SUM(n_docs) AS BIGINT) AS n_total",
    )
    # |sources|-row spine × 1-row totals: declared cardinality × 1 cross
    return w6.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "n_docs",
        "n_chars",
        "w6",
        "floor(CAST(w6 AS DOUBLE) / tw6 * 1000000) / 1000000 AS share6",
        f"CAST(floor((CAST(w6 AS DOUBLE) / tw6) * (n_total div {keep_div}))"
        " AS BIGINT) AS target_docs",
        "CAST(floor(least(CAST(1.0 AS DOUBLE),"
        f" (CAST(w6 AS DOUBLE) / tw6) * (n_total div {keep_div}) / n_docs)"
        " * 1000000) AS BIGINT) AS threshold",
    )


def corpus_mixture_ivm_oracle(keep_div: int = 2) -> str:
    return f"""WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY 1),
w AS (
  SELECT source, n_docs, n_chars,
         CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS w6
  FROM counts),
tot AS (
  SELECT CAST(SUM(w6) AS BIGINT) AS tw6, CAST(SUM(n_docs) AS BIGINT) AS n_total FROM w)
SELECT source, n_docs, n_chars, w6,
  floor(CAST(w6 AS DOUBLE) / tw6 * 1000000) / 1000000 AS share6,
  CAST(floor((CAST(w6 AS DOUBLE) / tw6) * (n_total // {keep_div})) AS BIGINT)
    AS target_docs,
  CAST(floor(least(CAST(1.0 AS DOUBLE),
    (CAST(w6 AS DOUBLE) / tw6) * (n_total // {keep_div}) / n_docs)
    * 1000000) AS BIGINT) AS threshold
FROM w CROSS JOIN tot"""


def corpus_export_shards(documents: DataFrame, n_shards: int = 8) -> DataFrame:
    """Deterministic global shuffle for training export: every doc gets a
    shard by content hash (never by input order or partition id), and
    the audit emits per-shard balance stats — row count, byte mass,
    distinct-source spread, and the shard's hash range.

    A training run wants (a) stable shard membership across reruns,
    (b) shards of near-equal byte mass, and (c) every shard mixing all
    source domains (hash sharding gives this for free; range-by-source
    sharding would not).  This is the audit a 100 TB export runs before
    ``df.repartitionByRange(n, "shard", "sort_key").write.partitionBy("shard")``.

    Plan shape: shard id and hash are scan-side projections; the audit
    is one hash agg keyed by the ``n_shards``-cardinality shard id
    (map-side combinable).  No windows, no joins.
    """
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    h = F.expr(h64_sql("cast(doc_id as string)", "spark"))
    shard = (h % n_shards).alias("shard")
    return (
        documents.select(shard, h.alias("h"), "source", "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.min("h").alias("min_hash"),
            F.max("h").alias("max_hash"),
        )
    )


def corpus_export_shards_oracle(n_shards: int = 8) -> str:
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(doc_id AS VARCHAR)", "duckdb")
    return f"""WITH sharded AS (
  SELECT ({h}) % {n_shards} AS shard, {h} AS h, source, n_chars FROM documents
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       COUNT(DISTINCT source) AS n_sources,
       MIN(h) AS min_hash,
       MAX(h) AS max_hash
FROM sharded GROUP BY shard"""


def corpus_domain_mixture_weighted(
    documents: DataFrame, weights: DataFrame, max_weight: int | None = None
) -> DataFrame:
    """Production form of :func:`corpus_domain_mixture`: target weights
    come from a caller-supplied ``(source, target_weight)`` dim table
    instead of being derived from the source id.  The dim broadcasts
    (domains are 10s–1000s of rows at any corpus size); unknown sources
    keep weight 0 → dropped, which the audit surfaces as n_kept = 0
    rather than hiding the rows.

    Same determinism contract: keep iff
    ``h64(doc_id) % DENOM < target_weight * DENOM / max_weight``.
    """
    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    if max_weight is None:
        max_weight = weights.agg(F.max("target_weight")).collect()[0][0]
    bucket = F.expr(h64_sql("cast(doc_id as string)", "spark")) % MIXTURE_DENOM
    w = F.coalesce(F.col("target_weight"), F.lit(0))
    threshold = F.floor(w * MIXTURE_DENOM / max_weight).cast("long")
    flagged = (
        documents.join(F.broadcast(weights), "source", "left")
        .select(
            "source",
            w.alias("target_weight"),
            (bucket < threshold).cast("int").alias("kept"),
            "n_chars",
        )
    )
    return flagged.groupBy("source").agg(
        F.max("target_weight").alias("target_weight"),
        F.count("*").alias("n_docs"),
        F.sum("kept").alias("n_kept"),
        F.sum(F.col("kept") * F.col("n_chars")).alias("kept_chars"),
        F.round(F.sum("kept") / F.count("*"), 6).alias("achieved_rate"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

#: The standing retrieval probe: four corpus terms with distinct
#: document frequencies, so the idf spread actually exercises the
#: saturation curve (single-term scores would collapse to a tf rank).
BM25_QUERY_TERMS: tuple[str, ...] = ("merge", "stream", "spark", "dup")


def _bm25_contrib_sql(k1: float, b: float) -> str:
    """The per-(doc, term) Okapi BM25 contribution, written ONCE and
    executed verbatim by both engines over identical integer inputs
    (``tf``, ``df``, ``dl``, ``n_docs``, ``tot_toks``) — every IEEE op
    then lands bit-identically, and the trailing ``floor(· * 1e6)``
    absorbs the one genuinely platform-ish call (``ln``) the same way
    ``doc_tfidf_topk`` does.

        idf  = ln(1 + (N - df + 0.5) / (df + 0.5))      (always > 0)
        norm = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
        avgdl = tot_toks / N  (computed inline from the two globals)
    """
    idf = (
        "ln(1e0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
        " / (CAST(df AS DOUBLE) + 0.5))"
    )
    avgdl = "(CAST(tot_toks AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    norm = (
        f"(CAST(tf AS DOUBLE) * ({k1!r} + 1e0))"
        f" / (CAST(tf AS DOUBLE) + {k1!r} * (1e0 - {b!r} + {b!r}"
        f" * CAST(dl AS DOUBLE) / {avgdl}))"
    )
    return f"CAST(floor({idf} * {norm} * 1e6) AS BIGINT)"


def doc_bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-``k`` document retrieval for a fixed term query —
    the inverted-index search primitive of a training-data pipeline
    (contamination lookups, targeted corpus slicing, eval-set mining).
    Extension op: the reference has no text surface (SURVEY.md §2.6).

    Cross-engine exactness: per-term contributions are floored to
    integer micro-units (×1e6) BEFORE the per-doc sum, so the reduction
    is exact BIGINT addition — order-independent under any shuffle or
    partial-agg schedule — and the rank key is the integer score with a
    ``doc_id`` tie-break (a float never orders rows).

    Plan shape (100 TB): the tokenizer projection is staged once and
    lazily checkpointed (globals + postings both read it); the term
    filter lands IMMEDIATELY after the explode, so only query-term
    postings — |terms| rows per matching doc, not the corpus token
    stream — ever reach a shuffle.  Document frequencies are a
    |terms|-row broadcast; the two corpus globals attach via the
    engine's data-derived-zero-key broadcast equi-join (never a
    nested-loop cross).  Top-k is TakeOrderedAndProject: per-partition
    heaps, k-row driver merge, no global sort.
    """
    term_list = ", ".join(f"'{t}'" for t in terms)
    toks = df.selectExpr(
        "doc_id", f"{tokens_sql('text', 'spark')} AS toks"
    ).localCheckpoint(eager=False)
    glob = (
        toks.selectExpr("size(toks) AS dl")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").cast("long").alias("tot_toks"),
        )
        .selectExpr("n_docs", "tot_toks")
    )
    postings = toks.selectExpr(
        "doc_id", "size(toks) AS dl", "explode(toks) AS token"
    ).where(F.expr(f"token IN ({term_list})"))
    tf = postings.groupBy("doc_id", "dl", "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    return bm25_topk_from_parts(tf, glob, k=k, k1=k1, b=b)


def bm25_topk_from_parts(
    tf: DataFrame, glob: DataFrame, k: int = 20, k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """The BM25 scoring tail over an ALREADY-BUILT query-term index —
    shared by the one-shot :func:`doc_bm25_topk` above and the streamed
    index maintainer (``streaming/bm25.py``): ``tf`` is the per-doc
    query-term posting table (doc_id, dl, token, tf), ``glob`` the
    1-row (n_docs, tot_toks) corpus totals.  Both are additive state, so
    where they come from (one scan or a micro-batch fold) cannot change
    the scores."""
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    g = glob.selectExpr("n_docs", "tot_toks", "n_docs - n_docs AS _k")
    contrib = (
        tf.join(F.broadcast(dfreq), "token")
        .withColumn("_k", F.expr("pmod(tf, 1)"))
        .join(F.broadcast(g), "_k")
        .selectExpr("doc_id", f"{_bm25_contrib_sql(k1, b)} AS c")
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("c").alias("score_u"),
        )
        .orderBy(F.desc("score_u"), F.asc("doc_id"))
        .limit(k)
        .selectExpr(
            "doc_id",
            "n_terms",
            "CAST(score_u AS DOUBLE) / 1e6 AS bm25",
        )
    )


def doc_bm25_topk_oracle(
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    toks = tokens_sql("text", "duckdb")
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH toks AS (SELECT doc_id, {toks} AS toks FROM documents),
        totals AS (SELECT COUNT(*) AS n_docs,
                           CAST(SUM(len(toks)) AS BIGINT) AS tot_toks FROM toks),
        ex AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM toks),
        tf AS (
            SELECT doc_id, dl, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM ex WHERE token IN ({term_list})
            GROUP BY doc_id, dl, token
        ),
        dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
        contrib AS (
            SELECT tf.doc_id, {_bm25_contrib_sql(k1, b)} AS c
            FROM tf JOIN dfreq USING (token) CROSS JOIN totals
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(c) AS DOUBLE) / 1e6 AS bm25
        FROM contrib GROUP BY doc_id
        ORDER BY SUM(c) DESC, doc_id ASC LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Bigram LM surprisal (the conditional upgrade of doc_token_surprisal)
# ---------------------------------------------------------------------------

def doc_bigram_surprisal(df: DataFrame) -> DataFrame:
    """Per-doc BIGRAM conditional surprisal — the n-gram LM upgrade of
    :func:`doc_token_surprisal` (extension op; the reference has no text
    surface, SURVEY.md §2.6).  The corpus itself is the language model:

        bits(t1 → t2) = len(bin(count(t1·*))) - len(bin(count(t1·t2)))
                      = floor(log2 P(t2|t1)^-1)   in whole bits

    where ``count(t1·*)`` is t1's occurrences as a bigram PREFIX (the
    exact conditional denominator).  Same integer-exact contract as the
    unigram form: ``bin()`` lengths on both engines, no libm ``log``
    near the comparable result.  Low mean = predictable/boilerplate
    text, high mean = novel transitions — the CCNet-style LM filter at
    bigram order.  Docs with fewer than two tokens have no transitions
    and drop out (same convention as empty docs in the unigram op).

    Plan shape (100 TB): bigrams are built scan-side from the token
    array (an index-transform inside codegen — the token stream is
    never exploded twice) and lazily checkpointed, feeding both the
    bigram-count build and the scoring join; counts and the prefix
    marginal are hash aggregates with map-side partials; scoring is a
    (t1, t2) equi-join (bigram vocab broadcasts while it fits,
    shuffle-hash beyond); the per-doc rollup is one more hash agg.
    """
    toks = df.selectExpr("doc_id", f"{tokens_sql('text', 'spark')} AS toks")
    bi = (
        toks.selectExpr(
            "doc_id",
            "explode(CASE WHEN size(toks) >= 2 THEN transform("
            "sequence(1, size(toks) - 1),"
            " i -> struct(element_at(toks, i) AS t1, element_at(toks, i + 1) AS t2))"
            " ELSE array() END) AS bg",
        )
        .selectExpr("doc_id", "bg.t1 AS t1", "bg.t2 AS t2")
        .localCheckpoint(eager=False)
    )
    cnt_bg = bi.groupBy("t1", "t2").agg(F.count("*").cast("long").alias("c_bg"))
    cnt_pre = bi.groupBy("t1").agg(F.count("*").cast("long").alias("c_pre"))
    scored = (
        cnt_bg.join(cnt_pre, "t1")
        .selectExpr(
            "t1", "t2",
            "CAST(length(bin(c_pre)) - length(bin(c_bg)) AS BIGINT) AS bits",
        )
    )
    return (
        bi.join(scored, ["t1", "t2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("bits").cast("long").alias("sum_bits"),
            F.round(F.sum("bits") / F.count("*"), 6).alias("mean_bigram_bits"),
        )
    )


def doc_bigram_surprisal_oracle() -> str:
    toks = tokens_sql("text", "duckdb")
    return f"""WITH toks AS (SELECT doc_id, {toks} AS toks FROM documents),
bi AS (
  SELECT doc_id,
         toks[CAST(i AS INT)] AS t1,
         toks[CAST(i AS INT) + 1] AS t2
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM toks WHERE len(toks) >= 2)
),
cnt_bg AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c_bg FROM bi GROUP BY t1, t2),
cnt_pre AS (SELECT t1, CAST(COUNT(*) AS BIGINT) AS c_pre FROM bi GROUP BY t1),
scored AS (
  SELECT t1, t2,
         CAST(length(bin(c_pre)) - length(bin(c_bg)) AS BIGINT) AS bits
  FROM cnt_bg JOIN cnt_pre USING (t1)
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(s.bits) AS BIGINT) AS sum_bits,
       round(SUM(s.bits) / COUNT(*), 6) AS mean_bigram_bits
FROM bi b JOIN scored s ON b.t1 = s.t1 AND b.t2 = s.t2
GROUP BY b.doc_id"""


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016, fixed merge rounds)
# ---------------------------------------------------------------------------

def corpus_bpe_train(df: DataFrame, rounds: int = 6) -> DataFrame:
    """Train ``rounds`` byte-pair-encoding merges on the corpus — the
    actual tokenizer-training step of an LLM data pipeline (the
    companion of ``corpus_bpe_pair_counts``, which only counts; this
    LEARNS).  Classic Sennrich formulation: operate on the
    DISTINCT-WORD table weighted by word frequency, symbols start as
    single characters, each round merges the globally most frequent
    adjacent symbol pair (ties: lexicographic on the pair), rewriting
    occurrences left-to-right non-overlapping.

    Returns the learned merge table: (round, left_sym, right_sym,
    merged, pair_count).

    Cross-engine exactness: the symbol state is a ``|``-delimited
    string (vocabulary is restricted to ``[a-z0-9]+`` words, so the
    delimiter can never collide), pair counts are exact BIGINT sums,
    and the rewrite is ``replace(state, '|a|b|', '|ab|')`` — literal,
    leftmost, non-overlapping in Spark and DuckDB alike.  One declared
    deviation from canonical BPE: after a match, ``replace`` resumes
    PAST the consumed trailing delimiter, so ANY immediately-adjacent
    occurrence of the merged pair that shares that delimiter is
    deferred to a later round — on single-symbol runs ('aaaa' rewrites
    to [aa,a,a]; canonical gives [aa,aa]) but equally on repeated
    multi-symbol pairs ('abab' rewrites to [ab,a,b]; canonical gives
    [ab,ab]).  Deterministic and identical on both engines either way,
    which is what the oracle gate pins.  The oracle unrolls the
    identical rounds as chained CTEs with 1-row winner subqueries.

    Plan shape (100 TB): the ONLY corpus-sized pass is the word-count
    aggregation (one map-side-combinable hash agg); every round after
    that runs on the VOCABULARY table (|distinct words| rows — data-
    dependent but bounded by the token-type count, millions at web
    scale, never corpus-sized): one pair explode + hash agg + 1-row
    TakeOrdered, then a literal rewrite planned from the winner.  The
    driver touches one row per round (the argmax merge) — the standard
    iterative-ML control loop, not a data collect.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    spark = df.sparkSession
    words = (
        df.selectExpr(f"explode({tokens_sql('text', 'spark')}) AS word")
        .where(F.expr("word RLIKE '^[a-z0-9]+$'"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    state = words.selectExpr(
        "freq",
        "concat('|', regexp_replace(word, '(.)', '$1|')) AS state",
    ).transform(lazy_ckpt)
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, rounds + 1):
        pairs = (
            state.selectExpr(
                "freq", "filter(split(state, '\\\\|'), t -> t <> '') AS syms"
            )
            .where(F.expr("size(syms) >= 2"))
            .selectExpr(
                "freq",
                "explode(transform(sequence(1, size(syms) - 1),"
                " i -> struct(element_at(syms, i) AS s1,"
                " element_at(syms, i + 1) AS s2))) AS p",
            )
            .selectExpr("p.s1 AS s1", "p.s2 AS s2", "freq")
        )
        top = (
            pairs.groupBy("s1", "s2")
            .agg(F.sum("freq").cast("long").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("s1"), F.asc("s2"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        s1, s2, cnt = top[0]["s1"], top[0]["s2"], top[0]["pair_count"]
        merges.append((r, s1, s2, s1 + s2, cnt))
        state = state.selectExpr(
            "freq",
            f"replace(state, '|{s1}|{s2}|', '|{s1}{s2}|') AS state",
        ).transform(lazy_ckpt)
    return spark.createDataFrame(
        merges,
        schema="round BIGINT, left_sym STRING, right_sym STRING, "
        "merged STRING, pair_count BIGINT",
    )


def corpus_bpe_train_oracle(rounds: int = 6, table: str = "documents") -> str:
    toks = tokens_sql("text", "duckdb")
    head = f"""WITH words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest({toks}) AS word FROM {table})
  WHERE regexp_matches(word, '^[a-z0-9]+$')
  GROUP BY word
),
st1 AS (SELECT freq, '|' || regexp_replace(word, '(.)', '\\1|', 'g') AS state
        FROM words)"""
    parts = [head]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
p{r} AS (
  SELECT syms[CAST(i AS INT)] AS s1, syms[CAST(i AS INT) + 1] AS s2, freq
  FROM (SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i
        FROM (SELECT freq,
                     list_filter(string_split(state, '|'), t -> t <> '') AS syms
              FROM st{r})
        WHERE len(syms) >= 2)
),
w{r} AS (
  SELECT s1, s2, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM p{r} GROUP BY s1, s2
  ORDER BY pair_count DESC, s1 ASC, s2 ASC LIMIT 1
),
st{r + 1} AS (
  SELECT freq, replace(state, '|' || w.s1 || '|' || w.s2 || '|',
                       '|' || w.s1 || w.s2 || '|') AS state
  FROM st{r} CROSS JOIN w{r} w
)"""
        )
    selects = [
        f"SELECT CAST({r} AS BIGINT) AS round, s1 AS left_sym, s2 AS right_sym,"
        f" s1 || s2 AS merged, pair_count FROM w{r}"
        for r in range(1, rounds + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def corpus_bpe_encode_stats(df: DataFrame, rounds: int = 6) -> DataFrame:
    """Apply the ``rounds`` merges learned by :func:`corpus_bpe_train`
    back to the corpus and report per-``source`` encoding stats —
    the train→encode lifecycle of a real tokenizer pipeline, with the
    compression ratio as the figure of merit:

        (source, n_words, chars_total, symbols_after, compression)

    where ``symbols_after`` counts BPE symbols per word after the
    merges and ``compression = chars_total / symbols_after`` floored
    to 6 dp (integer inputs, so the division is the only float op).

    Encoding applies the SAME delimited-string rewrite as training —
    merge r's ``replace`` runs against every word state in learned
    order, exactly how the trainer rewrote its vocabulary (including
    the declared repeated-run semantics), so the encoder IS the
    trainer's rewrite path and the oracle reuses the trainer's
    unrolled winner CTEs as scalar subqueries.

    Plan shape (100 TB): train touches the corpus once (word-count
    agg) + vocab-sized rounds; encoding is a scan-side projection —
    tokenize, per-word state build, ``rounds`` nested literal
    replaces, one count — followed by a single per-source hash agg.
    The merge table rides into the plan as literals (it was R driver
    rows), the Spark analogue of broadcasting the tokenizer model.
    """
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in corpus_bpe_train(df, rounds=rounds).collect()
    ]
    state = "concat('|', regexp_replace(word, '(.)', '$1|'))"
    for s1, s2 in merges:
        state = f"replace({state}, '|{s1}|{s2}|', '|{s1}{s2}|')"
    words = df.selectExpr(
        "source", f"explode({tokens_sql('text', 'spark')}) AS word"
    ).where(F.expr("word RLIKE '^[a-z0-9]+$'"))
    scored = words.selectExpr(
        "source",
        "length(word) AS n_chars",
        f"size(filter(split({state}, '\\\\|'), t -> t <> '')) AS n_syms",
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.sum("n_syms").cast("long").alias("symbols_after"),
        )
        .selectExpr(
            "source", "n_words", "chars_total", "symbols_after",
            "floor(CAST(chars_total AS DOUBLE) / CAST(symbols_after AS DOUBLE)"
            " * 1e6) / 1e6 AS compression",
        )
    )


def corpus_bpe_encode_stats_oracle(rounds: int = 6, table: str = "documents") -> str:
    toks = tokens_sql("text", "duckdb")
    # reuse the trainer's unrolled CTE chain for the merge winners
    train = corpus_bpe_train_oracle(rounds=rounds, table=table)
    ctes = train[: train.rindex("\nSELECT CAST(1 AS BIGINT)")]
    state = "'|' || regexp_replace(word, '(.)', '\\1|', 'g')"
    for r in range(1, rounds + 1):
        state = (
            f"replace({state},"
            f" (SELECT '|' || s1 || '|' || s2 || '|' FROM w{r}),"
            f" (SELECT '|' || s1 || s2 || '|' FROM w{r}))"
        )
    return f"""{ctes},
corpus_words AS (
  SELECT source, word
  FROM (SELECT source, unnest({toks}) AS word FROM {table})
  WHERE regexp_matches(word, '^[a-z0-9]+$')
),
encoded AS (
  SELECT source,
         length(word) AS n_chars,
         len(list_filter(string_split({state}, '|'), t -> t <> '')) AS n_syms
  FROM corpus_words
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(n_syms) AS BIGINT) AS symbols_after,
       floor(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_syms) AS DOUBLE) * 1e6)
         / 1e6 AS compression
FROM encoded GROUP BY source"""


def zipf_fit(df: DataFrame) -> DataFrame:
    """Zipf's-law fit of the corpus frequency spectrum: OLS of
    ln(term_count) on ln(rank) over the full vocabulary — the standard
    "is this corpus natural text?" screen (natural language ⇒ slope
    ≈ −1; the synthetic harness corpus's ~100-word uniform vocabulary
    shows up as a flat slope, which is exactly the diagnostic working).

    Determinism contract: the regression points are the FLOORED logs
    x = ⌊ln(rank)·1e9⌋, y = ⌊ln(count)·1e9⌋ (exact BIGINTs, both
    engines), all moment sums run as DECIMAL(38,0) (order-independent;
    headroom to ~1e7 token types), and only the final slope/intercept/r²
    are doubles, floored at 1e-6 — the ``operators/stats.py`` moment
    discipline applied in log space.

    Shape: tokenize+explode scan-side, one hash agg to the vocabulary
    (token-type-bounded, never corpus-sized), a single global
    row_number for ranks (vocab rows only — acceptable up to millions;
    beyond that rank = 1 + count of strictly-greater counts, a
    self-agg), one reduce for the moments.  Output:
    (n_types, slope, intercept, r2) with intercept in ln units."""
    toks = df.selectExpr("doc_id", f"{tokens_sql('text', 'spark')} AS toks")
    counts = (
        toks.select(F.explode_outer("toks").alias("token"))
        .where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    pts = counts.withColumn("rank", F.row_number().over(w)).selectExpr(
        "CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000000) AS DECIMAL(38,0)) AS x",
        "CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000000) AS DECIMAL(38,0)) AS y",
    )
    m = pts.selectExpr(
        "CAST(COUNT(*) AS BIGINT) AS n",
        "SUM(x) AS sx",
        "SUM(y) AS sy",
        "SUM(x * y) AS pxy",
        "SUM(x * x) AS qx",
        "SUM(y * y) AS qy",
    )
    num = "CAST(n * pxy - sx * sy AS DOUBLE)"
    den = "CAST(n * qx - sx * sx AS DOUBLE)"
    dy = "CAST(n * qy - sy * sy AS DOUBLE)"
    slope = f"({num} / {den})"
    return m.selectExpr(
        "n AS n_types",
        f"floor({slope} * 1000000) / 1000000 AS slope",
        f"floor((CAST(sy AS DOUBLE) - {slope} * CAST(sx AS DOUBLE)) / n / 1000000000"
        " * 1000000) / 1000000 AS intercept",
        f"floor({num} * {num} / ({den} * {dy}) * 1000000) / 1000000 AS r2",
    )


def zipf_fit_oracle(table: str = "documents") -> str:
    toks = tokens_sql("text", "duckdb")
    num = "CAST(n * pxy - sx * sy AS DOUBLE)"
    den = "CAST(n * qx - sx * sx AS DOUBLE)"
    dy = "CAST(n * qy - sy * sy AS DOUBLE)"
    slope = f"({num} / {den})"
    return f"""WITH counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({toks}) AS token FROM {table})
  GROUP BY token),
ranked AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank FROM counts),
pts AS (
  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000000) AS DECIMAL(38,0)) AS x,
         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000000) AS DECIMAL(38,0)) AS y
  FROM ranked),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS pxy, SUM(x * x) AS qx, SUM(y * y) AS qy
  FROM pts)
SELECT n AS n_types,
  floor({slope} * 1000000) / 1000000 AS slope,
  floor((CAST(sy AS DOUBLE) - {slope} * CAST(sx AS DOUBLE)) / n / 1000000000 * 1000000) / 1000000 AS intercept,
  floor({num} * {num} / ({den} * {dy}) * 1000000) / 1000000 AS r2
FROM m"""


# ---------------------------------------------------------------------------
# Corpus-level PMI collocations (the association upgrade of bigram counts)
# ---------------------------------------------------------------------------

def pmi_collocations(df: DataFrame, min_count: int = 5, k: int = 20) -> DataFrame:
    """Top-k collocations by pointwise mutual information — the classic
    phrase-mining signal (Church & Hanks 1990): PMI(t1, t2) =
    ln(P(t1,t2) / (P(t1·*)·P(*·t2))) over bigram positions, with a
    ``min_count`` floor so hapax pairs (PMI's known pathology: two
    tokens that co-occur exactly once score maximal) never rank.
    Feeds tokenizer-vocab phrase induction and boilerplate detection —
    a corpus-level statistic, where :func:`doc_bigram_surprisal` is
    per-document.

    Plan shape (100 TB): ONE bigram materialization feeds three hash
    aggregates — bigram counts, prefix marginals (t1·*), suffix
    marginals (*·t2); scoring is two vocabulary-sized equi-joins plus
    the 1-row total-bigrams cross (declared cardinality × 1, the woe
    shape); top-k is TakeOrdered, never a global sort.  All counts
    exact BIGINT; PMI is ONE closed-form ``ln`` over an exact integer
    ratio, identical text both engines, floored at 1e-6.

    Output (≤ k rows): (t1, t2, c_bg, pmi).
    """
    toks = df.selectExpr(f"{tokens_sql('text', 'spark')} AS toks")
    bi = toks.selectExpr(
        "explode(CASE WHEN size(toks) >= 2 THEN transform("
        "sequence(1, size(toks) - 1),"
        " i -> struct(element_at(toks, i) AS t1, element_at(toks, i + 1) AS t2))"
        " ELSE array() END) AS bg",
    ).selectExpr("bg.t1 AS t1", "bg.t2 AS t2").localCheckpoint(eager=False)
    cnt_bg = bi.groupBy("t1", "t2").agg(F.count("*").cast("long").alias("c_bg"))
    cnt_pre = bi.groupBy("t1").agg(F.count("*").cast("long").alias("c_pre"))
    cnt_suf = bi.groupBy("t2").agg(F.count("*").cast("long").alias("c_suf"))
    tot = bi.agg(F.count("*").cast("long").alias("t_bg"))
    pmi = (
        "ln(CAST(c_bg AS DOUBLE) * t_bg / (CAST(c_pre AS DOUBLE) * c_suf))"
    )
    return (
        cnt_bg.where(F.col("c_bg") >= min_count)
        .join(cnt_pre, "t1")
        .join(cnt_suf, "t2")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "t1", "t2", "c_bg",
            f"floor({pmi} * 1000000) / 1000000 AS pmi",
        )
        .orderBy(F.col("pmi").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(k)
    )


def pmi_collocations_oracle(min_count: int = 5, k: int = 20) -> str:
    toks = tokens_sql("text", "duckdb")
    pmi = "ln(CAST(c_bg AS DOUBLE) * t_bg / (CAST(c_pre AS DOUBLE) * c_suf))"
    return f"""WITH toks AS (SELECT {toks} AS toks FROM documents),
bi AS (
  SELECT toks[CAST(i AS INT)] AS t1, toks[CAST(i AS INT) + 1] AS t2
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM toks WHERE len(toks) >= 2)),
cnt_bg AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c_bg FROM bi GROUP BY 1, 2),
cnt_pre AS (SELECT t1, CAST(COUNT(*) AS BIGINT) AS c_pre FROM bi GROUP BY 1),
cnt_suf AS (SELECT t2, CAST(COUNT(*) AS BIGINT) AS c_suf FROM bi GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_bg FROM bi)
SELECT cnt_bg.t1, cnt_bg.t2, c_bg,
  floor({pmi} * 1000000) / 1000000 AS pmi
FROM cnt_bg
JOIN cnt_pre ON cnt_bg.t1 = cnt_pre.t1
JOIN cnt_suf ON cnt_bg.t2 = cnt_suf.t2
CROSS JOIN tot
WHERE c_bg >= {min_count}
ORDER BY pmi DESC, cnt_bg.t1 ASC, cnt_bg.t2 ASC
LIMIT {k}"""


def collocation_communities(
    df: DataFrame, min_count: int = 5, n_edges: int = 100
) -> DataFrame:
    """Topic/phrase communities from the collocation graph — the
    text→graph composition a phrase-induction pipeline runs after PMI
    scoring: the top-``n_edges`` PMI collocations become an undirected
    token graph, and its CONNECTED COMPONENTS are the phrase clusters
    (tokens transitively glued by strong collocations — multiword
    entities, boilerplate families, code-identifier groups).  Reuses
    :func:`pmi_collocations` for the edges and the iterative hash-min
    label propagation of ``graph_iter.connected_components`` for the
    clustering — token STRINGS are the node ids (lexicographic min is
    identical in both engines for the ASCII token alphabet).

    Scale shape: the token graph is ≤ n_edges edges by construction
    (TakeOrdered on the PMI score), so everything after the corpus-
    sized bigram aggregation rides a bounded spine; label propagation
    converges in O(cluster diameter) ≤ n_edges passes.

    Output: (token, community) — one row per token in the graph,
    community = lexicographically smallest reachable token.
    """
    from twitter_followers_patterns_mapreduce_spark.operators.graph_iter import (
        connected_components,
    )

    edges = pmi_collocations(df, min_count=min_count, k=n_edges).select(
        F.col("t1").alias("src"), F.col("t2").alias("dst")
    )
    comp = connected_components(edges)
    return comp.select(F.col("id").alias("token"), F.col("comp").alias("community"))


def collocation_communities_oracle(min_count: int = 5, n_edges: int = 100) -> str:
    pmi = pmi_collocations_oracle(min_count=min_count, k=n_edges)
    return f"""WITH RECURSIVE top_e AS (
  SELECT t1, t2 FROM ({pmi})
), und AS (
  SELECT t1 AS a, t2 AS b FROM top_e UNION SELECT t2, t1 FROM top_e
), walk(id, r) AS (
  SELECT a, a FROM und
  UNION
  SELECT w.id, u.b FROM walk w JOIN und u ON w.r = u.a
)
SELECT id AS token, MIN(r) AS community FROM walk GROUP BY id"""


# ---------------------------------------------------------------------------
# Neyman allocation: variance-optimal stratified sampling budgets
# ---------------------------------------------------------------------------

def neyman_allocation(df: DataFrame, budget: int = 10_000) -> DataFrame:
    """Variance-optimal stratified sample budgets per source — Neyman
    allocation n_h ∝ N_h·σ_h: when building an eval/held-out set from
    a mixed corpus under a fixed labeling budget, equal or
    proportional quotas waste budget on low-variance strata; Neyman is
    the allocation that minimizes the stratified estimator's variance
    (here over ``n_chars``, the cheapest length proxy).  Pairs with
    :func:`splits.stratified_sample`, which consumes per-stratum
    quotas exactly like these.

    Scale shape: ONE map-side-combinable agg to |sources| rows, then a
    1-row Σ(N_h·σ_h) cross (the woe shape).  Exactness: n_chars is
    already integer, so Σx and Σx² are exact DECIMAL(38,0) sums; σ_h
    floors to a 1e-6-grid micro-BIGINT so N_h·σ_h products and their
    Σ are EXACT (decimal-widened N·σ products) — the allocation shares never touch an
    order-dependent double sum.  Output: (source, n_docs, mean_chars,
    std_chars, alloc_share, n_alloc).
    """
    cells = df.selectExpr("source", "CAST(n_chars AS BIGINT) AS x").groupBy(
        "source"
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).alias("s1"),
        F.sum(F.expr("CAST(x * x AS DECIMAL(38,0))")).alias("s2"),
    )
    mean = "(CAST(s1 AS DOUBLE) / n_docs)"
    var = f"(CAST(s2 AS DOUBLE) / n_docs - {mean} * {mean})"
    sigma_micro = (
        f"CASE WHEN {var} > 0 THEN CAST(floor(sqrt({var}) * 1000000) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
    )
    scored = cells.selectExpr(
        "source",
        "n_docs",
        f"floor({mean} * 1000000) / 1000000 AS mean_chars",
        f"CAST(({sigma_micro}) AS DOUBLE) / 1000000 AS std_chars",
        f"CAST(n_docs AS DECIMAL(38,0)) * ({sigma_micro}) AS w_micro",
    )
    tot = scored.agg(F.sum("w_micro").alias("w_tot"))
    share = "(CAST(w_micro AS DOUBLE) / CAST(w_tot AS DOUBLE))"
    return scored.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "n_docs",
        "mean_chars",
        "std_chars",
        f"floor({share} * 1000000) / 1000000 AS alloc_share",
        f"CAST(floor({budget} * {share}) AS BIGINT) AS n_alloc",
    )


def neyman_allocation_oracle(budget: int = 10_000) -> str:
    mean = "(CAST(s1 AS DOUBLE) / n_docs)"
    var = f"(CAST(s2 AS DOUBLE) / n_docs - {mean} * {mean})"
    sigma_micro = (
        f"CASE WHEN {var} > 0 THEN CAST(floor(sqrt({var}) * 1000000) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
    )
    share = "(CAST(w_micro AS DOUBLE) / CAST(w_tot AS DOUBLE))"
    return f"""WITH cells AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(CAST(CAST(n_chars AS BIGINT) AS DECIMAL(38,0))) AS s1,
         SUM(CAST(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT) AS DECIMAL(38,0))) AS s2
  FROM documents GROUP BY 1),
scored AS (
  SELECT source, n_docs,
    floor({mean} * 1000000) / 1000000 AS mean_chars,
    CAST(({sigma_micro}) AS DOUBLE) / 1000000 AS std_chars,
    CAST(n_docs AS DECIMAL(38,0)) * ({sigma_micro}) AS w_micro
  FROM cells),
tot AS (SELECT SUM(w_micro) AS w_tot FROM scored)
SELECT source, n_docs, mean_chars, std_chars,
  floor({share} * 1000000) / 1000000 AS alloc_share,
  CAST(floor({budget} * {share}) AS BIGINT) AS n_alloc
FROM scored CROSS JOIN tot"""


# ---------------------------------------------------------------------------
# Heaps' law: vocabulary growth V(n) ~ k·n^beta (the dual of the Zipf screen)
# ---------------------------------------------------------------------------

def heaps_law_fit(df: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Vocabulary-growth curve + Heaps'-law fit — THE dedup/coverage
    planning statistic (how fast does new vocabulary appear as the
    corpus grows: β ≈ 0.5 for natural text; β near 1 screams
    boilerplate-free unique junk, β near 0 screams duplication), the
    corpus-growth dual of the rank-frequency Zipf screen
    (:func:`doc_zipf_fit`).

    The growth curve needs NO multi-pass rescan: docs land in
    ``n_buckets`` deterministic h64 buckets; each token's FIRST bucket
    (min bucket containing it) says exactly where it enters the
    cumulative vocabulary, so V(prefix m) = Σ_{b ≤ m} first_seen(b) —
    one distinct-token agg + a cumulative window over the bounded
    bucket spine (the degree_gini discipline).  The β/k fit is
    closed-form OLS on the ≤ n_buckets (ln n, ln V) points, computed
    with window sums over the same spine; every float op identical
    text on both engines, floored at 1e-6.

    Output (n_buckets rows): (prefix, n_tokens_cum, vocab_cum, beta,
    ln_k, r2) — fit columns repeated per row for one-query readout.
    """
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(doc_id AS STRING)", "spark")
    toks = df.selectExpr(
        f"{h} % {n_buckets} AS bucket",
        f"explode({tokens_sql('text', 'spark')}) AS tok",
    )
    per_bucket_tokens = toks.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_tok")
    )
    first_seen = (
        toks.groupBy("tok")
        .agg(F.min("bucket").cast("long").alias("b0"))
        .groupBy(F.col("b0").alias("bucket"))
        .agg(F.count("*").cast("long").alias("v_new"))
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    spine = (
        per_bucket_tokens.join(first_seen, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_tok").over(w_cum).cast("long").alias("n_tokens_cum"),
            F.sum(F.coalesce("v_new", F.lit(0))).over(w_cum).cast("long").alias("vocab_cum"),
        )
        .selectExpr(
            "bucket + 1 AS prefix",
            "n_tokens_cum",
            "vocab_cum",
            "ln(CAST(n_tokens_cum AS DOUBLE)) AS lx",
            "ln(CAST(vocab_cum AS DOUBLE)) AS ly",
        )
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    fit = spine.select(
        "prefix",
        "n_tokens_cum",
        "vocab_cum",
        "lx",
        "ly",
        F.count("*").over(w_all).alias("np"),
        F.sum("lx").over(w_all).alias("sx"),
        F.sum("ly").over(w_all).alias("sy"),
        F.sum(F.expr("lx * lx")).over(w_all).alias("sxx"),
        F.sum(F.expr("lx * ly")).over(w_all).alias("sxy"),
        F.sum(F.expr("ly * ly")).over(w_all).alias("syy"),
    )
    beta = "((np * sxy - sx * sy) / (np * sxx - sx * sx))"
    lnk = f"((sy - {beta} * sx) / np)"
    r2 = (
        f"((np * sxy - sx * sy) * (np * sxy - sx * sy)"
        f" / ((np * sxx - sx * sx) * (np * syy - sy * sy)))"
    )
    return fit.selectExpr(
        "prefix",
        "n_tokens_cum",
        "vocab_cum",
        f"floor({beta} * 1000000) / 1000000 AS beta",
        f"floor({lnk} * 1000000) / 1000000 AS ln_k",
        f"floor({r2} * 1000000) / 1000000 AS r2",
    )


def heaps_law_fit_oracle(n_buckets: int = 10) -> str:
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(doc_id AS VARCHAR)", "duckdb")
    toks = tokens_sql("text", "duckdb")
    beta = "((np * sxy - sx * sy) / (np * sxx - sx * sx))"
    lnk = f"((sy - {beta} * sx) / np)"
    r2 = (
        f"((np * sxy - sx * sy) * (np * sxy - sx * sy)"
        f" / ((np * sxx - sx * sx) * (np * syy - sy * sy)))"
    )
    return f"""WITH toks AS (
  SELECT {h} % {n_buckets} AS bucket, unnest({toks}) AS tok FROM documents),
pbt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY 1),
fs AS (
  SELECT b0 AS bucket, CAST(COUNT(*) AS BIGINT) AS v_new FROM (
    SELECT tok, CAST(MIN(bucket) AS BIGINT) AS b0 FROM toks GROUP BY 1)
  GROUP BY 1),
spine AS (
  SELECT pbt.bucket + 1 AS prefix,
    CAST(SUM(n_tok) OVER w AS BIGINT) AS n_tokens_cum,
    CAST(SUM(coalesce(v_new, 0)) OVER w AS BIGINT) AS vocab_cum
  FROM pbt LEFT JOIN fs ON pbt.bucket = fs.bucket
  WINDOW w AS (ORDER BY pbt.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
pts AS (
  SELECT prefix, n_tokens_cum, vocab_cum,
         ln(CAST(n_tokens_cum AS DOUBLE)) AS lx,
         ln(CAST(vocab_cum AS DOUBLE)) AS ly
  FROM spine),
fit AS (
  SELECT prefix, n_tokens_cum, vocab_cum, lx, ly,
    COUNT(*) OVER wa AS np, SUM(lx) OVER wa AS sx, SUM(ly) OVER wa AS sy,
    SUM(lx * lx) OVER wa AS sxx, SUM(lx * ly) OVER wa AS sxy,
    SUM(ly * ly) OVER wa AS syy
  FROM pts
  WINDOW wa AS (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT prefix, n_tokens_cum, vocab_cum,
  floor({beta} * 1000000) / 1000000 AS beta,
  floor({lnk} * 1000000) / 1000000 AS ln_k,
  floor({r2} * 1000000) / 1000000 AS r2
FROM fit"""


def doc_keyphrases(
    df: DataFrame, min_count: int = 5, per_doc: int = 3
) -> DataFrame:
    """Per-document keyphrases: each doc's top-``per_doc`` bigrams
    ranked by the CORPUS-level PMI score (:func:`pmi_collocations` is
    the corpus top-k; this projects the same statistic back onto every
    document — the "what is this doc about" extraction a curation UI
    or a topic-sampling mixture needs per row).  The ``min_count``
    floor keeps hapax pairs (PMI's pathology) out of every doc.

    Plan shape: ONE bigram materialization feeds the corpus counts AND
    the per-doc distinct bigram sets; scoring is a vocabulary-sized
    equi-join; the per-doc top-k is a window PARTITIONED BY doc_id
    (defined shuffle key — never a global rank).  PMI is the family's
    single closed-form ``ln`` over exact integer counts, floored 1e-6;
    ties break (t1, t2) so ranks are deterministic.

    Output (≤ per_doc rows per doc): (doc_id, rank, t1, t2, c_bg, pmi).
    """
    from pyspark.sql import Window

    toks = df.selectExpr("doc_id", f"{tokens_sql('text', 'spark')} AS toks")
    bi = (
        toks.selectExpr(
            "doc_id",
            "explode(CASE WHEN size(toks) >= 2 THEN transform("
            "sequence(1, size(toks) - 1),"
            " i -> struct(element_at(toks, i) AS t1, element_at(toks, i + 1) AS t2))"
            " ELSE array() END) AS bg",
        )
        .selectExpr("doc_id", "bg.t1 AS t1", "bg.t2 AS t2")
        .localCheckpoint(eager=False)
    )
    cnt_bg = bi.groupBy("t1", "t2").agg(F.count("*").cast("long").alias("c_bg"))
    cnt_pre = bi.groupBy("t1").agg(F.count("*").cast("long").alias("c_pre"))
    cnt_suf = bi.groupBy("t2").agg(F.count("*").cast("long").alias("c_suf"))
    tot = bi.agg(F.count("*").cast("long").alias("t_bg")).selectExpr(
        "t_bg", "t_bg - t_bg AS _z"
    )
    scored = (
        cnt_bg.where(F.col("c_bg") >= min_count)
        .join(cnt_pre, "t1")
        .join(cnt_suf, "t2")
        .withColumn("_z", F.expr("pmod(c_bg, 1)"))
        .join(F.broadcast(tot), "_z")
        .selectExpr(
            "t1",
            "t2",
            "c_bg",
            "floor(ln(CAST(c_bg AS DOUBLE) * t_bg"
            " / (CAST(c_pre AS DOUBLE) * c_suf)) * 1000000) / 1000000 AS pmi",
        )
    )
    doc_bg = bi.select("doc_id", "t1", "t2").distinct()
    w = Window.partitionBy("doc_id").orderBy(
        F.col("pmi").desc(), F.col("t1").asc(), F.col("t2").asc()
    )
    return (
        doc_bg.join(scored, ["t1", "t2"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_doc)
        .selectExpr("doc_id", "CAST(rank AS BIGINT) AS rank", "t1", "t2", "c_bg", "pmi")
    )


def doc_keyphrases_oracle(min_count: int = 5, per_doc: int = 3) -> str:
    toks = tokens_sql("text", "duckdb")
    pmi = (
        "floor(ln(CAST(c_bg AS DOUBLE) * t_bg"
        " / (CAST(c_pre AS DOUBLE) * c_suf)) * 1000000) / 1000000"
    )
    return f"""WITH toks AS (SELECT doc_id, {toks} AS toks FROM documents),
bi AS (
  SELECT doc_id, toks[CAST(i AS INT)] AS t1, toks[CAST(i AS INT) + 1] AS t2
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM toks WHERE len(toks) >= 2)),
cnt_bg AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c_bg FROM bi GROUP BY 1, 2),
cnt_pre AS (SELECT t1, CAST(COUNT(*) AS BIGINT) AS c_pre FROM bi GROUP BY 1),
cnt_suf AS (SELECT t2, CAST(COUNT(*) AS BIGINT) AS c_suf FROM bi GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_bg FROM bi),
scored AS (
  SELECT cnt_bg.t1, cnt_bg.t2, c_bg, {pmi} AS pmi
  FROM cnt_bg JOIN cnt_pre ON cnt_bg.t1 = cnt_pre.t1
  JOIN cnt_suf ON cnt_bg.t2 = cnt_suf.t2
  CROSS JOIN tot
  WHERE c_bg >= {min_count}),
doc_bg AS (SELECT DISTINCT doc_id, t1, t2 FROM bi),
ranked AS (
  SELECT d.doc_id, s.t1, s.t2, s.c_bg, s.pmi,
         ROW_NUMBER() OVER (PARTITION BY d.doc_id
           ORDER BY s.pmi DESC, s.t1 ASC, s.t2 ASC) AS rank
  FROM doc_bg d JOIN scored s ON d.t1 = s.t1 AND d.t2 = s.t2)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, t1, t2, c_bg, pmi
FROM ranked WHERE rank <= {per_doc}"""
