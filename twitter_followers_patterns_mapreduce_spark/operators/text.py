"""Text-analysis operators over the ``documents`` table (extension
surface — SURVEY.md §7.3 M5; the reference has no string functions
beyond split/concat, SURVEY.md §2.6).

Every operator is a *select-list builder* emitted in two dialects —
``spark`` (run via ``selectExpr``; all expressions are built-in SQL
functions inside whole-stage codegen, zero Python UDFs) and ``duckdb``
(the oracle SQL) — so Spark plan and oracle share one definition and
parity is by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.sources.readers import fan_out
from twitter_followers_patterns_mapreduce_spark.functions.textfns import (
    LANG_STOPWORDS,
    bpe_ish_tokens_sql,
    count_in_set_sql,
    doc_fingerprint_sql,
    lang_id_sql,
    shingles_sql,
    size_sql,
    tokens_sql,
)


def token_stats_select(dialect: str, text: str = "text") -> list[tuple[str, str]]:
    """(expr, alias) pairs for per-document token statistics.

    All ratios are double divisions with identical shape in both
    dialects (int/int `/` yields double in Spark SQL and DuckDB alike),
    rounded to 6 so cross-engine doubles hash identically.
    """
    toks = tokens_sql(text, dialect)
    n = size_sql(toks, dialect)
    distinct = (
        f"size(array_distinct({toks}))" if dialect == "spark" else f"len(list_distinct({toks}))"
    )
    bpe = size_sql(bpe_ish_tokens_sql(text, dialect), dialect)
    if dialect == "spark":
        tok_chars = f"aggregate(transform({toks}, t -> length(t)), 0, (a, x) -> a + x)"
        punct = f"length(regexp_replace({text}, '[a-zA-Z0-9\\\\s]', ''))"
    else:
        tok_chars = f"list_aggregate(list_transform({toks}, t -> len(t)), 'sum')"
        punct = f"length(regexp_replace({text}, '[a-zA-Z0-9\\s]', '', 'g'))"
    stop_en = count_in_set_sql(toks, LANG_STOPWORDS["en"], dialect)
    # greatest(..., 1) zero-guards: ANSI-mode division by zero throws
    # (Spark 4 default), and empty/whitespace-only docs have 0 tokens
    # and length 0 — ratios then read 0, identically in both dialects
    # (same convention as repetition_select below)
    n1 = f"greatest({n}, 1)"
    len1 = f"greatest(length({text}), 1)"
    return [
        ("doc_id", "doc_id"),
        (f"CAST({n} AS BIGINT)", "n_tokens"),
        (f"CAST({distinct} AS BIGINT)", "n_unique_tokens"),
        (f"CAST({bpe} AS BIGINT)", "n_bpe_tokens"),
        (f"CAST(length({text}) AS BIGINT)", "n_chars"),
        (f"round(CAST({tok_chars} AS DOUBLE) / {n1}, 6)", "avg_token_len"),
        (f"round(CAST({punct} AS DOUBLE) / {len1}, 6)", "punct_ratio"),
        (f"round(CAST({stop_en} AS DOUBLE) / {n1}, 6)", "stopword_ratio"),
    ]


def quality_score_select(dialect: str, text: str = "text") -> list[tuple[str, str]]:
    """Composite document-quality heuristic: length saturation, lexical
    diversity, low punctuation, stopword plausibility.  Weights are
    arbitrary but fixed; the point is deterministic, scalable scoring."""
    toks = tokens_sql(text, dialect)
    n = size_sql(toks, dialect)
    distinct = (
        f"size(array_distinct({toks}))" if dialect == "spark" else f"len(list_distinct({toks}))"
    )
    if dialect == "spark":
        punct = f"length(regexp_replace({text}, '[a-zA-Z0-9\\\\s]', ''))"
    else:
        punct = f"length(regexp_replace({text}, '[a-zA-Z0-9\\s]', '', 'g'))"
    stop_en = count_in_set_sql(toks, LANG_STOPWORDS["en"], dialect)
    # NB: every division keeps an explicit DOUBLE operand — Spark parses
    # bare `x/1.0` as DECIMAL division (different rounding than DuckDB).
    # greatest(..., 1) zero-guards empty/whitespace-only docs (ANSI-mode
    # division by zero throws; see token_stats_select).
    n1 = f"greatest({n}, 1)"
    len1 = f"greatest(length({text}), 1)"
    score = (
        f"round(0.4 * least(1.0, CAST({n} AS DOUBLE) / 200.0)"
        f" + 0.3 * (CAST({distinct} AS DOUBLE) / {n1})"
        f" + 0.2 * (1.0 - CAST({punct} AS DOUBLE) / {len1})"
        f" + 0.1 * (CAST({stop_en} AS DOUBLE) / {n1}), 6)"
    )
    return [("doc_id", "doc_id"), (score, "quality_score")]


def lang_id_select(dialect: str, text: str = "text") -> list[tuple[str, str]]:
    """Stopword-voting language ID with deterministic tie-break."""
    toks = tokens_sql(text, dialect)
    return [
        ("doc_id", "doc_id"),
        ("lang", "labeled_lang"),
        (lang_id_sql(toks, dialect), "pred_lang"),
    ]


def fingerprint_select(dialect: str, text: str = "text") -> list[tuple[str, str]]:
    """Content fingerprint: min-h64 over 3-word shingles (1-perm minhash)."""
    return [
        ("doc_id", "doc_id"),
        (doc_fingerprint_sql(text, dialect), "fingerprint"),
    ]


def select_sql(table: str, pairs: list[tuple[str, str]], where: str | None = None) -> str:
    """Assemble a SELECT for the duckdb oracle from (expr, alias) pairs."""
    cols = ",\n  ".join(f"{e} AS {a}" for e, a in pairs)
    w = f"\nWHERE {where}" if where else ""
    return f"SELECT\n  {cols}\nFROM {table}{w}"


def apply_select(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Run the spark-dialect (expr, alias) pairs as a selectExpr."""
    return df.selectExpr(*[f"{e} AS {a}" for e, a in pairs])


def doc_token_stats(documents: DataFrame) -> DataFrame:
    # fan_out: the projection is heavy per-row work (tokenize + regex +
    # array folds), and a single-row-group documents parquet otherwise
    # pins it to ONE task — measured 16s for 50k docs at sf1 vs ~1s
    # fanned out (the scan bytes are trivial; the WORK needs splitting)
    return apply_select(fan_out(documents), token_stats_select("spark"))


def doc_quality_score(documents: DataFrame) -> DataFrame:
    # fan_out: same per-row-work rationale as doc_token_stats
    return apply_select(fan_out(documents), quality_score_select("spark"))


def doc_language_id(documents: DataFrame) -> DataFrame:
    """Staged Spark form of ``lang_id_select`` (same values): tokens are
    projected once, then the five per-language stopword scores, then the
    argmax CASE over the cheap score columns.  The one-expression form
    inlines the tokenizer into every score reference (~30 copies across
    the WHENs / greatest() lists / zero-total guard), re-splitting the
    text per reference."""
    from twitter_followers_patterns_mapreduce_spark.functions.textfns import LANG_PRIORITY

    toks = tokens_sql("text", "spark")
    # fan_out: same per-row-work rationale as doc_token_stats
    staged = fan_out(documents).selectExpr(
        "doc_id", "lang AS labeled_lang", f"{toks} AS __toks"
    )
    scored = staged.selectExpr(
        "doc_id",
        "labeled_lang",
        *[
            f"{count_in_set_sql('__toks', words, 'spark')} AS __s_{lang}"
            for lang, words in LANG_STOPWORDS.items()
        ],
    )
    whens = " ".join(
        f"WHEN __s_{lang} >= greatest({', '.join('__s_' + o for o in LANG_PRIORITY if o != lang)}) "
        f"THEN '{lang}'"
        for lang in LANG_PRIORITY
    )
    total = " + ".join(f"__s_{lang}" for lang in LANG_PRIORITY)
    pred = f"CASE WHEN ({total}) = 0 THEN 'und' {whens} ELSE 'und' END"
    return scored.selectExpr("doc_id", "labeled_lang", f"{pred} AS pred_lang")


def curate_documents(documents: DataFrame, min_quality: float = 0.45) -> DataFrame:
    """End-to-end corpus curation: keep documents that (a) survive exact
    dedup as their group's best copy, (b) score ≥ ``min_quality``, and
    (c) have their language confirmed by the stopword classifier.  The
    composed filter a training-data pipeline runs before tokenization —
    all three stages are scan-side selects plus one semi-join against
    the keeper set."""
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        exact_dedup_keep_best,
    )

    quality = doc_quality_score(documents)
    langs = doc_language_id(documents)
    keepers = exact_dedup_keep_best(documents).select(
        F.col("keeper_id").alias("doc_id")
    )
    return (
        documents.select("doc_id", "lang")
        .join(quality, "doc_id")
        .join(langs.select("doc_id", "pred_lang"), "doc_id")
        .join(keepers, "doc_id", "left_semi")
        .where((F.col("quality_score") >= min_quality) & (F.col("pred_lang") == F.col("lang")))
        .select("doc_id", "lang", "quality_score")
    )


def curate_documents_oracle(min_quality: float = 0.45) -> str:
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        exact_dedup_keep_best_oracle,
    )

    q = select_sql("documents", quality_score_select("duckdb"))
    lg = select_sql("documents", lang_id_select("duckdb"))
    return f"""WITH q AS ({q}),
lg AS ({lg}),
keepers AS ({exact_dedup_keep_best_oracle()})
SELECT d.doc_id, d.lang, q.quality_score
FROM documents d
JOIN q ON q.doc_id = d.doc_id
JOIN lg ON lg.doc_id = d.doc_id
WHERE q.quality_score >= {min_quality}
  AND lg.pred_lang = d.lang
  AND EXISTS (SELECT 1 FROM keepers k WHERE k.keeper_id = d.doc_id)"""


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Staged Spark form of ``fingerprint_select`` (same values): tokens
    → shingles → hashes as separate projections so the tokenizer runs
    once per doc, not once per shingle (the inlined one-expression form
    is O(tokens²) per doc — see dedup.shingled_docs)."""
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql
    from twitter_followers_patterns_mapreduce_spark.functions.textfns import (
        shingles_sql,
        tokens_sql,
    )

    return (
        # fan_out: same per-row-work rationale as doc_token_stats
        fan_out(documents)
        .selectExpr("doc_id", "text", f"{tokens_sql('text', 'spark')} AS toks")
        .selectExpr("doc_id", "text", f"{shingles_sql('toks', 3, 'spark')} AS sh")
        .selectExpr(
            "doc_id",
            f"coalesce(array_min(transform(sh, s -> {h64_sql('s', 'spark')})), "
            f"{h64_sql('text', 'spark')}) AS fingerprint",
        )
    )


def repetition_select(dialect: str, text: str = "text") -> list[tuple[str, str]]:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1 — public
    quality-filter heuristics), all scan-side array expressions:

      * dup_token_ratio  — fraction of token occurrences that repeat an
        earlier occurrence (1 - unique/total)
      * top_token_ratio  — share of the most frequent token
      * dup_bigram_ratio — fraction of bigram occurrences that repeat

    The per-doc top-token count is an O(u·n) nested lambda — bounded by
    document length, evaluated once per row inside codegen; no shuffle,
    no explode, so the operator composes with any downstream filter at
    scan cost.

    Expressions reference a staged ``toks`` column — callers project it
    first (:func:`doc_repetition_stats` / the oracle's subquery); all
    ratios are zero-guarded because ANSI-mode division by zero throws."""
    if dialect == "spark":
        n = "size(toks)"
        uniq = "size(array_distinct(toks))"
        top = "array_max(transform(array_distinct(toks), d -> size(filter(toks, t -> t = d))))"
        bi_uniq = f"size({shingles_sql('toks', 2, dialect)})"
    else:
        n = "len(toks)"
        uniq = "len(list_distinct(toks))"
        top = "list_max(list_transform(list_distinct(toks), d -> len(list_filter(toks, t -> t = d))))"
        bi_uniq = f"len({shingles_sql('toks', 2, dialect)})"
    zero = "CAST(0.0 AS DOUBLE)"
    pairs = [
        ("doc_id", "doc_id"),
        (f"CAST({n} AS BIGINT)", "n_tokens"),
        (f"CASE WHEN {n} = 0 THEN {zero} "
         f"ELSE round(1.0 - CAST({uniq} AS DOUBLE) / {n}, 6) END", "dup_token_ratio"),
        (f"CASE WHEN {n} = 0 THEN {zero} "
         f"ELSE round(CAST({top} AS DOUBLE) / {n}, 6) END", "top_token_ratio"),
        (f"CASE WHEN {n} >= 2 THEN round(1.0 - CAST({bi_uniq} AS DOUBLE) / ({n} - 1), 6) "
         f"ELSE {zero} END", "dup_bigram_ratio"),
    ]
    return pairs


def doc_repetition_stats(documents: DataFrame) -> DataFrame:
    """Staged form of ``repetition_select``: tokens projected once (see
    ``doc_language_id`` for why inlining re-splits the text per
    reference), ratios over the cheap staged column."""
    from twitter_followers_patterns_mapreduce_spark.sources.readers import fan_out

    toks = tokens_sql("text", "spark")
    staged = fan_out(documents).selectExpr(
        "doc_id", f"coalesce({toks}, array()) AS toks"
    )
    pairs = [(e, a) for e, a in repetition_select("spark") if a != "doc_id"]
    return staged.selectExpr("doc_id", *[f"{e} AS {a}" for e, a in pairs])


def repetition_oracle() -> str:
    """DuckDB mirror — the WITH-staged form of the same expressions."""
    toks = tokens_sql("text", "duckdb")
    pairs = [(e, a) for e, a in repetition_select("duckdb") if a != "doc_id"]
    cols = ",\n  ".join(f"{e} AS {a}" for e, a in pairs)
    return f"""SELECT doc_id,\n  {cols}\nFROM (SELECT doc_id, {toks} AS toks FROM documents)"""


def lang_confusion_matrix(documents: DataFrame) -> DataFrame:
    """Label-quality audit: the (labeled_lang, pred_lang) confusion
    matrix of the lang-ID heuristic with per-cell share of the labeled
    row — the table that decides whether to trust provided labels or
    the classifier before building per-language corpora.

    Composes :func:`doc_language_id` (one scan, staged scores) with two
    hash aggregations; the row-total attaches by a labeled_lang
    equi-join (dimension-sized, broadcast)."""
    pred = doc_language_id(documents)
    cells = pred.groupBy("labeled_lang", "pred_lang").agg(
        F.count("*").alias("n_docs")
    )
    totals = pred.groupBy("labeled_lang").agg(F.count("*").alias("n_labeled"))
    return cells.join(F.broadcast(totals), "labeled_lang").select(
        "labeled_lang",
        "pred_lang",
        "n_docs",
        "n_labeled",
        F.round(
            F.col("n_docs").cast("double") / F.col("n_labeled").cast("double"), 6
        ).alias("share_of_label"),
        (F.col("labeled_lang") == F.col("pred_lang")).alias("agree"),
    )


def lang_confusion_matrix_oracle() -> str:
    sel = ", ".join(f"{expr} AS {name}" for expr, name in lang_id_select("duckdb"))
    return f"""WITH pred AS (
  SELECT {sel} FROM documents
), cells AS (
  SELECT labeled_lang, pred_lang, COUNT(*) AS n_docs
  FROM pred GROUP BY 1, 2
), totals AS (
  SELECT labeled_lang, COUNT(*) AS n_labeled FROM pred GROUP BY 1
)
SELECT c.labeled_lang, c.pred_lang, c.n_docs, t.n_labeled,
  round(CAST(c.n_docs AS DOUBLE) / CAST(t.n_labeled AS DOUBLE), 6) AS share_of_label,
  c.labeled_lang = c.pred_lang AS agree
FROM cells c JOIN totals t USING (labeled_lang)"""


def curation_funnel(documents: DataFrame, min_quality: float = 0.45) -> DataFrame:
    """Pipeline observability: the survivorship funnel of the curation
    stages — raw docs → exact-dedup keepers → + quality gate → + language
    agreement — one labeled row per stage with absolute and
    relative-to-raw counts.  This is the per-run report a data team
    reads before shipping a corpus snapshot: WHERE documents die.

    Stage semantics exactly mirror :func:`curate_documents` (same
    keeper rule, same thresholds) so stage 3's count is by construction
    the curated-corpus size; each stage is CUMULATIVE (applied on top
    of the previous ones).  Four 1-row aggregates unioned — the
    quality/lang/keeper subtrees are the curation plan's own, computed
    once each (no per-stage rescans of the heavy ops)."""
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        exact_dedup_keep_best,
    )

    quality = doc_quality_score(documents)
    langs = doc_language_id(documents)
    keepers = exact_dedup_keep_best(documents).select(
        F.col("keeper_id").alias("doc_id")
    )
    staged = (
        documents.select("doc_id", "lang")
        .join(quality.select("doc_id", "quality_score"), "doc_id")
        .join(langs.select("doc_id", "pred_lang"), "doc_id")
        .join(keepers.withColumn("is_keeper", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("is_keeper"), F.lit(0)).alias("is_keeper"),
            (F.col("quality_score") >= min_quality).cast("int").alias("q_ok"),
            (F.col("pred_lang") == F.col("lang")).cast("int").alias("l_ok"),
        )
        .localCheckpoint(eager=False)
    )
    agg = staged.agg(
        F.count("*").alias("n0"),
        F.sum("is_keeper").alias("n1"),
        F.sum(F.col("is_keeper") * F.col("q_ok")).alias("n2"),
        F.sum(F.col("is_keeper") * F.col("q_ok") * F.col("l_ok")).alias("n3"),
    )
    stacked = agg.selectExpr(
        "n0",
        "stack(4, 0, 'raw', n0, 1, 'exact_dedup', n1, 2, 'quality', n2, "
        "3, 'lang_agreement', n3) AS (stage_idx, stage, n_docs)"
    )
    return stacked.select(
        "stage_idx",
        "stage",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("n_docs").cast("double") / F.col("n0").cast("double"), 6).alias(
            "survival_rate"
        ),
    )


def curation_funnel_oracle(min_quality: float = 0.45) -> str:
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        exact_dedup_keep_best_oracle,
    )

    q = select_sql("documents", quality_score_select("duckdb"))
    lg = select_sql("documents", lang_id_select("duckdb"))
    return f"""WITH q AS ({q}),
lg AS ({lg}),
keepers AS ({exact_dedup_keep_best_oracle()}),
staged AS (
  SELECT d.doc_id,
    CASE WHEN EXISTS (SELECT 1 FROM keepers k WHERE k.keeper_id = d.doc_id)
         THEN 1 ELSE 0 END AS is_keeper,
    CASE WHEN q.quality_score >= {min_quality} THEN 1 ELSE 0 END AS q_ok,
    CASE WHEN lg.pred_lang = d.lang THEN 1 ELSE 0 END AS l_ok
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id
  JOIN lg ON lg.doc_id = d.doc_id
), agg AS (
  SELECT COUNT(*) AS n0,
         CAST(SUM(is_keeper) AS BIGINT) AS n1,
         CAST(SUM(is_keeper * q_ok) AS BIGINT) AS n2,
         CAST(SUM(is_keeper * q_ok * l_ok) AS BIGINT) AS n3
  FROM staged
)
SELECT stage_idx, stage, n_docs,
       round(CAST(n_docs AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS survival_rate
FROM (
  SELECT n0, 0 AS stage_idx, 'raw' AS stage, n0 AS n_docs FROM agg
  UNION ALL SELECT n0, 1, 'exact_dedup', n1 FROM agg
  UNION ALL SELECT n0, 2, 'quality', n2 FROM agg
  UNION ALL SELECT n0, 3, 'lang_agreement', n3 FROM agg
)"""


def normalize_select(dialect: str, text: str = "text") -> list[tuple[str, str]]:
    """Deterministic text-cleanup projection (the normalize step every
    corpus pipeline runs before dedup/tokenization): lowercase, map
    every character outside ``[a-z0-9 .,!?]`` to a space, collapse
    space runs, trim.  Pure scan-side regexp chain — one pass, no
    shuffle, whole-stage codegen.  Cross-engine: identical pattern text;
    DuckDB needs the explicit ``'g'`` flag (its regexp_replace is
    first-match-only by default, Spark's is global)."""
    g = ", 'g'" if dialect == "duckdb" else ""
    norm = (
        f"trim(regexp_replace(regexp_replace(lower({text}),"
        f" '[^a-z0-9 .,!?]', ' '{g}), ' +', ' '{g}))"
    )
    return [
        (norm, "norm_text"),
        (f"length({text})", "orig_chars"),
        (f"length({norm})", "norm_chars"),
    ]


def normalize_documents(documents: DataFrame) -> DataFrame:
    """(doc_id, norm_text, orig_chars, norm_chars) via
    :func:`normalize_select` — see there for the contract."""
    return apply_select(
        documents.select("doc_id", "text"),
        [("doc_id", "doc_id")] + normalize_select("spark"),
    )


def normalize_documents_oracle() -> str:
    return select_sql("documents", [("doc_id", "doc_id")] + normalize_select("duckdb"))


def pii_scan_select(dialect: str, text: str = "text") -> list[tuple[str, str]]:
    """Per-document PII hit counts — the compliance pre-filter every
    corpus release runs (emails, international-ish phone numbers,
    SSN-shaped triples, credit-card-shaped runs).  Patterns are
    deliberately RE2-compatible (no backreferences/lookaround) so the
    SAME text runs on Spark (Java regex) and DuckDB (RE2); counted via
    global match extraction, not boolean contains, so multiple hits in
    one doc are visible.  Pure scan-side projection.

    Phones are counted on CARD-REDACTED text: the phone pattern would
    otherwise also match inside every 4-4-4-4 card run ('4111 1111 1111
    1111' contains a phone-shaped '111 1111 1111'), double-counting each
    card hit as a phone hit.  Redacting card matches first (global
    regexp_replace with a single space — DuckDB needs the explicit 'g'
    flag, Spark's replace is global already) makes the per-type totals
    disjoint for card-shaped runs."""
    card_pat = r"[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}"
    phone_pat = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"
    if dialect == "spark":
        phone_src = f"regexp_replace({text}, '{card_pat}', ' ')"
    else:
        phone_src = f"regexp_replace({text}, '{card_pat}', ' ', 'g')"
    pats = {
        "n_emails": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", text),
        "n_phones": (phone_pat, phone_src),
        "n_ssns": (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", text),
        "n_cards": (card_pat, text),
    }
    out: list[tuple[str, str]] = []
    for alias, (pat, src) in pats.items():
        if dialect == "spark":
            esc = pat.replace("\\", "\\\\")
            out.append((f"CAST(size(regexp_extract_all({src}, '{esc}', 0)) AS INT)", alias))
        else:
            out.append((f"CAST(len(regexp_extract_all({src}, '{pat}')) AS INT)", alias))
    return out


def pii_scan_documents(documents: DataFrame) -> DataFrame:
    """Corpus-level PII audit: per-type hit totals + how many docs are
    affected at all — one scan, one 1-row reduce."""
    per_doc = apply_select(
        documents.select("doc_id", "text"),
        [("doc_id", "doc_id")] + pii_scan_select("spark"),
    )
    return per_doc.selectExpr(
        "CAST(COUNT(*) AS BIGINT) AS n_docs",
        "CAST(SUM(n_emails) AS BIGINT) AS total_emails",
        "CAST(SUM(n_phones) AS BIGINT) AS total_phones",
        "CAST(SUM(n_ssns) AS BIGINT) AS total_ssns",
        "CAST(SUM(n_cards) AS BIGINT) AS total_cards",
        "CAST(SUM(CASE WHEN n_emails + n_phones + n_ssns + n_cards > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii",
    )


def pii_scan_documents_oracle() -> str:
    inner = select_sql("documents", [("doc_id", "doc_id")] + pii_scan_select("duckdb"))
    return f"""WITH per_doc AS ({inner})
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_emails) AS BIGINT) AS total_emails,
  CAST(SUM(n_phones) AS BIGINT) AS total_phones,
  CAST(SUM(n_ssns) AS BIGINT) AS total_ssns,
  CAST(SUM(n_cards) AS BIGINT) AS total_cards,
  CAST(SUM(CASE WHEN n_emails + n_phones + n_ssns + n_cards > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii
FROM per_doc"""


def gopher_quality_select(dialect: str) -> list[tuple[str, str]]:
    """Gopher document-filter rules (Rae et al. 2021, Table A1 — the
    published public heuristic battery every LLM-corpus pipeline runs
    before dedup), as hard pass/fail booleans over one scan:

      * 50 ≤ word count ≤ 100 000
      * 3 ≤ mean word length ≤ 10
      * symbol-to-word ratio ≤ 0.1 (``#`` and ``...`` hits)
      * ≥ 80% of words contain an alphabetic character
      * ≥ 2 English stopword hits

    (The line-based rules — bullet/ellipsis line fractions — are
    omitted: the synthetic corpus is single-line; they'd be the same
    shape over ``split(text, '\\n')``.)  Distinct from
    :func:`quality_score_select` (a soft composite score) and
    :func:`repetition_select` (the §A1.1 repetition signals): this is
    the §A1 FILTER, the thing that decides membership.

    Cross-engine: thresholds compare UN-rounded doubles (identical IEEE
    divisions of exact integers on both engines); displayed ratios are
    floored at 1e-6 (floor, never round — round(x, 6) diverges between
    engines on exact half-boundaries like 1/128).  Expressions reference
    a staged ``toks`` column; ``...`` counting uses replace(), which is
    leftmost non-overlapping in BOTH engines."""
    n = size_sql("toks", dialect)
    n1 = f"greatest({n}, 1)"
    if dialect == "spark":
        sumlen = "aggregate(toks, CAST(0 AS BIGINT), (a, t) -> a + length(t))"
        alpha = "size(filter(toks, t -> t rlike '[a-zA-Z]'))"
        ellipses = "(length(text) - length(replace(text, '...', ''))) div 3"
    else:
        sumlen = "CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)"
        alpha = "len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]')))"
        ellipses = "(length(text) - length(replace(text, '...', ''))) // 3"
    hashes = "length(text) - length(replace(text, '#', ''))"
    mean_wl = f"(CAST({sumlen} AS DOUBLE) / {n1})"
    sym_ratio = f"(CAST(({hashes}) + ({ellipses}) AS DOUBLE) / {n1})"
    alpha_ratio = f"(CAST({alpha} AS DOUBLE) / {n1})"
    stops = count_in_set_sql("toks", LANG_STOPWORDS["en"], dialect)
    gpass = (
        f"({n} BETWEEN 50 AND 100000 AND {mean_wl} BETWEEN 3.0 AND 10.0"
        f" AND {sym_ratio} <= 0.1 AND {alpha_ratio} >= 0.8 AND {stops} >= 2)"
    )
    return [
        (f"CAST({n} AS BIGINT)", "n_words"),
        (f"floor({mean_wl} * 1000000) / 1000000", "mean_word_len"),
        (f"floor({sym_ratio} * 1000000) / 1000000", "symbol_word_ratio"),
        (f"floor({alpha_ratio} * 1000000) / 1000000", "alpha_word_ratio"),
        (f"CAST({stops} AS BIGINT)", "stop_hits"),
        (gpass, "gopher_pass"),
    ]


def gopher_quality(documents: DataFrame) -> DataFrame:
    """Per-doc Gopher filter verdict — staged-tokens form of
    :func:`gopher_quality_select` (tokens split once, all rules over
    the staged array; pure scan-side, no shuffle)."""
    from twitter_followers_patterns_mapreduce_spark.sources.readers import fan_out

    toks = tokens_sql("text", "spark")
    staged = fan_out(documents).selectExpr(
        "doc_id", "text", f"coalesce({toks}, array()) AS toks"
    )
    return staged.selectExpr(
        "doc_id", *[f"{e} AS {a}" for e, a in gopher_quality_select("spark")]
    )


def gopher_quality_oracle() -> str:
    toks = tokens_sql("text", "duckdb")
    cols = ",\n  ".join(f"{e} AS {a}" for e, a in gopher_quality_select("duckdb"))
    return (
        f"SELECT doc_id,\n  {cols}\n"
        f"FROM (SELECT doc_id, text, {toks} AS toks FROM documents)"
    )


def quality_curriculum(documents: DataFrame) -> DataFrame:
    """Curriculum-learning buckets: split the corpus into quality
    quartiles and profile each — the "train easy→hard" ordering step of
    a data pipeline (bucket 1 = lowest-quality quartile).

    Shape: the per-doc quality projection runs scan-side; the three
    quartile boundaries come from ONE exact-percentile aggregate
    (type-7, bit-identical to DuckDB quantile_cont — at 100 TB this
    swaps to approx_percentile, the sketch path documented in
    operators/stats.py) broadcast back as a 1-row cross; bucket
    assignment is three comparisons, and the per-bucket profile is one
    4-group hash agg.  Quality scores are 6-dp-rounded doubles scaled
    to exact BIGINTs for the bucket averages (order-independent sums).
    Output: (bucket, n_docs, avg_quality, avg_tokens)."""
    scored = apply_select(
        fan_out(documents), quality_score_select("spark")
    ).join(
        apply_select(fan_out(documents), token_stats_select("spark")).select(
            "doc_id", "n_tokens"
        ),
        "doc_id",
    )
    qs = scored.agg(
        F.percentile("quality_score", F.lit(0.25)).alias("q25"),
        F.percentile("quality_score", F.lit(0.50)).alias("q50"),
        F.percentile("quality_score", F.lit(0.75)).alias("q75"),
    )
    bucketed = scored.crossJoin(F.broadcast(qs)).selectExpr(
        "CAST(1 + CASE WHEN quality_score > q25 THEN 1 ELSE 0 END"
        " + CASE WHEN quality_score > q50 THEN 1 ELSE 0 END"
        " + CASE WHEN quality_score > q75 THEN 1 ELSE 0 END AS INT) AS bucket",
        "CAST(round(quality_score * 1000000) AS BIGINT) AS s6",
        "n_tokens",
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            (F.sum("s6").cast("double")).alias("_s"),
            F.sum("n_tokens").cast("long").alias("_t"),
        )
        .selectExpr(
            "bucket",
            "n_docs",
            "floor(_s / n_docs) / 1000000 AS avg_quality",
            "floor(CAST(_t AS DOUBLE) / n_docs * 1000000) / 1000000 AS avg_tokens",
        )
    )


def quality_curriculum_oracle() -> str:
    q = select_sql("documents", quality_score_select("duckdb"))
    t = select_sql("documents", token_stats_select("duckdb"))
    return f"""WITH scored0 AS ({q}),
tok AS ({t}),
scored AS (SELECT s.doc_id, s.quality_score, tok.n_tokens
           FROM scored0 s JOIN tok ON s.doc_id = tok.doc_id),
qs AS (SELECT quantile_cont(quality_score, 0.25) AS q25,
              quantile_cont(quality_score, 0.50) AS q50,
              quantile_cont(quality_score, 0.75) AS q75 FROM scored),
bucketed AS (
  SELECT CAST(1 + CASE WHEN quality_score > q25 THEN 1 ELSE 0 END
           + CASE WHEN quality_score > q50 THEN 1 ELSE 0 END
           + CASE WHEN quality_score > q75 THEN 1 ELSE 0 END AS INT) AS bucket,
         CAST(round(quality_score * 1000000) AS BIGINT) AS s6,
         n_tokens
  FROM scored CROSS JOIN qs)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
  floor(CAST(SUM(s6) AS DOUBLE) / COUNT(*)) / 1000000 AS avg_quality,
  floor(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) * 1000000) / 1000000 AS avg_tokens
FROM bucketed GROUP BY bucket"""


def readability_select(dialect: str) -> list[tuple[str, str]]:
    """Flesch reading-ease per document (the published 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words) formula) with the
    standard regex approximations: sentences = runs of [.!?], syllables
    = vowel-letter groups (y counted).  Zero-guarded (empty docs), all
    ratios single closed-form doubles over exact integers, floored at
    1e-6.  Expressions reference a staged ``toks`` column."""
    n = size_sql("toks", dialect)
    n1 = f"greatest({n}, 1)"
    if dialect == "spark":
        sents = "size(regexp_extract_all(text, '[.!?]+', 0))"
        syll = "size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
    else:
        sents = "len(regexp_extract_all(text, '[.!?]+'))"
        syll = "len(regexp_extract_all(lower(text), '[aeiouy]+'))"
    s1 = f"greatest({sents}, 1)"
    flesch = (
        f"(206.835 - 1.015 * (CAST({n} AS DOUBLE) / {s1})"
        f" - 84.6 * (CAST({syll} AS DOUBLE) / {n1}))"
    )
    return [
        (f"CAST({n} AS BIGINT)", "n_words"),
        (f"CAST({s1} AS BIGINT)", "n_sentences"),
        (f"CAST({syll} AS BIGINT)", "n_syllables"),
        (f"floor({flesch} * 1000000) / 1000000", "flesch"),
    ]


def readability_documents(documents: DataFrame) -> DataFrame:
    """Per-doc Flesch reading ease — staged-token scan-side projection
    (the length/complexity feature next to quality_score and the Gopher
    rules in a curation feature vector)."""
    from twitter_followers_patterns_mapreduce_spark.sources.readers import fan_out

    toks = tokens_sql("text", "spark")
    staged = fan_out(documents).selectExpr(
        "doc_id", "text", f"coalesce({toks}, array()) AS toks"
    )
    return staged.selectExpr(
        "doc_id", *[f"{e} AS {a}" for e, a in readability_select("spark")]
    )


def readability_documents_oracle() -> str:
    toks = tokens_sql("text", "duckdb")
    cols = ",\n  ".join(f"{e} AS {a}" for e, a in readability_select("duckdb"))
    return (
        f"SELECT doc_id,\n  {cols}\n"
        f"FROM (SELECT doc_id, text, {toks} AS toks FROM documents)"
    )
