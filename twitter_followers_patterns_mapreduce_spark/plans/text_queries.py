"""Named text-analysis queries over ``documents`` (training-data
pipeline surface: token stats, quality scoring, language ID,
fingerprinting).

Spark plan and DuckDB oracle are generated from ONE select-list builder
per operator (``operators/text.py``) — parity by construction; every
expression is built-in SQL inside whole-stage codegen, zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from twitter_followers_patterns_mapreduce_spark.operators import text as TX
from twitter_followers_patterns_mapreduce_spark.plans.registry import register
from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table


@register(
    "doc_token_stats",
    oracle=TX.select_sql("documents", TX.token_stats_select("duckdb")),
    description="per-doc token counts (whitespace + BPE-ish regex), char/punct/stopword ratios",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.doc_token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "doc_quality_score",
    oracle=TX.select_sql("documents", TX.quality_score_select("duckdb")),
    description="composite quality heuristic: length saturation + diversity + punct + stopwords",
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.doc_quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "doc_language_id",
    oracle=TX.select_sql("documents", TX.lang_id_select("duckdb")),
    description="stopword-voting language ID with deterministic tie-break vs labeled lang",
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.doc_language_id(load_table(spark, sf_dir, "documents"))


@register(
    "curate_documents",
    oracle=TX.curate_documents_oracle(),
    description="end-to-end corpus curation: keep-best dedup + quality + language agreement",
)
def curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.curate_documents(load_table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    oracle=TX.select_sql("documents", TX.fingerprint_select("duckdb")),
    description="content fingerprint: min-h64 over 3-word shingles (1-perm minhash)",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.doc_fingerprint(load_table(spark, sf_dir, "documents"))


from twitter_followers_patterns_mapreduce_spark.operators import splits as SP  # noqa: E402


@register(
    "doc_train_holdout_split",
    oracle=SP.split_summary_oracle(holdout_pct=10),
    description="deterministic h64-bucket train/holdout split per lang — membership is a "
    "pure function of doc_id, immune to partitioning/order/growth (no rand())",
)
def doc_train_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SP.split_summary(load_table(spark, sf_dir, "documents"), holdout_pct=10)


from twitter_followers_patterns_mapreduce_spark.operators import corpus as CP  # noqa: E402


@register(
    "doc_vocabulary",
    oracle=CP.doc_vocabulary_oracle(min_count=5, k=100),
    description="corpus vocabulary: token counts + doc frequency, min_count filter, "
    "distributed top-k (TakeOrderedAndProject, never a global sort)",
)
def doc_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.doc_vocabulary(load_table(spark, sf_dir, "documents"), min_count=5, k=100)


@register(
    "doc_tfidf_topk",
    oracle=CP.doc_tfidf_topk_oracle(k=5),
    description="top-5 TF-IDF terms per doc: tf carried through the explode scan-side, "
    "df as a second hash-agg, per-doc window (partitioned, never global)",
)
def doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.doc_tfidf_topk(load_table(spark, sf_dir, "documents"), k=5)


@register(
    "doc_chunks",
    oracle=CP.doc_chunks_oracle(size=200, stride=150),
    description="fixed-size character chunking with overlap (training-sample prep); "
    "pure generate + substring, zero shuffles",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.doc_chunks(load_table(spark, sf_dir, "documents"), size=200, stride=150)


@register(
    "doc_redact_terms",
    oracle=CP.doc_redact_terms_oracle(),
    description="regex redaction (PII-scrub machinery) over a term set present in the "
    "corpus; email/phone/SSN presets unit-tested on synthetic strings",
)
def doc_redact_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.doc_redact_terms(load_table(spark, sf_dir, "documents"))


@register(
    "doc_repetition_stats",
    oracle=TX.repetition_oracle(),
    description="Gopher-style repetition signals (dup-token / top-token / dup-bigram "
    "ratios) — pure scan-side array expressions, no explode, no shuffle",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.doc_repetition_stats(load_table(spark, sf_dir, "documents"))


@register(
    "doc_stratified_sample",
    oracle=SP.stratified_sample_oracle(per_stratum=20),
    description="deterministic per-lang fixed-size sample ranked by h64(doc_id) — "
    "training-mix builder, stable under reruns/partitioning/growth",
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SP.stratified_sample(load_table(spark, sf_dir, "documents"), per_stratum=20)


@register(
    "chunk_dedup_stats",
    oracle=CP.chunk_dedup_stats_oracle(),
    description="per-language chunk-level duplication rate — training-sample-granular "
    "redundancy that doc-level dedup misses",
)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.chunk_dedup_stats(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_training_set",
    oracle=CP.corpus_training_set_oracle(),
    description="flagship composition: curate -> chunk -> chunk-dedup (deterministic "
    "keep-first) -> per-lang training-set summary, one lazy DAG",
)
def corpus_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.corpus_training_set(load_table(spark, sf_dir, "documents"))


@register(
    "doc_contamination_check",
    oracle=SP.contamination_check_oracle(holdout_pct=10, n_shingle=5),
    description="eval-set contamination audit: per-holdout-doc fraction of 5-gram "
    "shingles present anywhere in the train split (GPT-3-style n-gram overlap); "
    "scan-side shingling, DISTINCT train index, shingle equi-join — never all-pairs",
)
def doc_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SP.contamination_check(
        load_table(spark, sf_dir, "documents"), holdout_pct=10, n_shingle=5
    )


@register(
    "doc_mixture_sample",
    oracle=SP.mixture_sample_oracle(stratum="source"),
    description="α=0.5 temperature-flattened training mix: each source keeps "
    "ceil(sqrt(n)) docs ranked by h64(doc_id) — deterministic head-source down-weighting",
)
def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SP.mixture_sample(load_table(spark, sf_dir, "documents"), stratum="source")


@register(
    "doc_token_chunks",
    oracle=CP.doc_token_chunks_oracle(window=64, stride=48),
    description="token-budget chunking (64-token windows, stride 48) — the LLM "
    "sampler unit; scan-side slice + rejoin, zero shuffles",
)
def doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.doc_token_chunks(load_table(spark, sf_dir, "documents"), window=64, stride=48)


from twitter_followers_patterns_mapreduce_spark.functions import udtfs as UD  # noqa: E402


@register(
    "doc_sentences_udtf",
    oracle=UD.DOC_SENTENCES_ORACLE,
    description="SURVEY §2.8 UDTF surface: '.'-sentence explosion via a Python UDTF "
    "lateral join — the documented slow path, exact-oracle-checked; hot paths use "
    "the pure-SQL posexplode form (doc_chunks) instead",
)
def doc_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return UD.doc_sentences(load_table(spark, sf_dir, "documents"))


@register(
    "doc_oov_rate",
    oracle=CP.doc_oov_rate_oracle(min_count=5, k=100),
    description="per-doc out-of-vocabulary rate vs the corpus top-100 vocab — "
    "broadcast vocab left-join over scan-side token explode; tokenizer drift metric",
)
def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.doc_oov_rate(load_table(spark, sf_dir, "documents"), min_count=5, k=100)


from twitter_followers_patterns_mapreduce_spark.operators import constraints as CK  # noqa: E402


@register(
    "doc_kanonymity_audit",
    oracle=CK.kanonymity_audit_oracle(k=5),
    description="privacy gate: quasi-identifier groups (lang, source, length bucket) "
    "smaller than k=5 — the re-identification audit run before snapshot release",
)
def doc_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CK.kanonymity_audit(load_table(spark, sf_dir, "documents"), k=5)


@register(
    "doc_token_surprisal",
    oracle=CP.doc_token_surprisal_oracle(),
    description="unigram surprisal quality score in whole bits (len(bin(N)) - "
    "len(bin(cnt)): integer-exact, no libm log) — the LM-perplexity-style "
    "curation signal as one explode + two hash aggs + a broadcast vocab join",
)
def doc_token_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.doc_token_surprisal(load_table(spark, sf_dir, "documents"))


@register(
    "doc_keyphrases",
    oracle=CP.doc_keyphrases_oracle(min_count=5, per_doc=3),
    description="per-document top-3 keyphrases by corpus PMI (pmi_collocations "
    "projected back onto every doc): one bigram materialization feeds corpus counts "
    "and per-doc distinct sets, scoring is a vocab-sized equi-join, top-k is a "
    "doc-partitioned window with deterministic tie-breaks",
)
def doc_keyphrases_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.doc_keyphrases(load_table(spark, sf_dir, "documents"), min_count=5, per_doc=3)


@register(
    "corpus_pack_sequences",
    oracle=CP.pack_sequences_oracle(seq_len=256, window=64),
    description="training-sequence packing: non-overlapping token chunks stream "
    "into fixed 256-token sequences by exclusive prefix sum (one partitioned "
    "window, never global) — per-sequence manifest with fill ratio",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.pack_sequences(load_table(spark, sf_dir, "documents"), seq_len=256, window=64)


@register(
    "corpus_bpe_pair_counts",
    oracle=CP.bpe_pair_counts_oracle(k=50),
    description="tokenizer fit: first-BPE-iteration adjacent char-pair frequencies — "
    "corpus reduces to its distinct-word vocab first, pairs explode over vocab only "
    "(O(|vocab|) pair generation, corpus-size-independent)",
)
def corpus_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.bpe_pair_counts(load_table(spark, sf_dir, "documents"), k=50)


@register(
    "corpus_token_budget",
    oracle=CP.corpus_token_budget_oracle(),
    description="mixture report: per (source, lang) doc/token/char mass + share of the "
    "total token budget (broadcast 1-row total; one bigint/bigint division, exact)",
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.corpus_token_budget(load_table(spark, sf_dir, "documents"))


@register(
    "doc_lang_confusion",
    oracle=TX.lang_confusion_matrix_oracle(),
    description="label-quality audit: (labeled, predicted) language confusion matrix "
    "with per-label shares — lang-ID scan + two hash aggs + broadcast row totals",
)
def doc_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.lang_confusion_matrix(load_table(spark, sf_dir, "documents"))


@register(
    "doc_curation_funnel",
    oracle=TX.curation_funnel_oracle(),
    description="curation survivorship funnel: raw -> exact-dedup -> +quality -> "
    "+lang-agreement counts with survival rates — one pass over the staged flags, "
    "stage semantics identical to curate_documents by construction",
)
def doc_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.curation_funnel(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_domain_mixture",
    oracle=CP.corpus_domain_mixture_oracle(),
    description="deterministic domain-mixture resampling: per-source target weight -> "
    "h64-bucket keep rate; per-source kept counts/chars vs achieved rate",
)
def corpus_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.corpus_domain_mixture(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_temperature_mixture",
    oracle=CP.corpus_temperature_mixture_oracle(),
    description="temperature-scaled domain resampling with DATA-DERIVED weights "
    "(XLM-R recipe, tau=0.5 so the weight is correctly-rounded sqrt): per-source "
    "share sqrt(n_i)/sum over 1e-6-floored exact weight sums, keep thresholds "
    "broadcast back onto the h64-bucket scan; upsamples tail domains vs their "
    "natural share",
)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.corpus_temperature_mixture(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_mixture_ivm",
    oracle=CP.corpus_mixture_ivm_oracle(),
    description="domain-mixture recipe maintained incrementally: per-source "
    "(doc, char) totals as mergeable state updated from the delta slice alone "
    "(base=even / delta=odd doc ids, union -> re-aggregate), with the whole "
    "temperature recipe — sqrt-weights, shares, per-source doc budgets, keep "
    "thresholds — recomputed from the |sources|-row state; oracle is the direct "
    "full-table recipe, proving delta maintenance == full recompute",
)
def corpus_mixture_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.corpus_mixture_ivm(load_table(spark, sf_dir, "documents"))


def _stage_doc_text_batches(spark: SparkSession, sf_dir: str, n_batches: int = 4):
    """Stage ALL documents' (doc_id, text) as ``n_batches`` parquet
    files split by ``doc_id % n_batches`` — postings/totals state is
    order-free (additive), ascending mtimes only for a deterministic
    drain.  State/checkpoint wiped per invocation."""
    import glob as _glob
    import hashlib
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"spark_bm25stream_{tag}")
    feed_dir = os.path.join(root, "feed")
    state_dir = os.path.join(root, "state")
    ckpt_dir = os.path.join(root, "ckpt")
    for d in (state_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    if not os.path.exists(feed_dir):
        os.makedirs(feed_dir)
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        now = _time.time()
        for b in range(n_batches):
            tmp = os.path.join(root, f"stage_b{b}")
            docs.where(F.pmod("doc_id", F.lit(n_batches)) == b).coalesce(
                1
            ).write.mode("overwrite").parquet(tmp)
            (part,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
            dst = os.path.join(feed_dir, f"b{b}.parquet")
            os.rename(part, dst)
            os.utime(dst, (now + b, now + b))
            shutil.rmtree(tmp)
    return feed_dir, state_dir, ckpt_dir


@register(
    "doc_bm25_topk_streamed",
    oracle=CP.doc_bm25_topk_oracle(k=20),
    description="streamed BM25 inverted-index maintenance (eighteenth streaming "
    "class): the corpus drains as 4 micro-batches into versioned query-term "
    "postings + (n_docs, tot_toks) totals state (keep-2 replay-idempotent; "
    "per batch |batch| tokenization + a |terms|-filtered append + a 2-row totals "
    "merge), and top-k is served FROM state through the batch operator's own "
    "scoring tail — postings/totals are commutative monoids, so the oracle is "
    "the one-shot doc_bm25_topk SQL unchanged",
)
def doc_bm25_topk_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_followers_patterns_mapreduce_spark.streaming.bm25 import (
        bm25_apply_stream,
        bm25_topk_from_state,
        docs_text_stream,
    )

    feed_dir, state_dir, ckpt_dir = _stage_doc_text_batches(spark, sf_dir)
    bm25_apply_stream(spark, docs_text_stream(spark, feed_dir), state_dir, ckpt_dir)
    return bm25_topk_from_state(spark, state_dir, k=20)


@register(
    "doc_collocation_communities",
    oracle=CP.collocation_communities_oracle(min_count=5, n_edges=100),
    description="topic/phrase communities: the top-100 PMI collocations become an "
    "undirected token graph and its connected components (iterative hash-min label "
    "propagation over token strings) are the phrase clusters — the text->graph "
    "composition; everything after the bigram agg rides a <=100-edge bounded spine; "
    "oracle is a recursive transitive closure over the same PMI edge set",
)
def doc_collocation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.collocation_communities(
        load_table(spark, sf_dir, "documents"), min_count=5, n_edges=100
    )


def _stage_mixture_batches(spark: SparkSession, sf_dir: str, n_batches: int = 4):
    """Stage ALL documents' (doc_id, source, n_chars) as ``n_batches``
    parquet files split by ``doc_id % n_batches`` — per-source totals
    are order-free (commutative monoid), so unlike the dedup-admission
    stager no mtime ordering is needed; files still get ascending
    mtimes for a deterministic drain.  State/checkpoint wiped per
    invocation for a fresh replay."""
    import glob as _glob
    import hashlib
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"spark_mixstream_{tag}")
    feed_dir = os.path.join(root, "feed")
    state_dir = os.path.join(root, "state")
    ckpt_dir = os.path.join(root, "ckpt")
    for d in (state_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    if not os.path.exists(feed_dir):
        os.makedirs(feed_dir)
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        )
        now = _time.time()
        for b in range(n_batches):
            tmp = os.path.join(root, f"stage_b{b}")
            docs.where(F.pmod("doc_id", F.lit(n_batches)) == b).coalesce(
                1
            ).write.mode("overwrite").parquet(tmp)
            (part,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
            dst = os.path.join(feed_dir, f"b{b}.parquet")
            os.rename(part, dst)
            os.utime(dst, (now + b, now + b))
            shutil.rmtree(tmp)
    return feed_dir, state_dir, ckpt_dir


@register(
    "corpus_mixture_streamed",
    oracle=CP.corpus_mixture_ivm_oracle(),
    description="streamed domain-mixture IVM (seventeenth streaming class): the "
    "corpus drains as 4 micro-batches into a versioned |sources|-row "
    "(n_docs, n_chars) state table (keep-2 replay-idempotent, union -> "
    "re-aggregate per batch), and the temperature recipe recomputes from the "
    "final state; per-source totals are a commutative monoid, so streamed state "
    "== one-shot aggregate and the oracle is the SAME full-table recipe as "
    "corpus_mixture_ivm — no staged unroll needed",
)
def corpus_mixture_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from twitter_followers_patterns_mapreduce_spark.streaming.mixture import (
        docs_mix_stream,
        mixture_apply_stream,
        mixture_recipe_from_state,
    )

    feed_dir, state_dir, ckpt_dir = _stage_mixture_batches(spark, sf_dir)
    mixture_apply_stream(
        spark, docs_mix_stream(spark, feed_dir), state_dir, ckpt_dir
    )
    return mixture_recipe_from_state(spark, state_dir)


@register(
    "corpus_export_shards",
    oracle=CP.corpus_export_shards_oracle(n_shards=8),
    description="deterministic hash-sharded export audit: per-shard row count, "
    "byte mass, source spread, hash range (pre-repartitionByRange check)",
)
def corpus_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.corpus_export_shards(load_table(spark, sf_dir, "documents"), n_shards=8)


@register(
    "doc_split_drift_ks",
    oracle=SP.split_drift_ks_oracle(holdout_pct=10),
    description="two-sample KS drift audit train vs holdout over n_chars: exact "
    "cumulative-count CDFs on the collapsed length histogram, 5% critical value, "
    "drift verdict — the standing split-health monitor",
)
def doc_split_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SP.split_drift_ks(load_table(spark, sf_dir, "documents"), holdout_pct=10)


@register(
    "doc_weighted_sample",
    oracle=SP.weighted_sample_oracle(k=100),
    description="Efraimidis-Spirakis weighted sample without replacement: key = "
    "-ln(hash-derived u)/weight on a 1e-12 grid, global top-k as TakeOrdered "
    "(per-partition heap + k-row driver merge, never a global sort)",
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SP.weighted_sample(load_table(spark, sf_dir, "documents"), k=100)


@register(
    "doc_priority_sum_estimate",
    oracle=SP.priority_sum_estimate_oracle(k=100),
    description="priority sampling (Duffield-Lund-Thorup) subset-sum estimation: "
    "top-k docs by q = weight/hash-u, tau = the (k+1)-th priority, and the exact "
    "BIGINT sum of floored max(weight, tau) terms estimates total chars unbiasedly "
    "— the fixed-size sample that answers subset weight-sum questions without a "
    "scan (what the A-ES race sample cannot do); exact companion gates the error",
)
def doc_priority_sum_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SP.priority_sum_estimate(load_table(spark, sf_dir, "documents"), k=100)


@register(
    "doc_bm25_topk",
    oracle=CP.doc_bm25_topk_oracle(k=20),
    description="Okapi BM25 top-20 retrieval for a fixed 4-term query: term-filtered "
    "postings straight off the explode, broadcast df + globals, integer micro-unit "
    "scores (exact BIGINT sum, doc_id tie-break), TakeOrdered top-k",
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.doc_bm25_topk(load_table(spark, sf_dir, "documents"), k=20)


@register(
    "doc_bigram_surprisal",
    oracle=CP.doc_bigram_surprisal_oracle(),
    description="per-doc bigram conditional surprisal in whole bits (bin-length "
    "integer arithmetic, no libm log): corpus-as-LM quality filter at bigram order — "
    "scan-side index-transform bigrams, two hash aggs, one scoring equi-join",
)
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.doc_bigram_surprisal(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_bpe_train",
    oracle=CP.corpus_bpe_train_oracle(rounds=6),
    description="BPE tokenizer training, 6 greedy merge rounds on the freq-weighted "
    "distinct-word table (Sennrich): per round one vocab-sized pair agg + 1-row "
    "TakeOrdered + literal rewrite — only the word count ever scans the corpus",
)
def corpus_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.corpus_bpe_train(load_table(spark, sf_dir, "documents"), rounds=6)


@register(
    "corpus_bpe_encode_stats",
    oracle=CP.corpus_bpe_encode_stats_oracle(rounds=6),
    description="apply the 6 learned BPE merges back to the corpus: per-source word/"
    "char/symbol totals + compression ratio — train-then-encode lifecycle, merges "
    "ride the plan as literals (model broadcast), encoding is scan-side",
)
def corpus_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.corpus_bpe_encode_stats(load_table(spark, sf_dir, "documents"), rounds=6)


@register(
    "doc_ldiversity_audit",
    oracle=CK.ldiversity_audit_oracle(l=3),
    description="l-diversity privacy audit (attribute-disclosure twin of the "
    "k-anonymity gate): QI groups whose sensitive attribute has < 3 distinct values, "
    "with homogeneity evidence — two map-side-combinable hash aggs on QI-space keys",
)
def doc_ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CK.ldiversity_audit(load_table(spark, sf_dir, "documents"), l=3)


@register(
    "doc_normalize_text",
    oracle=TX.normalize_documents_oracle(),
    description="deterministic text cleanup (lowercase, strip non-[a-z0-9 .,!?], "
    "collapse spaces, trim) — the pre-dedup normalize pass; pure scan-side regexp "
    "chain, one pass, no shuffle",
)
def doc_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.normalize_documents(load_table(spark, sf_dir, "documents"))


@register(
    "doc_zipf_fit",
    oracle=CP.zipf_fit_oracle(),
    description="Zipf's-law screen: OLS of ln(count) on ln(rank) over the whole "
    "vocabulary — floored-log BIGINT points, DECIMAL(38,0) moment sums (exact, "
    "order-independent), closed-form slope/intercept/r2; natural text gives "
    "slope ~ -1, the synthetic uniform vocab reads ~flat",
)
def doc_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.zipf_fit(load_table(spark, sf_dir, "documents"))


@register(
    "documents_jsonl_roundtrip",
    # The oracle reads the DERIVATION from the parquet view, never the
    # staged JSONL — a serialization bug in the writer shows up as a
    # Spark-vs-oracle mismatch instead of being mirrored on both sides
    # (same discipline as ce_count_edges_csv).
    oracle="""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang""",
    description="JSONL source coverage: documents serialized to newline-delimited "
    "JSON (to_json + text sink), read back through spark.read.json with an explicit "
    "schema (no inference pass), aggregated per language — the ingest format of "
    "every web-scrape corpus drop",
)
def documents_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from pyspark.sql import functions as F

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"spark_jsonl_{tag}")
    docs = load_table(spark, sf_dir, "documents")
    docs.selectExpr("to_json(struct(doc_id, lang, n_chars)) AS value").write.mode(
        "overwrite"
    ).text(path)
    back = spark.read.schema("doc_id LONG, lang STRING, n_chars LONG").json(path)
    return back.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "doc_pii_scan",
    oracle=TX.pii_scan_documents_oracle(),
    description="compliance PII audit: per-type hit totals (emails, phones, SSN- and "
    "card-shaped) + affected-doc count — RE2-compatible patterns shared verbatim by "
    "both engines, counted via global extraction (multi-hit docs visible), one scan "
    "+ one 1-row reduce",
)
def doc_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.pii_scan_documents(load_table(spark, sf_dir, "documents"))


@register(
    "doc_gopher_quality",
    oracle=TX.gopher_quality_oracle(),
    description="Gopher document-filter rules (Rae et al. 2021 Table A1): word count, "
    "mean word length, symbol-to-word ratio, alpha-word fraction, stopword floor — "
    "hard pass/fail booleans over one staged-token scan (the published corpus "
    "membership filter, vs doc_quality_score's soft composite)",
)
def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.gopher_quality(load_table(spark, sf_dir, "documents"))


@register(
    "doc_readability",
    oracle=TX.readability_documents_oracle(),
    description="Flesch reading ease per doc (published formula, regex sentence/"
    "vowel-group syllable approximations): staged-token scan-side projection, "
    "closed-form doubles over exact counts floored at 1e-6",
)
def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.readability_documents(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_quality_curriculum",
    oracle=TX.quality_curriculum_oracle(),
    description="curriculum-learning buckets: quality quartiles (exact type-7 "
    "percentile boundaries broadcast as a 1-row cross; approx_percentile is the "
    "documented 100 TB swap) profiled per bucket with exact scaled-integer "
    "averages",
)
def corpus_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TX.quality_curriculum(load_table(spark, sf_dir, "documents"))


@register(
    "doc_pmi_collocations",
    oracle=CP.pmi_collocations_oracle(min_count=5, k=20),
    description="top-20 collocations by pointwise mutual information (min-count 5 "
    "floor against the hapax pathology): one bigram materialization → three hash "
    "aggs + two vocab-sized equi-joins + the 1-row total cross; PMI is one ln over "
    "exact BIGINT counts",
)
def doc_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.pmi_collocations(load_table(spark, sf_dir, "documents"), min_count=5, k=20)


@register(
    "corpus_neyman_allocation",
    oracle=CP.neyman_allocation_oracle(budget=10_000),
    description="Neyman variance-optimal stratified sample budgets per source "
    "(n_h proportional to N_h*sigma_h over n_chars): one agg to |sources| rows + the 1-row "
    "total cross; sigma floors to the micro grid so allocation weights are exact "
    "decimals, never an order-dependent double sum",
)
def corpus_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.neyman_allocation(load_table(spark, sf_dir, "documents"), budget=10_000)


@register(
    "doc_heaps_law",
    oracle=CP.heaps_law_fit_oracle(n_buckets=10),
    description="Heaps'-law vocabulary growth V(n)~k*n^beta, the corpus-growth dual "
    "of the Zipf screen: token first-seen buckets make the growth curve ONE "
    "distinct agg + a bounded-spine cumsum (no multi-pass rescans); closed-form OLS "
    "fit over the <=10 (ln n, ln V) points",
)
def doc_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.heaps_law_fit(load_table(spark, sf_dir, "documents"), n_buckets=10)


from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql as _h64  # noqa: E402
from twitter_followers_patterns_mapreduce_spark.functions.textfns import tokens_sql as _toks  # noqa: E402
from twitter_followers_patterns_mapreduce_spark.operators import stats as _ST  # noqa: E402

_SPLIT_TOKENS_TT = (
    "(SELECT CAST((" + _h64("CAST(doc_id AS VARCHAR)", "duckdb") + ") % 100 < 30 AS INT)"
    " AS grp0, unnest(" + _toks("text", "duckdb") + ") AS token FROM documents) tt"
)


@register(
    "doc_split_vocab_kl",
    oracle=_ST.categorical_entropy_kl_oracle(_SPLIT_TOKENS_TT, "grp0", "token"),
    description="TOKEN-distribution drift across the h64 train/holdout split: per-half "
    "vocab entropy + KL vs the pooled corpus (doc_split_drift_ks checks a scalar "
    "quality stat; this checks the language itself) — the categorical_entropy_kl "
    "machinery applied to the exploded token table",
)
def doc_split_vocab_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _h64("CAST(doc_id AS STRING)", "spark")
    toks = load_table(spark, sf_dir, "documents").selectExpr(
        f"CAST({h} % 100 < 30 AS INT) AS grp0",
        f"explode({_toks('text', 'spark')}) AS token",
    )
    return _ST.categorical_entropy_kl(toks, "grp0", "token")


@register(
    "corpus_dsir_select",
    oracle=SP.dsir_weights_oracle(b_buckets=512, k=100),
    description="DSIR data selection (Xie et al. 2023): score raw-pool docs by the "
    "hashed-bigram log-likelihood ratio of a target-slice n-gram model vs the raw "
    "pool's, keep the top-100 — 'find web pages that read like the curated corpus' "
    "without a trained classifier; both multinomials are ONE conditional hash-agg "
    "to a <=512-row bucket spine (no vocabulary collected), weights broadcast back, "
    "per-doc score an exact BIGINT sum of count*w_micro with ln on the 1e-6 grid, "
    "top-k via TakeOrdered",
)
def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SP.dsir_weights(
        load_table(spark, sf_dir, "documents"), b_buckets=512, k=100
    )


@register(
    "corpus_quality_classifier",
    oracle=SP.quality_classifier_oracle(b_buckets=512, iters=3, lr=0.5),
    description="fastText-style discriminative quality classifier (the canonical "
    "pretraining filter): logistic regression over the SAME hashed-bigram feature "
    "stream as corpus_dsir_select, trained curated-vs-raw in 3 fully-distributed "
    "rounds — the model is a <=513-row (bucket, weight) table updated by two "
    "equi-joins + hash-aggs per round (bias as pseudo-feature, DECIMAL per-term "
    "reductions so sums are order-free), never collected to the driver; scores "
    "emit floored at 6dp and the oracle unrolls the training rounds as CTEs",
)
def corpus_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SP.quality_classifier_scores(
        load_table(spark, sf_dir, "documents"), b_buckets=512, iters=3, lr=0.5
    )
