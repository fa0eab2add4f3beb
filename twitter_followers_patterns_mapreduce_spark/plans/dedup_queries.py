"""Named deduplication queries over ``documents`` — exact, MinHash+LSH,
SimHash, n-gram Jaccard (training-data pipeline surface).

All hashes derive from md5 (``functions/hashing.py``) so every query
here has a bit-for-bit DuckDB oracle — full value-hash coverage, no
rows-only fallbacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from twitter_followers_patterns_mapreduce_spark.operators import dedup as D
from twitter_followers_patterns_mapreduce_spark.plans.registry import register
from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

EXACT_DUP_ORACLE = """SELECT md5(text) AS text_md5,
  COUNT(*) AS n_copies,
  MIN(doc_id) AS keeper_id
FROM documents
GROUP BY md5(text)
HAVING COUNT(*) >= 2"""


@register(
    "dedup_exact",
    oracle=EXACT_DUP_ORACLE,
    description="exact duplicate groups by md5(text): one hash-aggregate shuffle",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dup_groups(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_keep_best",
    oracle=D.exact_dedup_keep_best_oracle(),
    description="one representative per exact-dup group: max quality score, row_number dedup",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_keep_best(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh",
    oracle=D.minhash_lsh_pairs_oracle(threshold=0.5),
    description="near-dup pairs: shingle→minhash→band→bucket-join, verified exact jaccard",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "dedup_simhash_table",
    oracle=D.simhash_table_oracle(),
    description="60-bit SimHash per doc — pure per-row fold, no shuffle",
)
def dedup_simhash_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_table(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    oracle=D.simhash_near_pairs_oracle(max_hamming=3),
    # r=3 is the published web-dedup operating point (Manku et al.,
    # WWW'07 §4: 64-bit fingerprints, k=3).  It also sets the band
    # width: r+1 pigeonhole bands of 15 bits → 1/32k per-band collision
    # rate for unrelated docs, vs r=8's 7-bit bands (1/128) which made
    # candidate generation quadratic-ish (83k "near-dup" pairs at sf0.1,
    # nearly all noise).
    description="SimHash near-dup pairs via pigeonhole band equi-join (lossless prefilter)",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(load_table(spark, sf_dir, "documents"), max_hamming=3)


@register(
    "dedup_ngram_jaccard",
    oracle=D.ngram_jaccard_pairs_oracle(threshold=0.5),
    description="exact n-gram Jaccard pairs via inverted-index equi-join (AQE handles skew)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "dedup_jaccard_prefix",
    oracle=D.ngram_jaccard_pairs_oracle(threshold=0.5),
    description="exact n-gram Jaccard pairs via PREFIX FILTERING (PPJoin family): "
    "only each doc's rarest n-ceil(t*n)+1 shingles are indexed (rarity order from a "
    "document-frequency agg), candidates verified with the exact set intersection — "
    "same oracle as the inverted-index baseline, so a lossy prefix would hash-mismatch; "
    "the stopword-shingle posting lists the baseline expands quadratically fall outside "
    "every prefix here",
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs_prefix(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "dedup_neardup_clusters",
    oracle=D.neardup_clusters_oracle(threshold=0.5),
    description="full near-dedup pipeline: LSH pairs as an edge list into hash-min "
    "connected components, per-cluster canonical-survivor summary",
)
def dedup_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.neardup_clusters(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "dedup_incremental",
    oracle=D.dedup_incremental_oracle(threshold=0.5),
    description="ingestion-time dedup: new batch (odd ids) admitted against the "
    "existing corpus (even ids) — exact md5 semi-join + LSH band equi-join "
    "candidates, deterministic best-match",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.dedup_incremental(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "doc_split_ngram_novelty",
    oracle=D.split_ngram_novelty_oracle(holdout_pct=30),
    description="holdout 3-shingle novelty vs train under the house h64 split: the "
    "memorization/leakage diagnostic (contamination_check tests an external canary, "
    "split_vocab_kl tests unigram drift; this asks what fraction of holdout phrasing "
    "was never seen in training) — distinct shingle sets per side, one anti-join, "
    "1-row readout",
)
def doc_split_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.split_ngram_novelty(
        load_table(spark, sf_dir, "documents"), holdout_pct=30
    )


def _stage_doc_batches(spark: SparkSession, sf_dir: str, n_batches: int = 4):
    """Stage the odd-id documents as ``n_batches`` parquet files split by
    ``(doc_id // 2) % n_batches`` with ASCENDING mtimes — a deterministic
    ordered micro-batch replay (the file source drains oldest-mtime
    first, and admission order matters here, unlike the order-free
    bottom-k/counts stagers).  Returns (feed_dir, state_dir, ckpt_dir);
    state and checkpoint are wiped per invocation for a fresh replay."""
    import glob as _glob
    import hashlib
    import os
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"spark_dedupadm_{tag}")
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
            docs.where(
                (F.col("doc_id") % 2 == 1)
                & (F.pmod(F.shiftright("doc_id", 1), F.lit(n_batches)) == b)
            ).coalesce(1).write.mode("overwrite").parquet(tmp)
            (part,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
            dst = os.path.join(feed_dir, f"b{b}.parquet")
            os.rename(part, dst)
            os.utime(dst, (now + b, now + b))  # strict arrival order
            shutil.rmtree(tmp)
    return feed_dir, state_dir, ckpt_dir


@register(
    "dedup_incremental_streamed",
    oracle=D.dedup_incremental_staged_oracle(n_stages=4, threshold=0.5),
    description="streamed near-dup admission under the oracle gate (thirteenth "
    "streaming class): odd docs replayed as 4 ordered micro-batches against "
    "VERSIONED corpus state (seen-md5 + shingle sets + the persisted LSH band "
    "index, keep-2 replay-idempotent versions) — only kept docs join the index, "
    "so a near-dup of a REJECTED arrival is kept; oracle unrolls the greedy "
    "admission recursion into one CTE per stage",
)
def dedup_incremental_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.streaming.dedup_admit import (
        admit_apply_stream,
        docs_file_stream,
        verdicts_from_state,
    )

    feed_dir, state_dir, ckpt_dir = _stage_doc_batches(spark, sf_dir, n_batches=4)
    bootstrap = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 2 == 0)
    )
    admit_apply_stream(
        spark,
        docs_file_stream(spark, feed_dir),
        bootstrap,
        state_dir,
        ckpt_dir,
        threshold=0.5,
    )
    return verdicts_from_state(spark, state_dir).orderBy("doc_id")


@register(
    "dedup_admission_novelty_streamed",
    oracle=D.dedup_admission_novelty_staged_oracle(n_stages=4, threshold=0.5),
    description="one-pass streamed INGEST GATE (sixteenth streaming class): every "
    "arriving doc gets its dedup verdict AND its train-shingle contamination "
    "(n_seen / novelty vs the persisted distinct shingle set of the ADMITTED "
    "corpus as of the previous batch — the doc_split_ngram_novelty measure) from "
    "the same versioned state read; rejected docs contribute no train shingles; "
    "oracle unrolls the greedy admission recursion and the per-stage train sets",
)
def dedup_admission_novelty_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.streaming.dedup_admit import (
        admit_apply_stream,
        docs_file_stream,
        novelty_from_state,
    )

    feed_dir, state_dir, ckpt_dir = _stage_doc_batches(spark, sf_dir, n_batches=4)
    bootstrap = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 2 == 0)
    )
    admit_apply_stream(
        spark,
        docs_file_stream(spark, feed_dir),
        bootstrap,
        state_dir,
        ckpt_dir,
        threshold=0.5,
    )
    return novelty_from_state(spark, state_dir).orderBy("doc_id")


from twitter_followers_patterns_mapreduce_spark.operators import clustering as CL  # noqa: E402


@register(
    "dedup_semantic",
    oracle=CL.semantic_dedup_oracle(threshold=0.3),
    description="SemDeDup-style semantic dedup: k-means cluster the embeddings, drop "
    "vectors cosine-near a lower-id cluster-mate — within-cluster equi-join pairs, "
    "never n^2 (threshold sits in the synthetic corpus's observed tail)",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CL.semantic_dedup(load_table(spark, sf_dir, "embeddings"), threshold=0.3)


@register(
    "dedup_semantic_k32",
    oracle=CL.semantic_dedup_oracle(threshold=0.3, n_clusters=32),
    description="SemDeDup at k=32 — the SCALE KNOB under the driver's gate: "
    "candidate volume is n^2/k, so k grows with the corpus (SemDeDup uses 11k "
    "clusters at 100M vectors; measured at sf1, k=128 is 10x faster than k=8)",
)
def dedup_semantic_k32(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CL.semantic_dedup(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3, n_clusters=32
    )


@register(
    "dedup_containment",
    oracle=D.containment_pairs_oracle(threshold=0.6),
    description="asymmetric containment pairs |A∩B|/min(|A|,|B|) — the doc-inside-doc "
    "detector symmetric Jaccard misses; same inverted-index plan, names the contained side",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.containment_pairs(load_table(spark, sf_dir, "documents"), threshold=0.6)


@register(
    "fuzzy_match_fastss",
    oracle=D.fuzzy_match_fastss_oracle(probe_mod=10),
    description="edit-distance-1 fuzzy match via FastSS deletion signatures: scan-side "
    "signature explode, candidate equi-join, exact levenshtein verify — oracle is the "
    "brute-force cross join, so a lossy blocking would hash-mismatch",
)
def fuzzy_match_fastss(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.fuzzy_match_fastss(load_table(spark, sf_dir, "part"), probe_mod=10)


@register(
    "doc_duplicated_span_fraction",
    oracle=D.duplicated_span_fraction_oracle(k=8),
    description="exact-substring duplication metric (Lee et al. 2022): per-doc token "
    "fraction covered by a corpus-repeated 8-gram — h64 shingle keys, interval-union "
    "lag window over duplicated starts only (no token spine, no all-pairs)",
)
def doc_duplicated_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.duplicated_span_fraction(load_table(spark, sf_dir, "documents"), k=8)


@register(
    "doc_exact_substring_strip",
    oracle=D.exact_substring_strip_oracle(k=8),
    description="ExactSubstr deduplication TRANSFORM (Lee et al. 2022): emit each doc "
    "with every corpus-repeated 8-gram span removed — duplicated starts fan out into a "
    "sparse per-doc covered-position array, rebuild is one array-lambda filter (token "
    "rows never explode); cleaned text string-equality-checked by the oracle",
)
def doc_exact_substring_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_substring_strip(load_table(spark, sf_dir, "documents"), k=8)


@register(
    "dedup_lsh_recall",
    oracle=D.lsh_recall_audit_oracle(threshold=0.5),
    description="recall audit of the MinHash-LSH near-dup path vs the exact "
    "inverted-index truth at the same threshold (precision is 1 by construction — "
    "both verify exact jaccard): the standing banding-parameter quality gate",
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.lsh_recall_audit(load_table(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "dedup_lsh_recall_sampled",
    oracle=D.lsh_recall_audit_sampled_oracle(pct=25, threshold=0.5),
    description="the recall audit's registered SCALE path: hash-mod doc_id to a "
    "deterministic 25% corpus sample BEFORE both the LSH and exact-truth paths — "
    "recall is a per-pair property so the uniform sample estimates it unbiasedly, "
    "while the quadratic truth side shrinks ~pct^2; the full-corpus form stays as "
    "the gate-scale exact anchor",
)
def dedup_lsh_recall_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.lsh_recall_audit_sampled(
        load_table(spark, sf_dir, "documents"), pct=25, threshold=0.5
    )
