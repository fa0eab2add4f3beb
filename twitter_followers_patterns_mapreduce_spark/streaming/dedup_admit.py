"""Streamed near-dup admission against VERSIONED corpus state — the
thirteenth gated streaming class.

``streaming/dedup.py::ingest_dedup_foreach_batch`` proved the
foreachBatch admission shape but re-derives the corpus's MinHash
signatures from raw text every micro-batch — an O(|corpus|) shingling
rescan per batch.  This module keeps the admission STATE itself
incremental, the way a production ingest pipeline would persist it:

  * ``corpus/v=<batch_id>``  — (doc_id, h, shingles, n_shingles): the
    seen-md5 set and the exact shingle sets of every ADMITTED doc
    (bootstrap corpus + kept arrivals), for the exact-dup semi-join and
    the candidate jaccard verification.
  * ``bands/v=<batch_id>``   — (doc_id, band, key): the persisted LSH
    band INDEX of the admitted corpus.  New-batch bands equi-join this
    table on (band, key), so candidate generation touches colliding
    buckets, never the corpus text (at scale this table is
    bucketed/Z-ordered on (band, key) — see sources/writers.py).
  * ``verdicts/v=<batch_id>``— cumulative (doc_id, status, near_dup_of,
    jaccard) admission log, one row per arrived doc, the same contract
    as ``operators/dedup.py::dedup_incremental``.
  * ``shingles/v=<batch_id>`` — the DISTINCT h64 shingle set of the
    admitted corpus, maintained by |Δ|-sized anti-join appends.
  * ``novelty/v=<batch_id>`` — cumulative one-pass INGEST-GATE log
    (doc_id, status, n_shingles, n_seen, novelty): each arrival's
    admission verdict plus its train-shingle contamination against the
    corpus as of the previous batch (the ``doc_split_ngram_novelty``
    measure, computed from the SAME state read as the dedup verdict —
    the sixteenth gated streaming class).

Versioning follows the keep-2 replay-idempotent discipline of
``streaming/scd2.py``: each batch merges against the latest committed
version STRICTLY BELOW its own batch_id and overwrites its own
``v=<batch_id>`` dirs, so a crash-replayed batch re-derives (never
duplicates) its output; after each commit only the newest two versions
survive.  Restart-resume is pinned by tests/test_streaming_dedup.py.

Semantics (what the staged DuckDB oracle
``operators/dedup.py::dedup_incremental_staged_oracle`` mirrors): each
micro-batch's docs are judged against the corpus as of the PREVIOUS
batch — exact if the md5 is already present, near-dup if the best
band-colliding jaccard ≥ threshold (max 6dp jaccard, ties to min
corpus id, exactly dedup_incremental's rule), else kept — and ONLY
kept docs join the corpus for subsequent batches.  A doc that
near-dups a REJECTED earlier arrival is therefore kept: rejected docs
never enter the index.  Docs within one micro-batch are judged
independently (new-vs-corpus, never new-vs-new), matching the batch
operator's contract.

The local parquet union-rewrite of the corpus per version is the
documented stand-in for a table format's append (same caveat as
scd2.py); the band table is append-only by construction.

Reference parity note: the reference (Twitter-Followers-Patterns
MapReduce) is batch-only; this is extension surface (SURVEY.md §2.7).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
    LSH_BANDS,
    MINHASH_K,
    _band_struct,
)
from twitter_followers_patterns_mapreduce_spark.streaming.graph import (
    _latest_version,
    _prune_versions,
)

#: Schema of staged incoming-document files.
DOCS_SCHEMA = "doc_id LONG, text STRING"


def docs_file_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source document stream, one staged file per micro-batch."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _state_table(docs: DataFrame) -> DataFrame:
    """(doc_id, h, shingles, n_shingles, sig0..sig{K-1}): the ONE
    shingle+md5 pass a document set pays, with ONE ROW PER INPUT DOC.
    Both state views derive from it — ``_sig_table`` (corpus
    projection) and ``_band_rows`` (LSH index rows) — so a micro-batch
    hashes its shingles exactly once (the earlier shape ran the
    shingle pipeline independently in each helper, doubling the
    dominant md5 cost per batch).

    Docs too short to shingle (< n_shingle tokens, dropped by
    ``shingled_docs``) are kept on the spine via the LEFT join with an
    EMPTY shingle set and NULL signatures: they can never be near-dup
    candidates (no band rows, no verification pairs) but their md5
    participates in the exact-dup check and, once admitted, blocks
    later identical arrivals — the same contract as the batch
    ``dedup_incremental`` (spine from new_docs) and the staged oracle
    (verdict for every arriving doc, exact dups by md5 regardless of
    length).  The previous INNER join silently dropped such docs from
    both the verdict log and the corpus state.

    Shingles persist as h64 BIGINT arrays, not strings: the state
    parquet and the verification ``array_intersect`` carry 8-byte
    longs instead of ~40-char text (60-bit collisions are negligible;
    the intersection/union COUNTS — all jaccard needs — are identical,
    matching the staged oracle's string-set arithmetic exactly)."""
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import (
        h64_sql,
        minhash_perm_sql,
    )
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        shingled_docs,
    )

    # straight from the shingle projection — ONE md5 pass per shingle;
    # the K signature mins are cheap affine permutations of the already
    # hashed array (minhash_signatures' own trick, applied here to the
    # SAME array that persists as corpus state)
    hashed = shingled_docs(docs).selectExpr(
        "doc_id",
        f"transform(shingles, s_ -> {h64_sql('s_', 'spark')}) AS shingles",
    )
    sig_cols = [
        f"array_min(transform(shingles, h -> {minhash_perm_sql('h', j)})) AS sig{j}"
        for j in range(MINHASH_K)
    ]
    sigs = hashed.selectExpr(
        "doc_id", "shingles", "size(shingles) AS n_shingles", *sig_cols
    )
    return (
        docs.select("doc_id", F.md5("text").alias("h"))
        .join(sigs, "doc_id", "left")
        .withColumn(
            "shingles",
            F.coalesce(F.col("shingles"), F.expr("CAST(array() AS ARRAY<BIGINT>)")),
        )
        .withColumn("n_shingles", F.coalesce(F.col("n_shingles"), F.lit(0)))
    )


def _sig_table(state: DataFrame) -> DataFrame:
    """Corpus-state projection of a ``_state_table`` frame."""
    return state.select("doc_id", "h", "shingles", "n_shingles")


def _band_rows(state: DataFrame) -> DataFrame:
    """(doc_id, band, key) LSH index rows of a ``_state_table`` frame.
    Unshingleable docs (n_shingles = 0, NULL signatures) emit no band
    rows — they cannot be near-dup candidates."""
    return (
        state.where(F.col("n_shingles") > 0)
        .select(
            "doc_id",
            F.explode_outer(
                F.array(*[_band_struct(k) for k in range(LSH_BANDS)])
            ).alias("bk"),
        )
        .select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


def _judge_batch(
    batch_sigs: DataFrame,
    batch_bands: DataFrame,
    corpus: DataFrame,
    corpus_bands: DataFrame,
    threshold: float,
) -> DataFrame:
    """Admission verdict for one micro-batch against the current corpus
    state: (doc_id, status, near_dup_of, jaccard) — dedup_incremental's
    exact rule, with the corpus side read from STATE, never recomputed."""
    from pyspark.sql import Window

    # corpus md5s are UNIQUE by construction (an arrival whose md5 is
    # already present is an exact_dup and never admitted), and a left
    # SEMI join is insensitive to right-side duplicates anyway — the
    # old .distinct() here was a pure wasted shuffle+agg of the corpus
    # key column every micro-batch (round 12, guide §2.4)
    exact = (
        batch_sigs.select("doc_id", "h")
        .join(corpus.select("h"), "h", "left_semi")
        .select("doc_id", F.lit(True).alias("is_exact"))
    )
    cand = (
        batch_bands.select(F.col("doc_id").alias("new_id"), "band", "key")
        .join(
            corpus_bands.select(F.col("doc_id").alias("old_id"), "band", "key"),
            ["band", "key"],
        )
        .select("new_id", "old_id")
        .distinct()
    )
    verified = (
        cand.join(
            batch_sigs.select(
                F.col("doc_id").alias("new_id"),
                F.col("shingles").alias("sa"),
                F.col("n_shingles").alias("na"),
            ),
            "new_id",
        )
        .join(
            corpus.select(
                F.col("doc_id").alias("old_id"),
                F.col("shingles").alias("sb"),
                F.col("n_shingles").alias("nb"),
            ),
            "old_id",
        )
        .select(
            "new_id",
            "old_id",
            F.size(F.array_intersect("sa", "sb")).alias("common"),
            "na",
            "nb",
        )
    )
    jac = F.round(
        F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common")),
        6,
    )
    w = Window.partitionBy("new_id").orderBy(F.desc("jaccard"), F.asc("old_id"))
    best = (
        verified.select("new_id", "old_id", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return (
        batch_sigs.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(
            best.select(F.col("new_id").alias("doc_id"), "old_id", "jaccard"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.when(F.col("is_exact"), F.lit("exact_dup"))
            .when(F.col("old_id").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.when(~F.coalesce(F.col("is_exact"), F.lit(False)), F.col("old_id")).alias(
                "near_dup_of"
            ),
            F.when(~F.coalesce(F.col("is_exact"), F.lit(False)), F.col("jaccard")).alias(
                "jaccard"
            ),
        )
    )


def admit_apply_stream(
    spark: SparkSession,
    docs: DataFrame,
    bootstrap: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    batch_ids: list[int] | None = None,
    timings: list[dict] | None = None,
) -> None:
    """Drain ``docs`` (availableNow) through versioned-state admission.
    ``bootstrap`` seeds the corpus when no prior state exists (its sigs
    are computed exactly once — by the first batch, or its crash
    replay).  Blocks until drained.  ``batch_ids`` (if given) collects
    micro-batch ids — the multi-batch/restart test hook.  ``timings``
    (if given) collects one dict per batch with wall-clock seconds per
    phase (sig pass / judge / each state write / prune) — the
    profiling hook behind SCALE.md's per-batch cost breakdown."""
    corpus_dir = os.path.join(state_dir, "corpus")
    bands_dir = os.path.join(state_dir, "bands")
    verdicts_dir = os.path.join(state_dir, "verdicts")
    shingles_dir = os.path.join(state_dir, "shingles")
    novelty_dir = os.path.join(state_dir, "novelty")

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        if batch_ids is not None:
            batch_ids.append(batch_id)
        rec: dict = {"batch": batch_id}
        t0 = _time.time()

        def _mark(key: str) -> None:
            nonlocal t0
            now = _time.time()
            rec[key] = round(now - t0, 3)
            t0 = now

        prev = _latest_version(corpus_dir, below=batch_id)
        if prev is None:
            # bootstrap pays its single shingle+md5 pass once too: both
            # state views derive from one checkpointed projection.
            # The bootstrap corpus arrives as a single-row-group local
            # parquet (one task); a MODEST 8-way fan parallelizes the
            # dominant md5+shingle projection without inflating every
            # downstream micro-stage the way the rejected round-11
            # 32-way fan of the PER-BATCH state did (16.5 -> 21.5 s) —
            # this one runs once, on the largest input the pipeline
            # ever hashes, and fan_out's scan-parallelism guard makes
            # it a no-op on an already well-split cluster scan
            from twitter_followers_patterns_mapreduce_spark.sources.readers import (
                fan_out,
            )

            boot_state = _state_table(
                fan_out(bootstrap, 8)
            ).localCheckpoint(eager=True)
            corpus = _sig_table(boot_state)
            corpus_bands = _band_rows(boot_state)
            corpus_sh = boot_state.select(F.explode("shingles").alias("sh")).distinct()
            prev_verdicts = None
            prev_novelty = None
        else:
            corpus = spark.read.parquet(f"{corpus_dir}/v={prev}")
            corpus_bands = spark.read.parquet(f"{bands_dir}/v={prev}")
            corpus_sh = spark.read.parquet(f"{shingles_dir}/v={prev}")
            prev_verdicts = spark.read.parquet(f"{verdicts_dir}/v={prev}")
            prev_novelty = spark.read.parquet(f"{novelty_dir}/v={prev}")
        # ONE shingle+md5 pass per micro-batch: the checkpointed state
        # table is referenced by the exact check, the band join, the
        # verification join, the admitted fold AND the contamination
        # report (the earlier two-helper shape ran the shingle pipeline
        # twice per batch)
        _mark("state_resolve")
        batch_state = _state_table(batch_df).localCheckpoint(eager=True)
        _mark("sig_pass")
        batch_sigs = _sig_table(batch_state)
        batch_bands = _band_rows(batch_state)

        verdicts = _judge_batch(
            batch_sigs, batch_bands, corpus, corpus_bands, threshold
        ).localCheckpoint(eager=True)
        _mark("judge")
        kept = verdicts.where(F.col("status") == "kept").select("doc_id")

        # contamination in the SAME pass (the production ingest gate is
        # dedup + train-overlap over one state read): each arriving
        # doc's distinct shingles semi-join the persisted TRAIN shingle
        # set — per-batch cost is |batch shingles|, never O(corpus) —
        # and novelty is the complementary fraction (NULL for docs too
        # short to shingle: no shingle evidence either way)
        batch_sh = batch_state.select("doc_id", F.explode("shingles").alias("sh"))
        seen = (
            batch_sh.join(corpus_sh, "sh", "left_semi")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_seen"))
        )
        novelty = (
            verdicts.select("doc_id", "status")
            .join(batch_state.select("doc_id", "n_shingles"), "doc_id")
            .join(seen, "doc_id", "left")
            .selectExpr(
                "doc_id",
                "status",
                "CAST(n_shingles AS BIGINT) AS n_shingles",
                "CAST(coalesce(n_seen, 0) AS BIGINT) AS n_seen",
                "CASE WHEN n_shingles > 0 THEN"
                " floor((n_shingles - coalesce(n_seen, 0))"
                " / CAST(n_shingles AS DOUBLE) * 1000000) / 1000000"
                " END AS novelty",
            )
        )

        new_corpus = corpus.unionByName(
            batch_sigs.join(kept, "doc_id", "left_semi")
        )
        new_bands = corpus_bands.unionByName(
            batch_bands.join(kept, "doc_id", "left_semi")
        )
        # distinct-by-construction append: only the kept docs' shingles
        # NOT already in the set ship into the new version — |Δ|-sized
        # work, no full-state re-distinct
        kept_new_sh = (
            batch_sh.join(kept, "doc_id", "left_semi")
            .select("sh")
            .distinct()
            .join(corpus_sh, "sh", "left_anti")
        )
        new_sh = corpus_sh.unionByName(kept_new_sh)
        new_verdicts = (
            verdicts
            if prev_verdicts is None
            else prev_verdicts.unionByName(verdicts)
        )
        new_novelty = (
            novelty
            if prev_novelty is None
            else prev_novelty.unionByName(novelty)
        )
        _mark("plan_rest")
        # the five per-version writes are INDEPENDENT jobs over already
        # checkpointed/parquet inputs — submit them concurrently (Spark
        # schedules jobs from multiple threads fine) instead of paying
        # five sequential job latencies: the round-11 profile measured
        # sequential writes at ~1.5-1.9 s of a ~3.4 s batch (writes
        # dominated), parallel at ~max(single write) (SCALE.md table)
        from concurrent.futures import ThreadPoolExecutor

        def _write(args: tuple) -> tuple:
            df, d, key = args
            t = _time.time()
            df.write.mode("overwrite").parquet(f"{d}/v={batch_id}")
            return key, round(_time.time() - t, 3)

        writes = [
            (new_corpus, corpus_dir, "w_corpus"),
            (new_bands, bands_dir, "w_bands"),
            (new_sh, shingles_dir, "w_shingles"),
            (new_verdicts, verdicts_dir, "w_verdicts"),
            (new_novelty, novelty_dir, "w_novelty"),
        ]
        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            for key, dt in pool.map(_write, writes):
                rec[key] = dt
        _mark("writes_wall")
        for d in (corpus_dir, bands_dir, shingles_dir, verdicts_dir, novelty_dir):
            _prune_versions(d)
        _mark("prune")
        if timings is not None:
            timings.append(rec)

    q = (
        docs.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def verdicts_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The cumulative admission log — latest committed version."""
    verdicts_dir = os.path.join(state_dir, "verdicts")
    v = _latest_version(verdicts_dir)
    if v is None:
        raise FileNotFoundError(f"no admission state at {verdicts_dir}")
    return spark.read.parquet(f"{verdicts_dir}/v={v}")


def novelty_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The cumulative one-pass ingest-gate log — (doc_id, status,
    n_shingles, n_seen, novelty) per arrival, latest committed version."""
    novelty_dir = os.path.join(state_dir, "novelty")
    v = _latest_version(novelty_dir)
    if v is None:
        raise FileNotFoundError(f"no novelty state at {novelty_dir}")
    return spark.read.parquet(f"{novelty_dir}/v={v}")
