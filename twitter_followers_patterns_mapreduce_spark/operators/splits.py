"""Deterministic train/holdout splitting — the contamination-control
primitive of a training-data pipeline.

Membership is a pure function of the row KEY (md5-derived h64 bucket,
``functions/hashing.py``), never of partitioning, row order, or sample
randomness: a document keeps its split across reruns, repartitions,
and dataset growth — the property that makes eval-set leakage
impossible by construction.  ``spark.sql.functions.rand``-based splits
have none of these guarantees (seed × partitioning dependent).

Scale: the bucket is one scan-side md5 per row inside whole-stage
codegen — no shuffle, no state; the split column then behaves like any
partition-pruning key (write with ``partitionBy("split")`` and the
holdout read never scans train files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.functions.checkpoint import lazy_ckpt
from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

N_BUCKETS = 100


def _bucket_sql(key: str, dialect: str) -> str:
    h = h64_sql(f"cast({key} as string)" if dialect == "spark" else f"CAST({key} AS VARCHAR)",
                dialect)
    return f"({h} % {N_BUCKETS})"


def assign_split(df: DataFrame, key: str = "doc_id", holdout_pct: int = 10) -> DataFrame:
    """Add a ``split`` column: 'holdout' for the ``holdout_pct`` h64
    buckets of ``key``, else 'train'."""
    bucket = F.expr(_bucket_sql(key, "spark"))
    return df.withColumn(
        "split", F.when(bucket < holdout_pct, F.lit("holdout")).otherwise(F.lit("train"))
    )


def split_summary(documents: DataFrame, holdout_pct: int = 10) -> DataFrame:
    """Per (split, lang) doc counts and char mass — the aggregate view
    that verifies every row landed in exactly one deterministic split."""
    return (
        assign_split(documents, "doc_id", holdout_pct)
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


def split_summary_oracle(holdout_pct: int = 10) -> str:
    bucket = _bucket_sql("doc_id", "duckdb")
    return f"""SELECT
  CASE WHEN {bucket} < {holdout_pct} THEN 'holdout' ELSE 'train' END AS split,
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1, 2"""


def stratified_sample(documents: DataFrame, per_stratum: int = 20,
                      stratum: str = "lang") -> DataFrame:
    """Deterministic per-stratum sample: the ``per_stratum`` docs with
    the smallest h64(doc_id) in each stratum — a fixed-size training-mix
    builder with the same rerun/partitioning/growth-stability guarantees
    as :func:`assign_split` (rank by a content key, never ``rand()``).

    Plan: one partitioned window (never global) over scan-side hashes;
    at 100 TB the stratum is the shuffle key and each partition keeps a
    ``per_stratum``-row heap."""
    from pyspark.sql import Window

    h = F.expr(h64_sql("cast(doc_id as string)", "spark"))
    w = Window.partitionBy(stratum).orderBy(F.col("_h").asc(), F.col("doc_id").asc())
    return (
        documents.withColumn("_h", h)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= per_stratum)
        .select(F.col(stratum), "sample_rank", "doc_id", "n_chars")
    )


def stratified_sample_oracle(per_stratum: int = 20, stratum: str = "lang") -> str:
    h = h64_sql("CAST(doc_id AS VARCHAR)", "duckdb")
    return f"""SELECT {stratum}, sample_rank, doc_id, n_chars
FROM (
  SELECT {stratum}, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY {stratum}
                            ORDER BY {h} ASC, doc_id ASC) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {per_stratum}"""


# ---------------------------------------------------------------------------
# Benchmark-contamination check: holdout n-gram overlap with the train split
# ---------------------------------------------------------------------------

def contamination_check(
    documents: DataFrame, holdout_pct: int = 10, n_shingle: int = 5
) -> DataFrame:
    """Eval-set contamination audit: for every holdout document, the
    fraction of its ``n_shingle``-word shingle *occurrences* that also
    occur anywhere in the train split (the GPT-3-style n-gram overlap
    check; the reference has no text surface at all — extension op).
    Only the train index is DISTINCT — a shingle repeated in a holdout
    doc counts once per occurrence, weighting the ratio toward repeated
    material.

    Plan shape (100 TB): one scan of ``documents`` feeds both sides of
    the check — shingles are produced scan-side (explode inside the
    projection, no pre-shuffle), the train side is reduced to DISTINCT
    shingles (hash aggregate: this IS the inverted index), and the
    holdout side left-joins it on the shingle equi-key (AQE splits hot
    shingles).  Per-doc rollup is one more hash aggregate.  Nothing is
    ever all-pairs; the join carries |holdout shingles| rows.
    """
    from twitter_followers_patterns_mapreduce_spark.functions.textfns import (
        shingles_sql,
        tokens_sql,
    )

    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql
    from twitter_followers_patterns_mapreduce_spark.sources.readers import fan_out

    sh = shingles_sql(tokens_sql("text", "spark"), n_shingle, "spark")
    # Shingles are hashed to 60-bit BIGINTs BEFORE anything is
    # materialized or joined: the join key is 8 bytes instead of a
    # ~40-byte n-word string, and the checkpointed rows are
    # (doc_id, split, array<bigint>) — one row per DOC, not per
    # shingle.  (Round-3 checkpointed the post-explode string rows,
    # |docs|×|shingles| wide rows — a measured 4-7× regression.)
    sh64 = f"transform({sh}, s -> {h64_sql('s', 'spark')})"
    # fan_out: shingling is a heavy projection whose cost is per-row
    # work, not scan bytes — without it a single-row-group input pins
    # BOTH branches of the check to one task.
    # assign_split (not a reimplementation) assigns membership, so the
    # audit can never drift from the split the training run actually
    # used.
    # lazy checkpoint: train_index and holdout both branch off this
    # subtree — without it the scan+tokenize+shingle+md5 pass runs twice
    shingled = assign_split(fan_out(documents), "doc_id", holdout_pct).select(
        "doc_id",
        "split",
        F.expr(sh64).alias("sh64s"),
    ).localCheckpoint(eager=False)
    exploded = shingled.select(
        "doc_id", "split", F.explode("sh64s").alias("sh64")
    )
    train_index = (
        exploded.where(F.col("split") == "train")
        .select("sh64")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    holdout = exploded.where(F.col("split") == "holdout").select("doc_id", "sh64")
    return (
        holdout.join(train_index, on="sh64", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),
            (F.count("_hit") / F.count("*")).alias("contamination_ratio"),
        )
    )


def contamination_check_oracle(holdout_pct: int = 10, n_shingle: int = 5) -> str:
    from twitter_followers_patterns_mapreduce_spark.functions.textfns import (
        shingles_sql,
        tokens_sql,
    )

    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    sh = shingles_sql(tokens_sql("text", "duckdb"), n_shingle, "duckdb")
    sh64 = f"list_transform({sh}, s -> {h64_sql('s', 'duckdb')})"
    bucket = _bucket_sql("doc_id", "duckdb")
    split = f"CASE WHEN {bucket} < {holdout_pct} THEN 'holdout' ELSE 'train' END"
    shingled = f"SELECT doc_id, {split} AS split, UNNEST({sh64}) AS sh64 FROM documents"
    return f"""WITH shingled AS ({shingled}),
train_index AS (SELECT DISTINCT sh64 FROM shingled WHERE split = 'train'),
holdout AS (SELECT doc_id, sh64 FROM shingled WHERE split = 'holdout')
SELECT h.doc_id,
       COUNT(*) AS n_shingles,
       COUNT(t.sh64) AS n_contaminated,
       COUNT(t.sh64) / COUNT(*) AS contamination_ratio
FROM holdout h LEFT JOIN train_index t ON h.sh64 = t.sh64
GROUP BY h.doc_id"""


# ---------------------------------------------------------------------------
# Temperature-flattened mixture sampling per source
# ---------------------------------------------------------------------------

def mixture_sample(documents: DataFrame, stratum: str = "source") -> DataFrame:
    """α=0.5 temperature sampling of the training mix: each ``stratum``
    keeps ``ceil(sqrt(n_s))`` documents, flattening the source
    distribution the way multilingual/multi-source pipelines re-weight
    head sources down (p_s ∝ n_s^α).  Selection ranks by h64(doc_id) —
    deterministic under reruns, partitioning, and corpus growth.

    ``sqrt`` is IEEE-754 correctly-rounded in both engines, so the
    per-source target size is bit-identical cross-engine (``pow`` is
    NOT, which is why the exponent is hardwired to 0.5).

    Plan: one shuffle by ``stratum``; COUNT and ROW_NUMBER share the
    same window partition, so the cap is computed in the same stage as
    the ranking — no second pass over the data.
    """
    from pyspark.sql import Window

    h = F.expr(h64_sql("cast(doc_id as string)", "spark"))
    w = Window.partitionBy(stratum)
    wr = w.orderBy(F.col("_h").asc(), F.col("doc_id").asc())
    return (
        documents.withColumn("_h", h)
        .withColumn("n_source", F.count("*").over(w))
        .withColumn("sample_rank", F.row_number().over(wr))
        .where(F.col("sample_rank") <= F.ceil(F.sqrt(F.col("n_source"))))
        .select(
            F.col(stratum),
            F.col("n_source"),
            F.col("sample_rank"),
            F.col("doc_id"),
            F.col("n_chars"),
        )
    )


def mixture_sample_oracle(stratum: str = "source") -> str:
    h = h64_sql("CAST(doc_id AS VARCHAR)", "duckdb")
    return f"""SELECT {stratum}, n_source, sample_rank, doc_id, n_chars
FROM (
  SELECT {stratum}, doc_id, n_chars,
         COUNT(*) OVER (PARTITION BY {stratum}) AS n_source,
         ROW_NUMBER() OVER (PARTITION BY {stratum}
                            ORDER BY {h} ASC, doc_id ASC) AS sample_rank
  FROM documents
)
WHERE sample_rank <= CEIL(SQRT(n_source))"""


def split_drift_ks(documents: DataFrame, holdout_pct: int = 10) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift audit between the train and
    holdout splits over ``n_chars``: KS = max_x |F_train(x) - F_holdout(x)|,
    the 5% critical value ``1.358 * sqrt((n1+n2)/(n1*n2))``, and the drift
    verdict.  A correct hash split should NOT drift - this is the standing
    monitor that catches a broken split function, a skewed ingest, or
    upstream distribution shift before a model trains on it.

    Exactness: both CDFs are ratios of exact BIGINT cumulative counts;
    the max runs over the finite set of observed values, so both engines
    evaluate identical doubles (round(6) emitted).

    Plan shape (100 TB): one hash agg collapses the corpus to
    (n_chars -> per-split counts) - a DIMENSION-sized histogram (distinct
    document lengths), which is why the cumulative window may order
    globally: it runs on the collapsed histogram, never on documents;
    the split totals ride the same window pass as a full-frame sum.
    """
    from pyspark.sql import Window

    split_col = assign_split(documents, "doc_id", holdout_pct)
    hist = split_col.groupBy("n_chars").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("c_train"),
        F.sum(F.when(F.col("split") == "holdout", 1).otherwise(0)).alias("c_hold"),
    )
    # partitionBy(lit): the cumulative scan is DELIBERATELY single-
    # partition — a KS statistic is a global order scan, and it runs on
    # the |distinct n_chars|-sized histogram, not the raw docs.  (The
    # constant key does NOT suppress WindowExec's no-partition warning;
    # Catalyst folds it.  Single-partition here is the intent.)
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Totals ride the SAME constant-key window as the cumulative scan
    # (full frame instead of unbounded-preceding) — one WindowExec pass
    # over the histogram, no scalar cross-join back (the r3 form paid a
    # 1-row broadcast cross here; this is the same number and the plan
    # stays in the no-cross-join invariant of test_plan_shapes).
    w_tot = Window.partitionBy(F.lit(0)).orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    joined = hist.select(
        F.sum("c_train").over(w).alias("cum_train"),
        F.sum("c_hold").over(w).alias("cum_hold"),
        F.sum("c_train").over(w_tot).cast("long").alias("n_train"),
        F.sum("c_hold").over(w_tot).cast("long").alias("n_holdout"),
    )
    diff = F.abs(
        F.col("cum_train").cast("double") / F.col("n_train").cast("double")
        - F.col("cum_hold").cast("double") / F.col("n_holdout").cast("double")
    )
    ks = F.max(diff)
    n1 = F.max("n_train").cast("double")
    n2 = F.max("n_holdout").cast("double")
    crit = F.lit(1.358) * F.sqrt((n1 + n2) / (n1 * n2))
    return joined.agg(
        F.max("n_train").alias("n_train"),
        F.max("n_holdout").alias("n_holdout"),
        F.round(ks, 6).alias("ks_stat"),
        F.round(crit, 6).alias("ks_crit_5pct"),
        (ks > crit).alias("drifted"),
    )


def split_drift_ks_oracle(holdout_pct: int = 10) -> str:
    bucket = _bucket_sql("doc_id", "duckdb")
    return f"""WITH tagged AS (
  SELECT n_chars,
         CASE WHEN {bucket} < {holdout_pct} THEN 'holdout' ELSE 'train' END AS split
  FROM documents
), hist AS (
  SELECT n_chars,
         SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS c_train,
         SUM(CASE WHEN split = 'holdout' THEN 1 ELSE 0 END) AS c_hold
  FROM tagged GROUP BY n_chars
), cum AS (
  SELECT SUM(c_train) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum_train,
         SUM(c_hold) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum_hold
  FROM hist
), tot AS (
  SELECT CAST(MAX(cum_train) AS BIGINT) AS n_train,
         CAST(MAX(cum_hold) AS BIGINT) AS n_holdout FROM cum
)
SELECT t.n_train, t.n_holdout,
       round(MAX(ABS(CAST(cum_train AS DOUBLE) / t.n_train
                     - CAST(cum_hold AS DOUBLE) / t.n_holdout)), 6) AS ks_stat,
       round(1.358 * sqrt((CAST(t.n_train AS DOUBLE) + t.n_holdout)
                          / (CAST(t.n_train AS DOUBLE) * t.n_holdout)), 6) AS ks_crit_5pct,
       MAX(ABS(CAST(cum_train AS DOUBLE) / t.n_train
               - CAST(cum_hold AS DOUBLE) / t.n_holdout))
         > 1.358 * sqrt((CAST(t.n_train AS DOUBLE) + t.n_holdout)
                        / (CAST(t.n_train AS DOUBLE) * t.n_holdout)) AS drifted
FROM cum, tot t
GROUP BY t.n_train, t.n_holdout"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis exponential race)
# ---------------------------------------------------------------------------

#: fixed-point grid for the exponential-race key: comparisons happen on
#: floor(key · 1e12) so the top-k never hinges on a last-ulp ln/divide
#: difference (same device as the k-means argmin grid).
_ES_GRID = 1_000_000_000_000


def weighted_sample(documents: DataFrame, k: int = 100) -> DataFrame:
    """Weighted sampling WITHOUT replacement by the Efraimidis–Spirakis
    exponential race (A-ES, 2006): each doc draws u ∈ (0, 1] from a
    DETERMINISTIC content hash and races with key −ln(u)/w; the k
    smallest keys are a weighted-without-replacement sample — the
    quality-weighted corpus subsetter (w here = ``n_chars``; swap in any
    positive quality score).  A-ES is THE distributed formulation:
    selection is a global top-k over per-row scan-side keys, one pass,
    no sequential state, and the hash-derived u gives the repo-wide
    rerun/retry/partitioning stability no ``rand()`` sample has.

    Plan: keys are codegen expressions at the scan; the top-k is
    ``orderBy(limit)`` — Spark's TakeOrdered, a per-partition heap +
    k-row driver merge, never a global sort; ranks are re-derived by a
    window over the k survivors only.
    """
    from pyspark.sql import Window

    u = f"(({h64_sql('cast(doc_id as string)', 'spark')}) + 1) / 1152921504606846976.0"
    key = F.floor(F.expr(f"-ln({u}) / n_chars") * F.lit(_ES_GRID)).alias("_key")
    top = (
        documents.select("doc_id", "n_chars", key)
        .orderBy(F.col("_key").asc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("_key").asc(), F.col("doc_id").asc())
    return top.select(
        F.row_number().over(w).cast("int").alias("sample_rank"),
        "doc_id",
        F.col("n_chars").alias("weight"),
    )


def weighted_sample_oracle(k: int = 100) -> str:
    u = f"(({h64_sql('CAST(doc_id AS VARCHAR)', 'duckdb')}) + 1) / 1152921504606846976.0"
    return f"""SELECT CAST(ROW_NUMBER() OVER (ORDER BY _key ASC, doc_id ASC) AS INT) AS sample_rank,
       doc_id, n_chars AS weight
FROM (
  SELECT doc_id, n_chars,
         floor(-ln({u}) / n_chars * {_ES_GRID}) AS _key
  FROM documents
  ORDER BY _key ASC, doc_id ASC LIMIT {k})"""


# ---------------------------------------------------------------------------
# Priority sampling (Duffield–Lund–Thorup) subset-sum estimation
# ---------------------------------------------------------------------------


def _priority_expr(dialect: str) -> str:
    """q_i = w_i / u_i with u_i = (h64(doc_id)+1) / 2^60 ∈ (0, 1] —
    IDENTICAL expression text both engines.  Unlike the A-ES key
    (−ln(u)/w, libm ⇒ grid-floored), the priority is two
    correctly-rounded IEEE ops (add, divide) on exactly-shared inputs,
    so raw doubles order identically cross-engine with no grid."""
    cast = "VARCHAR" if dialect == "duckdb" else "string"
    h = h64_sql(f"CAST(doc_id AS {cast})", dialect)
    return (
        "CAST(n_chars AS DOUBLE)"
        f" / ((CAST({h} AS DOUBLE) + 1.0) / 1152921504606846976.0)"
    )


def priority_sum_estimate(documents: DataFrame, k: int = 100) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup 2007): keep the k docs
    with the largest priorities q_i = w_i/u_i, let τ be the (k+1)-th
    priority, and Σ max(w_i, τ) over the sample is an UNBIASED
    estimator of Σ w_i — the property the A-ES race
    (:func:`weighted_sample`) does not give.  This is how a 100 TB
    pipeline answers "how many tokens does this filtered slice hold?"
    from a fixed-size sample instead of a scan: the same k-row sample
    estimates ANY subset's weight sum by restricting the Σ max(w_i, τ)
    to the subset's members.

    Determinism: u derives from the content hash (rerun/retry/
    partition-stable), and every comparable output is either exact
    BIGINT or derives from the floored-term integer sum — the estimate
    is Σ floor(max(w_i, τ)·1e6) summed EXACTLY as BIGINT (order-free),
    never a float accumulation.

    Plan: priorities are scan-side codegen; top-(k+1) is TakeOrdered
    (per-partition heap + driver merge, never a global sort); the rank
    window rides the ≤k+1 survivor rows; the exact companion is one
    plain aggregate sharing nothing but the scan (the gate's cost —
    the kll/theta discipline).  Output (1 row): k, n_docs, tau,
    est_chars, exact_chars, abs_rel_err.
    """
    from pyspark.sql import Window

    pri = documents.selectExpr(
        "doc_id", "n_chars", f"{_priority_expr('spark')} AS q"
    )
    top = pri.orderBy(F.col("q").desc(), F.col("doc_id").asc()).limit(k + 1)
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("q").desc(), F.col("doc_id").asc())
    ranked = top.withColumn("rn", F.row_number().over(w))
    # τ = the (k+1)-th priority; 0 when the corpus fits in the sample
    # (then the estimator degenerates to the exact sum, as it must)
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("q"))), F.lit(0.0)
        ).alias("tau")
    )
    est = (
        ranked.where(F.col("rn") <= k)
        .crossJoin(F.broadcast(tau))  # ≤k rows × 1: declared bounded cross
        .agg(
            F.sum(
                F.floor(
                    F.greatest(F.col("n_chars").cast("double"), F.col("tau"))
                    * F.lit(1_000_000)
                ).cast("long")
            ).alias("est6"),
            F.max("tau").alias("tau"),
        )
    )
    exact = documents.agg(
        F.sum("n_chars").cast("long").alias("exact_chars"),
        F.count("*").cast("long").alias("n_docs"),
    )
    # 1 × 1 declared cross: sample summary × exact companion
    return est.crossJoin(F.broadcast(exact)).selectExpr(
        f"CAST({k} AS BIGINT) AS k",
        "n_docs",
        "tau",
        "floor(CAST(est6 AS DOUBLE) / 1000000 * 1000000) / 1000000 AS est_chars",
        "exact_chars",
        "floor(abs(CAST(est6 AS DOUBLE) / 1000000 - exact_chars) / exact_chars"
        " * 1000000) / 1000000 AS abs_rel_err",
    )


def priority_sum_estimate_oracle(k: int = 100) -> str:
    q = _priority_expr("duckdb")
    return f"""WITH pri AS (
  SELECT doc_id, n_chars, {q} AS q FROM documents
), ranked AS (
  SELECT doc_id, n_chars, q,
         ROW_NUMBER() OVER (ORDER BY q DESC, doc_id ASC) AS rn
  FROM pri
), tau AS (
  SELECT coalesce(MAX(CASE WHEN rn = {k + 1} THEN q END), 0.0) AS tau
  FROM ranked WHERE rn <= {k + 1}
), est AS (
  SELECT CAST(SUM(CAST(floor(greatest(CAST(n_chars AS DOUBLE), tau) * 1000000)
                       AS BIGINT)) AS BIGINT) AS est6,
         MAX(tau) AS tau
  FROM ranked CROSS JOIN tau WHERE rn <= {k}
), exact AS (
  SELECT CAST(SUM(n_chars) AS BIGINT) AS exact_chars,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents)
SELECT CAST({k} AS BIGINT) AS k, n_docs, tau,
  floor(CAST(est6 AS DOUBLE) / 1000000 * 1000000) / 1000000 AS est_chars,
  exact_chars,
  floor(abs(CAST(est6 AS DOUBLE) / 1000000 - exact_chars) / exact_chars
    * 1000000) / 1000000 AS abs_rel_err
FROM est CROSS JOIN exact"""


def _hashed_feats(
    documents: DataFrame, b_buckets: int, target_sources: tuple[str, ...]
) -> DataFrame:
    """Spark side of the hashed-bigram feature stream (one row per
    unigram AND per adjacent-bigram OCCURRENCE, content-hash bucketed):
    ``(doc_id, source, is_tgt, bucket)`` — shared by the DSIR sampler
    and the discriminative quality classifier, which model the SAME
    curated-vs-raw task generatively and discriminatively."""
    from twitter_followers_patterns_mapreduce_spark.functions.textfns import tokens_sql

    toks = tokens_sql("text", "spark")
    tgt = "source IN ({})".format(", ".join(f"'{s}'" for s in target_sources))
    # coalesce(…, array()) never fires but flips `toks` non-NULLABLE, so
    # the downstream bucket equi-joins can't infer an isnotnull(toks)
    # constraint that alias-substitutes the whole tokenizer below this
    # projection into a per-row scan-side Filter (the shingled_docs
    # trap, operators/dedup.py)
    from twitter_followers_patterns_mapreduce_spark.sources.readers import fan_out

    # fan_out BEFORE tokenizing: the per-row regex tokenizer + bigram
    # explode dominate, and the single-row-group local scan would run
    # them in one task (work-sized partitioning, sources/readers.py);
    # only (doc_id, source, text) rows cross the small shuffle
    base = fan_out(documents.select("doc_id", "source", "text")).selectExpr(
        "doc_id",
        "source",
        f"CAST({tgt} AS INT) AS is_tgt",
        f"coalesce({toks}, array()) AS toks",
    )
    bigrams = (
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks)-1), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i+1))) "
        "ELSE array() END"
    )
    h = h64_sql("feat", "spark")
    # h64 is a 60-bit non-negative value, so plain % == pmod in both engines.
    # ONE explode over concat(unigrams, bigrams) instead of a UNION of two
    # explodes (round-11, guide §2.4): the union shape ran the tokenizer
    # subtree once per branch — every document was regex-tokenized twice.
    # Both consumers aggregate the feature multiset, so branch order is
    # irrelevant and the fold is exact.
    return base.selectExpr(
        "doc_id", "source", "is_tgt", f"explode(concat(toks, {bigrams})) AS feat"
    ).selectExpr("doc_id", "source", "is_tgt", f"({h}) % {b_buckets} AS bucket")


def _dsir_feats_duckdb(b_buckets: int, target_sources: tuple[str, ...]) -> str:
    """The oracle's mirror of the hashed-bigram feature stream: one row
    per unigram AND per adjacent-bigram OCCURRENCE (bag counts, not
    distinct — the DSIR statistic is a multinomial likelihood), bucketed
    by content hash.  Returned as a derived-table SQL string
    ``(doc_id, source, is_tgt, bucket)``."""
    from twitter_followers_patterns_mapreduce_spark.functions.textfns import tokens_sql

    toks = tokens_sql("text", "duckdb")
    tgt = "source IN ({})".format(", ".join(f"'{s}'" for s in target_sources))
    # DuckDB range(a, b) is [a, b): i runs 1..len-1, pairing i, i+1
    bigrams = (
        "CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), "
        "i -> toks[i] || ' ' || toks[i+1]) ELSE [] END"
    )
    explode = "unnest"
    h = h64_sql("feat", "duckdb")
    # h64 is a 60-bit non-negative value, so plain % == pmod in both engines
    return f"""(
  SELECT doc_id, source, is_tgt, ({h}) % {b_buckets} AS bucket
  FROM (
    SELECT doc_id, source, is_tgt, {explode}(toks) AS feat
    FROM (SELECT doc_id, source, CAST({tgt} AS INT) AS is_tgt, {toks} AS toks
          FROM documents) b0
    UNION ALL
    SELECT doc_id, source, is_tgt, {explode}({bigrams}) AS feat
    FROM (SELECT doc_id, source, CAST({tgt} AS INT) AS is_tgt, {toks} AS toks
          FROM documents) b1
  ) f
)"""


#: Log-likelihood-ratio weight per hash bucket, Laplace-smoothed, on the
#: 1e-6 integer grid (the +0.5 floor is round-half-up).  ln is libm, so
#: the micro grid is the cross-engine determinism device (the
#: doc_weighted_sample precedent); everything downstream of the ≤B-row
#: weight spine is exact BIGINT arithmetic.
_DSIR_W = (
    "CAST(FLOOR(1000000.0 * LN("
    "((CAST(t_f AS DOUBLE) + 1.0) / (CAST(t_tot AS DOUBLE) + {b}.0)) / "
    "((CAST(r_f AS DOUBLE) + 1.0) / (CAST(r_tot AS DOUBLE) + {b}.0))"
    ") + 0.5) AS BIGINT)"
)


def dsir_weights(
    documents: DataFrame,
    b_buckets: int = 512,
    k: int = 100,
    target_sources: tuple[str, ...] = ("src0", "src1", "src2", "src3"),
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every RAW doc by
    the log-likelihood ratio of a hashed-bigram multinomial fit on the
    TARGET slice vs one fit on the raw pool, and keep the top-k — the
    published recipe for "find CommonCrawl pages that read like the
    curated corpus" without a trained classifier.

    Spark-first shape: features are scan-side codegen (whitespace
    tokens + adjacent bigrams, content-hashed into ``b_buckets``
    buckets — no vocabulary is ever collected); both n-gram models are
    ONE conditional hash-aggregate to a ≤B-row spine; the weight table
    broadcasts back onto the per-doc feature counts, and the per-doc
    score is an EXACT BIGINT Σ count·w_micro (order-free — float
    accumulation never touches a comparable).  Top-k is TakeOrdered
    (per-partition heap + driver merge), never a global sort.  At
    100 TB the only data-sized costs are the feature explode and two
    hash aggs; the model itself is B rows regardless of corpus size.

    ln rides the 1e-6 micro grid (see ``_DSIR_W``).  Output (k rows):
    doc_id, source, n_feats, dsir_score_micro.
    """
    feats = _hashed_feats(documents, b_buckets, target_sources)
    bucket_counts = feats.groupBy("bucket").agg(
        F.sum("is_tgt").cast("long").alias("t_f"),
        F.sum(F.expr("1 - is_tgt")).cast("long").alias("r_f"),
    )
    totals = bucket_counts.agg(
        F.sum("t_f").cast("long").alias("t_tot"),
        F.sum("r_f").cast("long").alias("r_tot"),
    ).selectExpr("t_tot", "r_tot", "t_tot - t_tot AS _k")
    # pmod(bucket, 1): data-derived zero key — a literal 0 would fold
    # and turn the 1-row totals join into a nested-loop cross
    weights = (
        bucket_counts.selectExpr("bucket", "t_f", "r_f", "pmod(bucket, 1) AS _k")
        .join(F.broadcast(totals), "_k")
        .selectExpr("bucket", _DSIR_W.format(b=b_buckets) + " AS w_micro")
    )
    doc_feats = (
        feats.where("is_tgt = 0")
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    scored = (
        doc_feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.expr("c * w_micro")).cast("long").alias("dsir_score_micro"),
        )
    )
    return scored.orderBy(
        F.col("dsir_score_micro").desc(), F.col("doc_id").asc()
    ).limit(k)


def dsir_weights_oracle(
    b_buckets: int = 512,
    k: int = 100,
    target_sources: tuple[str, ...] = ("src0", "src1", "src2", "src3"),
) -> str:
    feats = _dsir_feats_duckdb(b_buckets, target_sources)
    w = _DSIR_W.format(b=b_buckets)
    return f"""WITH feats AS (SELECT * FROM {feats} f2),
bc AS (
  SELECT bucket, CAST(SUM(is_tgt) AS BIGINT) AS t_f,
         CAST(SUM(1 - is_tgt) AS BIGINT) AS r_f
  FROM feats GROUP BY bucket
), tot AS (
  SELECT CAST(SUM(t_f) AS BIGINT) AS t_tot, CAST(SUM(r_f) AS BIGINT) AS r_tot
  FROM bc
), w AS (
  SELECT bucket, {w} AS w_micro FROM bc CROSS JOIN tot
), df AS (
  SELECT doc_id, source, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM feats WHERE is_tgt = 0 GROUP BY doc_id, source, bucket
)
SELECT doc_id, source, CAST(SUM(c) AS BIGINT) AS n_feats,
       CAST(SUM(c * w_micro) AS BIGINT) AS dsir_score_micro
FROM df JOIN w USING (bucket)
GROUP BY doc_id, source
ORDER BY dsir_score_micro DESC, doc_id ASC
LIMIT {k}"""


_DEC_Q = "decimal(28,12)"  # the logreg family's order-free reduction type


def quality_classifier_scores(
    documents: DataFrame,
    b_buckets: int = 512,
    iters: int = 3,
    lr: float = 0.5,
    target_sources: tuple[str, ...] = ("src0", "src1", "src2", "src3"),
) -> DataFrame:
    """fastText-style DISCRIMINATIVE quality classifier — the canonical
    pretraining filter (a linear model over hashed n-gram features
    trained to tell the curated slice from the raw pool, the GPT-3/
    CCNet-lineage recipe) and the discriminative sibling of
    :func:`dsir_weights`, sharing its exact feature stream.

    Spark-first training: the model is a ≤(B+1)-row (bucket, weight)
    TABLE that never leaves the executors — each of the ``iters``
    logistic-regression rounds is two equi-joins against the sparse
    per-doc feature table (z-scores, then gradient) plus one ≤B-row
    weight update; the bias is a pseudo-feature (bucket −1, x = 1), so
    the whole round is uniform hash-agg algebra.  Per-doc features are
    length-normalized counts (x = cnt/Σcnt).

    Exactness contract (the ``_logreg_weights`` discipline): every
    accumulating SUM quantizes its per-term double product on the
    DECIMAL(28,12) grid so the reduction is order-free and identical
    under any partitioning; z → sigmoid → residual is a fixed chain of
    IEEE/libm ops on identical inputs; scores emit floored at 6dp.
    The oracle unrolls the training rounds as CTEs and matches
    bit-for-bit.  Round-11: the quantized terms accumulate as
    hi/lo-split BIGINTs (``q12 = CAST(DECIMAL(28,12) grid value × 10¹²
    AS BIGINT)``, exact long sums, DECIMAL(24,0)-based reconstruction
    on the group rows only) instead of DECIMAL sums — same grid, same
    values (verified element-wise vs the decimal plan), no per-row
    BigDecimal accumulation; the long form stays exact through ~1e24
    scaled units, i.e. billions of docs per bucket.

    Output (one row per doc): doc_id, y, score, keep.
    """
    feats = _hashed_feats(documents, b_buckets, target_sources)
    docx = feats.groupBy("doc_id", "is_tgt", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )
    tot = docx.groupBy("doc_id").agg(F.sum("cnt").cast("long").alias("nt"))
    tgt = "source IN ({})".format(", ".join(f"'{s}'" for s in target_sources))
    base = documents.selectExpr("doc_id", f"CAST({tgt} AS INT) AS is_tgt")
    x = (
        docx.join(tot, "doc_id")
        .selectExpr(
            "doc_id",
            "is_tgt",
            "bucket",
            "CAST(cnt AS DOUBLE) / CAST(nt AS DOUBLE) AS x",
        )
        .unionByName(
            base.selectExpr(
                "doc_id", "is_tgt", "CAST(-1 AS BIGINT) AS bucket", "1.0 AS x"
            )
        )
        .transform(lazy_ckpt)
    )
    # corpus size: one metadata-sized action (the logreg-family
    # bounded control-plane collect)
    n_docs = base.count()
    w = x.select("bucket").distinct().withColumn("w", F.lit(0.0))

    def _dot(df: DataFrame, term: str, keys: list[str], extra: list[F.Column]):
        """hi/lo-split exact dot-product sum of ``term`` on the
        DECIMAL(28,12) grid, grouped by ``keys``; yields column ``z``."""
        q = df.selectExpr(
            *keys,
            *[c for c in df.columns if c not in keys and c != "_q12"],
            f"CAST(CAST({term} AS {_DEC_Q}) * 1000000000000 AS BIGINT) AS _q12",
        )
        return (
            q.groupBy(*keys)
            .agg(
                *extra,
                F.expr("SUM(_q12 DIV 1000000)").alias("_sh"),
                F.expr("SUM(_q12 % 1000000)").alias("_sl"),
            )
            .withColumn(
                "z",
                F.expr(
                    "CAST(CAST(CAST(_sh AS DECIMAL(23,0)) * 1000000 + _sl"
                    " AS DECIMAL(24,0)) / 1000000000000 AS DOUBLE)"
                ),
            )
            .drop("_sh", "_sl")
        )

    for _ in range(iters):
        z = _dot(
            x.join(F.broadcast(w), "bucket"),
            "x * w",
            ["doc_id"],
            [F.max("is_tgt").alias("y")],
        ).selectExpr("doc_id", "CAST(y AS DOUBLE) - 1.0 / (1.0 + exp(-z)) AS r")
        g = _dot(x.join(z, "doc_id"), "x * r", ["bucket"], []).selectExpr(
            "bucket", f"z / CAST({n_docs} AS DOUBLE) AS g"
        )
        w = (
            w.join(g, "bucket")
            .selectExpr("bucket", f"w + {lr!r} * g AS w")
            .transform(lazy_ckpt)
        )
    return (
        _dot(
            x.join(F.broadcast(w), "bucket"),
            "x * w",
            ["doc_id"],
            [F.max("is_tgt").cast("long").alias("y")],
        )
        .selectExpr(
            "doc_id",
            "y",
            "floor((1.0 / (1.0 + exp(-z))) * 1000000) / 1000000 AS score",
        )
        .withColumn("keep", (F.col("score") >= 0.5).cast("boolean"))
    )


def quality_classifier_oracle(
    b_buckets: int = 512,
    iters: int = 3,
    lr: float = 0.5,
    target_sources: tuple[str, ...] = ("src0", "src1", "src2", "src3"),
) -> str:
    feats = _dsir_feats_duckdb(b_buckets, target_sources)
    tgt = "source IN ({})".format(", ".join(f"'{s}'" for s in target_sources))
    rounds = []
    prev_w = "w0"
    for i in range(1, iters + 1):
        rounds.append(
            f"""r{i} AS (
  SELECT x.doc_id,
         CAST(MAX(x.is_tgt) AS DOUBLE)
           - 1.0 / (1.0 + exp(-CAST(SUM(CAST(x.x * w.w AS DECIMAL(28,12)))
                                    AS DOUBLE))) AS r
  FROM x JOIN {prev_w} w USING (bucket) GROUP BY x.doc_id
), g{i} AS (
  SELECT x.bucket,
         CAST(SUM(CAST(x.x * r.r AS DECIMAL(28,12))) AS DOUBLE)
           / CAST(n.n AS DOUBLE) AS g
  FROM x JOIN r{i} r USING (doc_id) CROSS JOIN n GROUP BY x.bucket, n.n
), w{i} AS (
  SELECT w.bucket, w.w + {lr!r} * g.g AS w
  FROM {prev_w} w JOIN g{i} g USING (bucket)
)"""
        )
        prev_w = f"w{i}"
    rounds_sql = ",\n".join(rounds)
    return f"""WITH feats AS (SELECT * FROM {feats} f2),
docx AS (
  SELECT doc_id, is_tgt, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM feats GROUP BY doc_id, is_tgt, bucket
), tot AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS nt FROM docx GROUP BY doc_id),
base AS (SELECT doc_id, CAST({tgt} AS INT) AS is_tgt FROM documents),
x AS (
  SELECT d.doc_id, d.is_tgt, d.bucket,
         CAST(cnt AS DOUBLE) / CAST(nt AS DOUBLE) AS x
  FROM docx d JOIN tot USING (doc_id)
  UNION ALL
  SELECT doc_id, is_tgt, CAST(-1 AS BIGINT), 1.0 FROM base
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
w0 AS (SELECT DISTINCT bucket, 0.0 AS w FROM x),
{rounds_sql}
SELECT x.doc_id,
       CAST(MAX(x.is_tgt) AS BIGINT) AS y,
       floor((1.0 / (1.0 + exp(-CAST(SUM(CAST(x.x * w.w AS DECIMAL(28,12)))
                                     AS DOUBLE)))) * 1000000) / 1000000 AS score,
       floor((1.0 / (1.0 + exp(-CAST(SUM(CAST(x.x * w.w AS DECIMAL(28,12)))
                                     AS DOUBLE)))) * 1000000) / 1000000 >= 0.5
         AS keep
FROM x JOIN {prev_w} w USING (bucket)
GROUP BY x.doc_id"""
