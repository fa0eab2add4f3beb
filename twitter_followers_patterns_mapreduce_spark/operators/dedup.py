"""Deduplication operators over ``documents`` — exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine (extension surface,
SURVEY.md §7.3 M5; part of the 100 TB training-data pipeline story).

Scale design:
  * exact dedup      — one hash-groupBy shuffle on md5(text); at 100 TB
    pre-partition by the hash prefix and spill-free partial counts.
  * MinHash+LSH      — signatures are computed scan-side (per-row array
    expressions inside codegen, NO shuffle), then one explode(bands) →
    groupBy-band shuffle whose fan-in is |docs|·bands tiny rows;
    candidate verification joins only the colliding pairs.  This is the
    shingle→minhash→band→bucket-join pipeline; band width tunes the
    jaccard detection threshold (6 bands × 2 rows ⇒ ~0.41 knee).
  * SimHash          — pure per-row fold (aggregate/zip_with over the
    token array), embarrassingly parallel; pair search is a self-join
    on hamming ≤ r, pruned here by exact-band prefilter at scale.
  * n-gram Jaccard   — inverted-index join (explode shingles → equi-join
    on shingle) with hot-shingle skew handled by AQE; exact but
    quadratic in posting-list length — the LSH path is the scale path.

All hash values derive from md5 (functions/hashing.py) so the DuckDB
oracle reproduces them bit-for-bit — full value-hash coverage, no
rows-only fallbacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.sources.readers import fan_out

from twitter_followers_patterns_mapreduce_spark.functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    h64_sql,
    minhash_perm_sql,
)
from twitter_followers_patterns_mapreduce_spark.functions.textfns import (
    shingles_sql,
    tokens_sql,
)

SIMHASH_BITS = 60  # h64 yields 60 usable bits


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dup_groups(corpus: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash: (text_md5, n_copies,
    keeper_id=min doc_id).  One hash-aggregate shuffle; the canonical
    "drop exact dups, keep first" building block."""
    return (
        corpus.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_id"))
        .where(F.col("n_copies") >= 2)
    )


def exact_dedup_keep_best(corpus: DataFrame) -> DataFrame:
    """Pick ONE representative per exact-dup group: highest quality
    score, ties to lowest doc_id — the canonical training-data
    "dedup, keep the best copy" step (row_number window dedup; the
    window partitions on the content hash, so state per key is the
    group size, never the corpus)."""
    from pyspark.sql import Window

    from twitter_followers_patterns_mapreduce_spark.operators.text import (
        apply_select,
        quality_score_select,
    )

    scored = apply_select(corpus, quality_score_select("spark"))
    hashed = corpus.select("doc_id", F.md5("text").alias("text_md5"))
    joined = hashed.join(scored, "doc_id")
    w = Window.partitionBy("text_md5").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("text_md5", F.col("doc_id").alias("keeper_id"), "quality_score")
    )


def exact_dedup_keep_best_oracle() -> str:
    from twitter_followers_patterns_mapreduce_spark.operators.text import (
        quality_score_select,
        select_sql,
    )

    scored = select_sql("documents", quality_score_select("duckdb"))
    return f"""WITH scored AS ({scored}),
joined AS (
  SELECT md5(d.text) AS text_md5, d.doc_id, s.quality_score,
         ROW_NUMBER() OVER (PARTITION BY md5(d.text)
                            ORDER BY s.quality_score DESC, d.doc_id ASC) AS rn
  FROM documents d JOIN scored s ON s.doc_id = d.doc_id
)
SELECT text_md5, doc_id AS keeper_id, quality_score FROM joined WHERE rn = 1"""


# --------------------------------------------------------------------------
# minhash + LSH
# --------------------------------------------------------------------------


def _shingle_expr(dialect: str, text: str = "text", n: int = 3) -> str:
    return shingles_sql(tokens_sql(text, dialect), n, dialect)


def shingled_docs(documents: DataFrame, n_shingle: int = 3) -> DataFrame:
    """(doc_id, shingles) with tokens and shingles STAGED as separate
    projections.  Inlining the tokenizer into the shingle lambda (the
    one-expression form) re-tokenizes per array element — O(tokens²)
    per doc, measured 7× slower at sf0.1; staged columns evaluate each
    stage once (Catalyst keeps non-cheap multi-referenced aliases in
    their own Project)."""
    toks = tokens_sql("text", "spark")
    return (
        # fan_out: shingle+md5 per-row cost dominates; without it the
        # single-row-group local scan pins the whole signature stage to
        # one task (sources/readers.py::fan_out).
        fan_out(documents).selectExpr("doc_id", f"{toks} AS toks")
        # equivalent to size(shingles) > 0, but filtering on the TOKEN
        # array: a predicate on `shingles` gets pushed below both
        # projections with the quadratic inline expression substituted
        # back in (measured 6× slower at sf0.1)
        .where(F.size("toks") >= n_shingle)
        # coalesce(…, array()) never fires (toks ≥ n guarantees non-null)
        # but flips the column to non-NULLABLE, so downstream joins on
        # jaccard(shingles) can't infer an isnotnull(shingles) constraint
        # — that inferred filter gets alias-substituted below these
        # projections and re-runs the whole inlined shingle pipeline
        # per doc in a scan-side Filter (measured 8 s of a 9.6 s query
        # at sf0.1)
        .selectExpr(
            "doc_id",
            f"coalesce({shingles_sql('toks', n_shingle, 'spark')}, array()) AS shingles",
        )
    )


def minhash_signatures(documents: DataFrame, n_shingle: int = 3) -> DataFrame:
    """Per-doc minhash signature columns sig0..sig{K-1} plus the distinct
    shingle set.  Entirely scan-side (no shuffle), all in codegen.

    Each shingle is md5-hashed ONCE into a ``hashes`` array; the K
    signatures are array_min over cheap affine permutations of that
    array — K× fewer md5 evaluations than hashing per-permutation
    (md5 dominates; together with staged shingling this is the
    difference between ~48 s and ~4 s for the LSH pipeline at sf0.1)."""
    hashed = shingled_docs(documents, n_shingle).selectExpr(
        "doc_id",
        "shingles",
        f"transform(shingles, s -> {h64_sql('s', 'spark')}) AS hashes",
    )
    sig_cols = [
        f"array_min(transform(hashes, h -> {minhash_perm_sql('h', j)})) AS sig{j}"
        for j in range(MINHASH_K)
    ]
    return hashed.selectExpr(
        "doc_id", "shingles", "size(shingles) AS n_shingles", *sig_cols
    )


def _band_struct(k: int) -> F.Column:
    key = F.concat_ws("-", *[F.col(f"sig{k * LSH_ROWS + r}") for r in range(LSH_ROWS)])
    return F.struct(F.lit(k).alias("band"), key.alias("key"))


#: Buckets above this size route through the distributed self-join
#: fallback instead of single-task array expansion (see _bucket_pairs).
LSH_MAX_BUCKET = 1024


def _bucket_pairs(
    keyed: DataFrame, key_cols: list[str], max_bucket: int = LSH_MAX_BUCKET
) -> DataFrame:
    """Distinct (da, db) pairs of doc_ids sharing a bucket key.

    groupBy + in-bucket pair expansion instead of a bucket self-join:
    the self-join evaluates the (expensive, scan-side) bucket keys on
    BOTH sides; this shape computes them once and shuffles once.

    Hot-bucket guard: the array expansion materializes O(|bucket|²)
    pairs in ONE task, which is fine for near-dup buckets (small by
    construction) but unbounded on an adversarial corpus that is mostly
    one duplicate cluster.  Buckets larger than ``max_bucket`` therefore
    fall back to an exploded self-join on the bucket key — the SAME pair
    set (union of both branches is exactly all in-bucket pairs, so the
    oracle is unchanged), but the quadratic expansion is distributed
    across shuffle partitions instead of one task.  Residual bound: the
    collect_list buffer itself is O(|bucket|·8 B) in one agg group
    (1 M ids ≈ 8 MB) — linear, and the price of evaluating bucket keys
    once; the quadratic part is what the guard moves off a single task.
    """
    buckets = (
        keyed.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
        # referenced by both branches — don't recompute the (expensive,
        # scan-side) bucket keys per branch
        .localCheckpoint(eager=False)
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS da, y AS db))))"
    )
    small = (
        buckets.where(F.size("ids") <= max_bucket)
        .selectExpr(f"explode({pair_expr}) AS p")
        .select(F.col("p.da").alias("da"), F.col("p.db").alias("db"))
    )
    hot = (
        buckets.where(F.size("ids") > max_bucket)
        .selectExpr(*key_cols, "explode(ids) AS id")
    )
    big = (
        hot.alias("ha")
        .join(hot.alias("hb"), key_cols)
        .where(F.col("ha.id") < F.col("hb.id"))
        .select(F.col("ha.id").alias("da"), F.col("hb.id").alias("db"))
    )
    return small.unionByName(big).distinct()


def minhash_lsh_pairs(
    documents: DataFrame, threshold: float = 0.5, n_shingle: int = 3
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact
    shingle-set Jaccard ≥ threshold.  Output (doc_a, doc_b, jaccard)."""
    # lazy checkpoint: the signature projection (shingles + K permutation
    # mins) is re-referenced by the band explosion AND both sides of the
    # exact-jaccard verification join — compute it once, not per branch
    sigs = minhash_signatures(documents, n_shingle).localCheckpoint(eager=False)
    bands = sigs.select(
        # explode_outer: plain explode makes Catalyst infer size()>0 /
        # isnotnull predicates on the array and push them below the
        # projections with the scan-side expressions fully inlined —
        # re-evaluating the md5/shingle pipeline per row in a Filter
        # (measured 6×+ slower).  The band array is a non-empty literal,
        # so outer is semantically identical.
        "doc_id", F.explode_outer(F.array(*[_band_struct(k) for k in range(LSH_BANDS)])).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = _bucket_pairs(bands, ["band", "key"])
    sets = sigs.select("doc_id", "shingles", "n_shingles")
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    joined = (
        cand.join(sa, F.col("da") == F.col("sa.doc_id"))
        .join(sb, F.col("db") == F.col("sb.doc_id"))
        .select(
            F.col("da"),
            F.col("db"),
            F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles"))).alias("common"),
            F.col("sa.n_shingles").alias("na"),
            F.col("sb.n_shingles").alias("nb"),
        )
    )
    jac = F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        joined.where(jac >= threshold)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def minhash_lsh_pairs_oracle(
    threshold: float = 0.5, n_shingle: int = 3, table: str = "documents"
) -> str:
    """DuckDB oracle reproducing minhash_lsh_pairs bit-for-bit."""
    sh = _shingle_expr("duckdb", n=n_shingle)
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(hs, h -> {minhash_perm_sql('h', j)})) AS sig{j}"
        for j in range(MINHASH_K)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {k} AS band, {key} AS key FROM sigs".format(
            k=k,
            key=" || '-' || ".join(
                f"CAST(sig{k * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
            ),
        )
        for k in range(LSH_BANDS)
    )
    return f"""WITH sh AS (
  SELECT doc_id, {sh} AS s FROM {table}
), sh2 AS (
  SELECT doc_id, s, len(s) AS n FROM sh WHERE len(s) > 0
), hashed AS (
  SELECT doc_id, s, n, list_transform(s, s_ -> {h64_sql("s_", "duckdb")}) AS hs FROM sh2
), sigs AS (
  SELECT doc_id, s, n,
    {sig_exprs}
  FROM hashed
), bands AS (
  {band_selects}
), cand AS (
  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
), verified AS (
  SELECT c.da, c.db,
         len(list_intersect(sa.s, sb.s)) AS common, sa.n AS na, sb.n AS nb
  FROM cand c
  JOIN sh2 sa ON sa.doc_id = c.da
  JOIN sh2 sb ON sb.doc_id = c.db
)
SELECT da AS doc_a, db AS doc_b,
       round(CAST(common AS DOUBLE) / (na + nb - common), 6) AS jaccard
FROM verified
WHERE CAST(common AS DOUBLE) / (na + nb - common) >= {threshold}"""


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------


def _simhash_expr_spark(text: str = "text") -> str:
    """60-bit SimHash as one per-row fold: token hashes → per-bit ±1 sums
    (aggregate + zip_with, all codegen'd) → sign bits packed into a BIGINT."""
    toks = tokens_sql(text, "spark")
    hashes = f"transform({toks}, t -> {h64_sql('t', 'spark')})"
    bitsums = (
        f"aggregate({hashes}, array_repeat(cast(0 as bigint), {SIMHASH_BITS}), "
        f"(acc, h) -> zip_with(acc, sequence(0, {SIMHASH_BITS - 1}), "
        f"(a, b) -> a + if((shiftright(h, b) & 1) = 1, 1, -1)))"
    )
    return (
        f"aggregate(zip_with({bitsums}, sequence(0, {SIMHASH_BITS - 1}), "
        f"(s, b) -> if(s > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint))), "
        f"cast(0 as bigint), (x, y) -> x + y)"
    )


def simhash_table(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT) — embarrassingly parallel per row; one
    ``fan_out`` shuffle of the raw docs so the 60-bit × per-token fold
    uses every core instead of the scan's split count."""
    return fan_out(documents).selectExpr("doc_id", f"{_simhash_expr_spark()} AS simhash")


def simhash_table_oracle() -> str:
    """DuckDB mirror via unnest + per-bit group (same values, different
    shape — set semantics make the ±1 sums order-independent)."""
    toks = tokens_sql("text", "duckdb")
    h = h64_sql("tok", "duckdb")
    return f"""WITH t AS (
  SELECT doc_id, unnest({toks}) AS tok FROM documents
), th AS (
  SELECT doc_id, {h} AS h FROM t
), bits AS (
  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, (SELECT unnest(range(0, {SIMHASH_BITS})) AS b) bb
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id"""


def _simhash_bands(max_hamming: int, bits: int = SIMHASH_BITS) -> list[tuple[int, int]]:
    """(lo_bit, width) for r+1 disjoint bands covering all bits.

    Pigeonhole: hamming(a, b) ≤ r ⇒ the ≤ r differing bits miss at least
    one of the r+1 bands, so a and b are bit-identical on that band —
    the band equi-join is a LOSSLESS candidate prefilter.
    """
    n_bands = max_hamming + 1
    width = -(-bits // n_bands)  # ceil
    bands = []
    lo = 0
    while lo < bits:
        bands.append((lo, min(width, bits - lo)))
        lo += width
    return bands


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ r.

    Scale shape: candidates come from an EQUI-join on (band_idx, band
    value) over r+1 pigeonhole bands — never an all-pairs cross join.
    Fan-out is r+1 tiny rows per doc; only colliding pairs reach the
    exact ``bit_count(xor)`` verification.  Lossless (see
    ``_simhash_bands``), so the all-pairs DuckDB oracle matches exactly.
    """
    s = simhash_table(documents)
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.expr(f"(simhash >> {lo}) & {(1 << w) - 1}").alias("val"),
        )
        for i, (lo, w) in enumerate(_simhash_bands(max_hamming))
    ]
    # carry the simhash through the bucket shuffle (8 bytes/row) so the
    # per-row fold is computed ONCE and no verification join is needed
    bands = s.select(
        # explode_outer: see minhash_lsh_pairs — avoids inferred-predicate
        # pushdown re-evaluating the simhash fold inside a Filter
        "doc_id", "simhash", F.explode_outer(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.val").alias("val"))
    buckets = (
        bands.groupBy("band", "val")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x.doc_id AS da, y.doc_id AS db, "
        "cast(bit_count(x.simhash ^ y.simhash) AS int) AS hamming))))"
    )
    return (
        buckets.selectExpr(f"explode({pair_expr}) AS p")
        .where(F.col("p.hamming") <= max_hamming)
        .select(
            F.col("p.da").alias("doc_a"),
            F.col("p.db").alias("doc_b"),
            F.col("p.hamming").alias("hamming"),
        )
        .distinct()
    )


def simhash_near_pairs_oracle(max_hamming: int = 3) -> str:
    return f"""WITH sim AS ({simhash_table_oracle()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


# --------------------------------------------------------------------------
# n-gram jaccard (exact, inverted index)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.5, n_shingle: int = 3
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via an inverted index: explode
    distinct shingles → group postings per shingle → expand in-posting
    pairs → per-pair common counts → filter.

    The posting-list pair expansion is the same single-pass groupBy
    shape as ``_bucket_pairs`` (shingles computed ONCE, one shuffle) —
    a posting self-join would evaluate the shingle pipeline on both
    sides.  Exact but quadratic in posting-list length by nature; the
    LSH path is the scale path.  AQE splits hot-shingle partitions."""
    sh = shingled_docs(documents, n_shingle).withColumnRenamed("shingles", "s")
    sized = sh.select("doc_id", F.size("s").alias("n"), "s")
    # explode_outer: s is non-empty by construction (shingled_docs);
    # plain explode would push an inlined size(shingles)>0 filter to the
    # scan, re-tokenizing per row (see minhash_lsh_pairs comment)
    postings = sized.select("doc_id", "n", F.explode_outer("s").alias("g"))
    buckets = (
        postings.groupBy("g")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x.doc_id AS da, y.doc_id AS db, x.n AS na, y.n AS nb))))"
    )
    common = (
        buckets.selectExpr(f"explode({pair_expr}) AS p")
        .groupBy(
            F.col("p.da").alias("da"),
            F.col("p.db").alias("db"),
            F.col("p.na").alias("na"),
            F.col("p.nb").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common"))
    return common.where(jac >= threshold).select(
        F.col("da").alias("doc_a"), F.col("db").alias("doc_b"), F.round(jac, 6).alias("jaccard")
    )


def ngram_jaccard_pairs_oracle(
    threshold: float = 0.5, n_shingle: int = 3, table: str = "documents"
) -> str:
    sh = _shingle_expr("duckdb", n=n_shingle)
    return f"""WITH sh AS (
  SELECT doc_id, {sh} AS s FROM {table}
), sized AS (
  SELECT doc_id, len(s) AS n, s FROM sh WHERE len(s) > 0
), postings AS (
  SELECT doc_id, n, unnest(s) AS g FROM sized
), pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db, a.n AS na, b.n AS nb, COUNT(*) AS common
  FROM postings a JOIN postings b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT da AS doc_a, db AS doc_b,
       round(CAST(common AS DOUBLE) / (na + nb - common), 6) AS jaccard
FROM pairs
WHERE CAST(common AS DOUBLE) / (na + nb - common) >= {threshold}"""


def ngram_jaccard_pairs_prefix(
    documents: DataFrame, threshold: float = 0.5, n_shingle: int = 3
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via PREFIX FILTERING (the
    PPJoin/All-Pairs family, Xiao et al. WWW'08 / Bayardo et al.
    WWW'07) — same answer as :func:`ngram_jaccard_pairs`, registered
    under the SAME DuckDB oracle, but candidate generation only indexes
    each doc's ``n - ceil(t*n) + 1`` RAREST shingles instead of all of
    them.

    Soundness: order shingles by a global total order (document
    frequency ascending, then lexicographic).  Any pair with
    ``J(A,B) >= t`` has overlap ``>= ceil(t*(na+nb)/(1+t))``, which for
    any size-compatible pair (``t*max <= min``) is ``>= ceil(t*na)``
    and ``>= ceil(t*nb)`` — so by the prefix-filtering lemma the two
    prefixes must share a shingle.  Candidates are verified with the
    exact set intersection; a lossy prefix would hash-mismatch the
    oracle.

    100 TB shape vs the inverted-index baseline: the baseline expands
    pairs inside EVERY posting list (quadratic in posting length — the
    stopword-shingle lists are exactly the long ones); this expands
    only prefix postings, and rarity ordering puts precisely the
    stopword shingles OUTSIDE every prefix.  Costs one extra
    aggregation (document frequencies) and a per-doc top-(p) window;
    both shuffle bounded (|distinct shingles| and |docs| rows).  The
    compact per-doc projection is lazily checkpointed once and reused
    by candidate generation and both verify sides (the
    ``minhash_lsh_pairs`` pattern)."""
    from pyspark.sql import Window

    sh = (
        shingled_docs(documents, n_shingle)
        .select("doc_id", "shingles", F.size("shingles").alias("n"))
        .localCheckpoint(eager=False)
    )
    postings = sh.select("doc_id", "n", F.explode_outer("shingles").alias("g"))
    df = postings.groupBy("g").agg(F.count("*").alias("df"))
    p_len = (F.col("n") - F.ceil(F.col("n") * F.lit(threshold)) + 1).cast("int")
    w = Window.partitionBy("doc_id").orderBy("df", "g")
    prefix = (
        postings.join(df, "g")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= p_len)
        .select("doc_id", "n", "g")
    )
    buckets = (
        prefix.groupBy("g")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x.doc_id AS da, y.doc_id AS db, x.n AS na, y.n AS nb))))"
    )
    cand = (
        buckets.selectExpr(f"explode({pair_expr}) AS p")
        # size-compatibility prune: J <= min/max < t is impossible
        .where(
            F.greatest(F.col("p.na"), F.col("p.nb")) * threshold
            <= F.least(F.col("p.na"), F.col("p.nb"))
        )
        .select(F.col("p.da").alias("da"), F.col("p.db").alias("db"))
        .distinct()
    )
    sa = sh.select(
        F.col("doc_id").alias("ida"), F.col("shingles").alias("sa"), F.col("n").alias("na")
    )
    sb = sh.select(
        F.col("doc_id").alias("idb"), F.col("shingles").alias("sb"), F.col("n").alias("nb")
    )
    joined = (
        cand.join(sa, F.col("da") == F.col("ida"))
        .join(sb, F.col("db") == F.col("idb"))
        .select(
            "da",
            "db",
            F.size(F.array_intersect("sa", "sb")).alias("common"),
            "na",
            "nb",
        )
        # BARRIER (round-11, guide §4.4's duplicated-expression trap in
        # its pure-SQL form): without it the jaccard >= t filter below is
        # pushed INTO the second join's condition, substituting `common`
        # with its defining expression — array_intersect over the full
        # shingle arrays then runs ~3x per candidate pair inside the
        # non-codegen join-condition evaluator (measured: 8.2 s warm for
        # the whole query vs 2.3 s with the barrier).  The checkpointed
        # frame is the bounded (da, db, common, na, nb) candidate table —
        # |candidates| skinny rows, the same thing the verify step must
        # materialize anyway.
        .localCheckpoint(eager=False)
    )
    jac = F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common"))
    return joined.where(jac >= threshold).select(
        F.col("da").alias("doc_a"),
        F.col("db").alias("doc_b"),
        F.round(jac, 6).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: LSH pairs → connected components → cluster summary


def neardup_clusters(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """The full near-dedup pipeline shape: MinHash-LSH candidate pairs
    (equi-join candidate generation) fed as an edge list into hash-min
    connected components (operators/graph_iter), summarized per cluster
    — (cluster, n_docs, min_doc, max_doc).  ``min_doc`` is the
    canonical survivor a keep-one policy would retain; singleton docs
    (no near-dup) are absent by construction.

    This is operator COMPOSITION, not a new operator: the same CC
    pass that clusters followers clusters duplicate documents — the
    edge-table abstraction doing its job.
    """
    from twitter_followers_patterns_mapreduce_spark.operators.graph_iter import (
        connected_components,
    )

    pairs = minhash_lsh_pairs(documents, threshold=threshold)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(edges)
    return comp.groupBy(F.col("comp").alias("cluster")).agg(
        F.count("*").alias("n_docs"),
        F.min("id").alias("min_doc"),
        F.max("id").alias("max_doc"),
    )


def neardup_clusters_oracle(threshold: float = 0.5) -> str:
    """Recursive-closure oracle over the LSH pair query (embedded as a
    derived table — it is itself a WITH query)."""
    pairs = minhash_lsh_pairs_oracle(threshold=threshold)
    return f"""WITH RECURSIVE und AS (
  SELECT doc_a AS a, doc_b AS b FROM ({pairs})
  UNION
  SELECT doc_b AS a, doc_a AS b FROM ({pairs})
), walk(id, r) AS (
  SELECT a, a FROM und
  UNION
  SELECT w.id, u.b FROM walk w JOIN und u ON w.r = u.a
), labels AS (
  SELECT id, MIN(r) AS comp FROM walk GROUP BY id
)
SELECT comp AS cluster, COUNT(*) AS n_docs, MIN(id) AS min_doc, MAX(id) AS max_doc
FROM labels GROUP BY comp"""


# --------------------------------------------------------------------------
# incremental (batch-vs-corpus) dedup
# --------------------------------------------------------------------------

def dedup_incremental(documents: DataFrame, threshold: float = 0.5,
                      n_shingle: int = 3,
                      new_predicate: F.Column | None = None) -> DataFrame:
    """Ingestion-time dedup: admit a NEW batch against the EXISTING
    corpus.  ``new_predicate`` marks the new side; the default is the
    harness split (odd ``doc_id`` = new, even = existing) — real
    ingestion (streaming/dedup.py::ingest_dedup_foreach_batch) passes
    its own tag column.  Returns one row per new doc —
    (doc_id, status, near_dup_of, jaccard) with status ∈ exact_dup >
    near_dup > kept and the best match chosen deterministically
    (max 6dp jaccard, min corpus id).

    Shapes that matter at 100 TB: the exact check is a semi-join on a
    scan-side md5; near-dup candidates come from an EQUI-join of the
    new batch's LSH band keys against the corpus's (band, key) — the
    natural bucket/partition key of a persisted corpus index, so
    admission touches only colliding buckets, never the whole corpus.
    Signatures are computed once over the union and split after."""
    is_new = (
        new_predicate
        if new_predicate is not None
        else F.pmod(F.col("doc_id"), F.lit(2)) == 1
    )
    new_docs = documents.where(is_new)

    # exact: md5(text) already present in the corpus
    old_hashes = documents.where(~is_new).select(F.md5("text").alias("h")).distinct()
    exact = (
        new_docs.select("doc_id", F.md5("text").alias("h"))
        .join(old_hashes, "h", "left_semi")
        .select("doc_id", F.lit(True).alias("is_exact"))
    )

    # near: new bands ⋈ corpus bands on (band, key), verify exact jaccard
    # lazy checkpoint: the signature projection (shingles + K permutation
    # mins) is re-referenced by the band explosion AND both sides of the
    # exact-jaccard verification join — compute it once, not per branch
    sigs = minhash_signatures(documents, n_shingle).localCheckpoint(eager=False)
    bands = sigs.select(
        "doc_id",
        F.explode_outer(F.array(*[_band_struct(k) for k in range(LSH_BANDS)])).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # membership routed through a doc_id-keyed semi-join: the signature
    # projection drops any caller-supplied tag column, so evaluating an
    # arbitrary new_predicate directly on `bands` would only work for
    # pure doc_id functions (the harness parity split).  The tag frame
    # is (id, bool)-narrow and broadcasts at batch scale.
    tag = documents.select("doc_id", is_new.alias("_isnew"))
    nb = bands.join(tag.where(F.col("_isnew")), "doc_id", "left_semi").select(
        F.col("doc_id").alias("new_id"), "band", "key"
    )
    ob = bands.join(tag.where(~F.col("_isnew")), "doc_id", "left_semi").select(
        F.col("doc_id").alias("old_id"), "band", "key"
    )
    cand = nb.join(ob, ["band", "key"]).select("new_id", "old_id").distinct()
    sets = sigs.select("doc_id", "shingles", "n_shingles")
    verified = (
        cand.join(sets.alias("sa"), F.col("new_id") == F.col("sa.doc_id"))
        .join(sets.alias("sb"), F.col("old_id") == F.col("sb.doc_id"))
        .select(
            "new_id",
            "old_id",
            F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles"))).alias("common"),
            F.col("sa.n_shingles").alias("na"),
            F.col("sb.n_shingles").alias("nb"),
        )
    )
    jac = F.round(
        F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common")), 6
    )
    from pyspark.sql import Window

    w = Window.partitionBy("new_id").orderBy(F.desc("jaccard"), F.asc("old_id"))
    best = (
        verified.select("new_id", "old_id", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return (
        new_docs.select("doc_id")
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
            F.when(~F.coalesce(F.col("is_exact"), F.lit(False)), F.col("old_id"))
            .alias("near_dup_of"),
            F.when(~F.coalesce(F.col("is_exact"), F.lit(False)), F.col("jaccard"))
            .alias("jaccard"),
        )
    )


def dedup_incremental_oracle(threshold: float = 0.5, n_shingle: int = 3) -> str:
    """DuckDB mirror: same split, same band join, same best-match rule."""
    sh = _shingle_expr("duckdb", n=n_shingle)
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(hs, h -> {minhash_perm_sql('h', j)})) AS sig{j}"
        for j in range(MINHASH_K)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {k} AS band, {key} AS key FROM sigs".format(
            k=k,
            key=" || '-' || ".join(
                f"CAST(sig{k * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
            ),
        )
        for k in range(LSH_BANDS)
    )
    return f"""WITH sh AS (
  SELECT doc_id, {sh} AS s FROM documents
), sh2 AS (
  SELECT doc_id, s, len(s) AS n FROM sh WHERE len(s) > 0
), hashed AS (
  SELECT doc_id, s, n, list_transform(s, s_ -> {h64_sql("s_", "duckdb")}) AS hs FROM sh2
), sigs AS (
  SELECT doc_id, s, n,
    {sig_exprs}
  FROM hashed
), bands AS (
  {band_selects}
), exact AS (
  SELECT DISTINCT n.doc_id FROM documents n
  WHERE n.doc_id % 2 = 1
    AND md5(n.text) IN (SELECT md5(text) FROM documents WHERE doc_id % 2 = 0)
), cand AS (
  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
  WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 0
), verified AS (
  SELECT c.new_id, c.old_id,
         round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
               / (sa.n + sb.n - len(list_intersect(sa.s, sb.s))), 6) AS jaccard
  FROM cand c
  JOIN sh2 sa ON sa.doc_id = c.new_id
  JOIN sh2 sb ON sb.doc_id = c.old_id
), best AS (
  SELECT new_id, old_id, jaccard FROM (
    SELECT new_id, old_id, jaccard,
           row_number() OVER (PARTITION BY new_id
                              ORDER BY jaccard DESC, old_id ASC) AS rn
    FROM verified WHERE jaccard >= {threshold}
  ) WHERE rn = 1
)
SELECT n.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN b.old_id IS NOT NULL THEN 'near_dup'
            ELSE 'kept' END AS status,
       CASE WHEN e.doc_id IS NULL THEN b.old_id END AS near_dup_of,
       CASE WHEN e.doc_id IS NULL THEN b.jaccard END AS jaccard
FROM documents n
LEFT JOIN exact e ON n.doc_id = e.doc_id
LEFT JOIN best b ON n.doc_id = b.new_id
WHERE n.doc_id % 2 = 1"""


def _staged_admission_with(
    n_stages: int = 4, threshold: float = 0.5, n_shingle: int = 3
) -> str:
    """The shared WITH-body of the staged-admission oracles: unrolls
    the greedy keep-only-admitted recursion into one CTE per stage,
    ending at ``best`` (the per-doc winning near-dup match).  Callers
    append their own extra CTEs / final SELECT —
    ``dedup_incremental_staged_oracle`` reads the verdict columns,
    ``dedup_admission_novelty_staged_oracle`` adds the train-shingle
    overlap over the same admitted sets."""
    sh = _shingle_expr("duckdb", n=n_shingle)
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(hs, h -> {minhash_perm_sql('h', j)})) AS sig{j}"
        for j in range(MINHASH_K)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {k} AS band, {key} AS key FROM sigs".format(
            k=k,
            key=" || '-' || ".join(
                f"CAST(sig{k * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
            ),
        )
        for k in range(LSH_BANDS)
    )
    adm_ctes = []
    for s in range(n_stages):
        if s == 0:
            avail = "e.old_even"
            avail_m = "m.old_even"
        else:
            prev = " UNION ALL ".join(
                f"SELECT doc_id FROM adm{j}" for j in range(s)
            )
            avail = f"(e.old_even OR e.old_id IN ({prev}))"
            avail_m = f"(m.old_even OR m.old_id IN ({prev}))"
        adm_ctes.append(
            f"""adm{s} AS (
  SELECT d.doc_id FROM docs d WHERE d.par = 1 AND d.stg = {s}
    AND NOT EXISTS (SELECT 1 FROM exact_pairs e
                    WHERE e.new_id = d.doc_id AND {avail})
    AND NOT EXISTS (SELECT 1 FROM mtch m
                    WHERE m.new_id = d.doc_id AND {avail_m})
)"""
        )
    adm_all = " UNION ALL ".join(f"SELECT doc_id FROM adm{s}" for s in range(n_stages))
    return f"""WITH sh AS (
  SELECT doc_id, {sh} AS s FROM documents
), sh2 AS (
  SELECT doc_id, s, len(s) AS n FROM sh WHERE len(s) > 0
), hashed AS (
  SELECT doc_id, s, n, list_transform(s, s_ -> {h64_sql("s_", "duckdb")}) AS hs FROM sh2
), sigs AS (
  SELECT doc_id, s, n,
    {sig_exprs}
  FROM hashed
), bands AS (
  {band_selects}
), docs AS (
  SELECT doc_id, md5(text) AS h, (doc_id // 2) % {n_stages} AS stg,
         doc_id % 2 AS par
  FROM documents
), exact_pairs AS (
  SELECT dn.doc_id AS new_id, dold.doc_id AS old_id, dold.par = 0 AS old_even
  FROM docs dn JOIN docs dold
    ON dn.h = dold.h AND dn.doc_id <> dold.doc_id
  WHERE dn.par = 1 AND (dold.par = 0 OR dold.stg < dn.stg)
), cand AS (
  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
  JOIN docs dn ON dn.doc_id = x.doc_id
  JOIN docs dold ON dold.doc_id = y.doc_id
  WHERE dn.par = 1 AND x.doc_id <> y.doc_id
    AND (dold.par = 0 OR dold.stg < dn.stg)
), verified AS (
  SELECT c.new_id, c.old_id,
         round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
               / (sa.n + sb.n - len(list_intersect(sa.s, sb.s))), 6) AS jaccard
  FROM cand c
  JOIN sh2 sa ON sa.doc_id = c.new_id
  JOIN sh2 sb ON sb.doc_id = c.old_id
), mtch AS (
  SELECT v.new_id, v.old_id, v.jaccard, dold.par = 0 AS old_even
  FROM verified v JOIN docs dold ON dold.doc_id = v.old_id
  WHERE v.jaccard >= {threshold}
), {", ".join(adm_ctes)}, adm_all AS (
  {adm_all}
), avail_exact AS (
  SELECT DISTINCT e.new_id FROM exact_pairs e
  WHERE e.old_even OR e.old_id IN (SELECT doc_id FROM adm_all)
), avail_match AS (
  SELECT m.new_id, m.old_id, m.jaccard FROM mtch m
  WHERE m.old_even OR m.old_id IN (SELECT doc_id FROM adm_all)
), best AS (
  SELECT new_id, old_id, jaccard FROM (
    SELECT new_id, old_id, jaccard,
           row_number() OVER (PARTITION BY new_id
                              ORDER BY jaccard DESC, old_id ASC) AS rn
    FROM avail_match
  ) WHERE rn = 1
)"""


def dedup_incremental_staged_oracle(
    n_stages: int = 4, threshold: float = 0.5, n_shingle: int = 3
) -> str:
    """DuckDB mirror of STREAMED admission (streaming/dedup_admit.py):
    odd docs arrive in ``n_stages`` micro-batches (stage =
    ``(doc_id // 2) % n_stages``), each judged against evens ∪ odds
    ADMITTED in earlier stages; only kept docs join the corpus.  The
    greedy recursion unrolls into one chained CTE per stage — exact for
    any fixed batch count, which is precisely what the deterministic
    staging gives us.  Same band join, same best-match rule
    (max 6dp jaccard, min corpus id) as ``dedup_incremental_oracle``."""
    body = _staged_admission_with(n_stages, threshold, n_shingle)
    return f"""{body}
SELECT d.doc_id,
       CASE WHEN ae.new_id IS NOT NULL THEN 'exact_dup'
            WHEN b.old_id IS NOT NULL THEN 'near_dup'
            ELSE 'kept' END AS status,
       CASE WHEN ae.new_id IS NULL THEN b.old_id END AS near_dup_of,
       CASE WHEN ae.new_id IS NULL THEN b.jaccard END AS jaccard
FROM docs d
LEFT JOIN avail_exact ae ON d.doc_id = ae.new_id
LEFT JOIN best b ON d.doc_id = b.new_id
WHERE d.par = 1
ORDER BY d.doc_id"""


def dedup_admission_novelty_staged_oracle(
    n_stages: int = 4, threshold: float = 0.5, n_shingle: int = 3
) -> str:
    """DuckDB mirror of the ONE-PASS streamed ingest gate
    (streaming/dedup_admit.py): every arriving doc gets its admission
    verdict AND its train-shingle contamination against the corpus as
    of the previous batch — train = shingles of the bootstrap evens ∪
    odds ADMITTED in earlier stages (rejected docs contribute nothing,
    exactly like the band index).  ``n_seen`` counts the doc's distinct
    shingles already present in that train set; ``novelty`` is the
    complementary fraction (NULL for docs too short to shingle — no
    shingle evidence either way).  The staged recursion is the same
    ``_staged_admission_with`` unroll the dedup verdict gate uses."""
    body = _staged_admission_with(n_stages, threshold, n_shingle)
    seen_ctes = []
    for s in range(n_stages):
        if s == 0:
            train = "dy.par = 0"
        else:
            prev = " UNION ALL ".join(f"SELECT doc_id FROM adm{j}" for j in range(s))
            train = f"(dy.par = 0 OR dy.doc_id IN ({prev}))"
        seen_ctes.append(
            f"""seen{s} AS (
  SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS n_seen
  FROM exploded x JOIN docs d ON d.doc_id = x.doc_id
  WHERE d.par = 1 AND d.stg = {s} AND x.sh IN (
    SELECT y.sh FROM exploded y JOIN docs dy ON dy.doc_id = y.doc_id
    WHERE {train})
  GROUP BY x.doc_id
)"""
        )
    seen_all = " UNION ALL ".join(
        f"SELECT * FROM seen{s}" for s in range(n_stages)
    )
    return f"""{body}, exploded AS (
  SELECT h.doc_id, unnest(h.hs) AS sh FROM hashed h
), {", ".join(seen_ctes)}, seen_all AS (
  {seen_all}
)
SELECT d.doc_id,
       CASE WHEN ae.new_id IS NOT NULL THEN 'exact_dup'
            WHEN b.old_id IS NOT NULL THEN 'near_dup'
            ELSE 'kept' END AS status,
       CAST(COALESCE(sh2.n, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(sa.n_seen, 0) AS BIGINT) AS n_seen,
       CASE WHEN COALESCE(sh2.n, 0) > 0 THEN
         floor((sh2.n - COALESCE(sa.n_seen, 0)) / CAST(sh2.n AS DOUBLE)
               * 1000000) / 1000000 END AS novelty
FROM docs d
LEFT JOIN sh2 ON sh2.doc_id = d.doc_id
LEFT JOIN seen_all sa ON sa.doc_id = d.doc_id
LEFT JOIN avail_exact ae ON d.doc_id = ae.new_id
LEFT JOIN best b ON d.doc_id = b.new_id
WHERE d.par = 1
ORDER BY d.doc_id"""


def containment_pairs(
    documents: DataFrame, threshold: float = 0.6, n_shingle: int = 3
) -> DataFrame:
    """Asymmetric containment near-dup: ``|A∩B| / min(|A|, |B|)`` over
    distinct n-gram shingle sets — the doc-INSIDE-doc detector.  A short
    document quoted wholesale inside a long one scores ~1.0 here while
    symmetric Jaccard (``ngram_jaccard_pairs``) divides by the union and
    stays low; training corpora dedup on BOTH signals (quote-inclusion
    and wrapper pages are containment cases, not Jaccard cases).

    Same inverted-index plan as :func:`ngram_jaccard_pairs` (postings
    grouped per shingle, in-posting pair expansion, one shuffle);
    ``contained_doc`` names the smaller side so downstream keep/drop
    policies know which doc is the subset.  Exact but quadratic in
    posting-list length — the LSH bands remain the candidate-generation
    scale path, with this as the verifier on candidates only.
    """
    sh = shingled_docs(documents, n_shingle).withColumnRenamed("shingles", "s")
    sized = sh.select("doc_id", F.size("s").alias("n"), "s")
    postings = sized.select("doc_id", "n", F.explode_outer("s").alias("g"))
    buckets = (
        postings.groupBy("g")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n"))).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pair_expr = (
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x.doc_id AS da, y.doc_id AS db, x.n AS na, y.n AS nb))))"
    )
    common = (
        buckets.selectExpr(f"explode({pair_expr}) AS p")
        .groupBy(
            F.col("p.da").alias("da"),
            F.col("p.db").alias("db"),
            F.col("p.na").alias("na"),
            F.col("p.nb").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    cont = F.col("common").cast("double") / F.least(F.col("na"), F.col("nb"))
    return common.where(cont >= threshold).select(
        F.col("da").alias("doc_a"),
        F.col("db").alias("doc_b"),
        F.col("common").alias("n_common"),
        F.when(F.col("na") <= F.col("nb"), F.col("da")).otherwise(F.col("db")).alias(
            "contained_doc"
        ),
        F.round(cont, 6).alias("containment"),
    )


def containment_pairs_oracle(threshold: float = 0.6, n_shingle: int = 3) -> str:
    sh = _shingle_expr("duckdb", n=n_shingle)
    return f"""WITH sh AS (
  SELECT doc_id, {sh} AS s FROM documents
), sized AS (
  SELECT doc_id, len(s) AS n, s FROM sh WHERE len(s) > 0
), postings AS (
  SELECT doc_id, n, unnest(s) AS g FROM sized
), pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db, a.n AS na, b.n AS nb, COUNT(*) AS common
  FROM postings a JOIN postings b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT da AS doc_a, db AS doc_b,
       common AS n_common,
       CASE WHEN na <= nb THEN da ELSE db END AS contained_doc,
       round(CAST(common AS DOUBLE) / least(na, nb), 6) AS containment
FROM pairs
WHERE CAST(common AS DOUBLE) / least(na, nb) >= {threshold}"""


# --------------------------------------------------------------------------
# FastSS fuzzy string match (edit distance <= 1 via deletion signatures)
# --------------------------------------------------------------------------


def _deletion_variants_sql(col: str) -> str:
    """Spark SQL array of FastSS signatures for ``col``: the string
    itself (i=0) plus every single-character deletion (i=1..len).
    Pure codegen array expression — signatures are computed scan-side,
    no UDF, no shuffle."""
    return (
        f"transform(sequence(0, length({col})), i -> "
        f"CASE WHEN i = 0 THEN {col} "
        f"ELSE concat(substring({col}, 1, i - 1), "
        f"substring({col}, i + 1, length({col}))) END)"
    )


def fuzzy_match_fastss(part: DataFrame, probe_mod: int = 10) -> DataFrame:
    """Entity resolution by bounded edit distance: match a typo'd probe
    set against the distinct name catalog with Levenshtein distance
    ≤ 1, candidates from FastSS deletion signatures (Bocek et al. 2007
    / SymSpell): two strings within edit distance 1 always share a
    signature in {s} ∪ {s minus one char} — substitution at i deletes
    to the same string from both sides; insert/delete makes the shorter
    string itself a signature of the longer.  Sharing a signature only
    bounds the distance by 2, so candidates are verified with the exact
    ``levenshtein`` — the DuckDB oracle is the BRUTE-FORCE cross join,
    which also proves the blocking lossless on every run.

    Probes are derived deterministically (delete the char at position
    ``p_partkey % length`` from the part's own name, keys ≡ 0 mod
    ``probe_mod``) so both engines see identical inputs.

    100 TB shape: |s|+1 signatures per string explode scan-side; the
    candidate join is a plain equi-join on the signature (never
    all-pairs); verification touches only colliding (probe, name)
    pairs.  Signature skew (common short names) is an AQE skew-join
    case; the verify is codegen ``levenshtein``, JVM-side.
    """
    names = part.select("p_name").distinct()
    pos = F.col("p_partkey") % F.length("p_name") + F.lit(1)
    probes = (
        part.where(F.col("p_partkey") % probe_mod == 0)
        .select(
            F.col("p_partkey").alias("probe_id"),
            F.concat(
                F.expr("substring(p_name, 1, (p_partkey % length(p_name)))"),
                F.expr("substring(p_name, (p_partkey % length(p_name)) + 2, length(p_name))"),
            ).alias("q"),
        )
    )
    probe_sigs = probes.select(
        "probe_id", "q", F.explode(F.expr(_deletion_variants_sql("q"))).alias("sig")
    )
    name_sigs = names.select(
        "p_name", F.explode(F.expr(_deletion_variants_sql("p_name"))).alias("sig")
    )
    candidates = (
        probe_sigs.join(name_sigs, "sig")
        .select("probe_id", "q", "p_name")
        .distinct()
    )
    return (
        candidates.where(F.levenshtein("q", "p_name") <= 1)
        .select(
            "probe_id",
            "q",
            F.col("p_name").alias("name"),
            F.levenshtein("q", "p_name").cast("int").alias("dist"),
        )
    )


def fuzzy_match_fastss_oracle(probe_mod: int = 10) -> str:
    """Brute-force ground truth: every (probe, distinct name) pair
    scored with exact levenshtein — no blocking, so a lossy Spark-side
    candidate filter would hash-mismatch immediately."""
    return f"""WITH names AS (SELECT DISTINCT p_name FROM part),
probes AS (
  SELECT p_partkey AS probe_id,
         concat(substr(p_name, 1, (p_partkey % length(p_name))),
                substr(p_name, (p_partkey % length(p_name)) + 2)) AS q
  FROM part WHERE p_partkey % {probe_mod} = 0)
SELECT probe_id, q, p_name AS name, CAST(levenshtein(q, p_name) AS INT) AS dist
FROM probes, names
WHERE levenshtein(q, p_name) <= 1"""


# --------------------------------------------------------------------------
# Duplicated-span fraction (exact substring dedup metric, Lee et al. 2022)
# --------------------------------------------------------------------------


def _positional_shingle_hashes_spark(toks: str, k: int) -> str:
    """Spark SQL array of h64 hashes of the k-token shingle starting at
    each position 1..len-k+1 (POSITIONAL — duplicates kept, unlike
    ``shingles_sql``'s distinct set; position feeds the interval
    union)."""
    parts = ", ' ', ".join(f"element_at({toks}, i+{j})" for j in range(k))
    return (
        f"CASE WHEN size({toks}) >= {k} THEN "
        f"transform(sequence(1, size({toks})-{k - 1}), "
        f"i -> {h64_sql(f'concat({parts})', 'spark')}) "
        f"ELSE array() END"
    )


def _dup_span_starts(documents: DataFrame, k: int, min_occ: int):
    """Shared front half of the exact-substring family: (compact per-doc
    projection, duplicated k-shingle START positions).  ``toks`` holds
    (doc_id, n_tokens, positional shingle hashes) and is lazily
    checkpointed — both consumers re-reference it on multiple branches."""
    toks = documents.select(
        "doc_id", F.expr(tokens_sql("text", "spark")).alias("toks")
    ).select(
        "doc_id",
        F.expr("size(toks)").cast("long").alias("n_tokens"),
        F.expr(_positional_shingle_hashes_spark("toks", k)).alias("hashes"),
    ).localCheckpoint(eager=False)
    starts = toks.select(
        "doc_id", F.posexplode("hashes").alias("p0", "h")
    ).select("doc_id", (F.col("p0") + 1).alias("start"), "h")
    dup = (
        starts.groupBy("h")
        .agg(F.count("*").alias("n_occ"))
        .where(F.col("n_occ") >= min_occ)
        .select("h")
    )
    return toks, starts.join(dup, "h", "left_semi")


def duplicated_span_fraction(
    documents: DataFrame, k: int = 8, min_occ: int = 2
) -> DataFrame:
    """Per-document fraction of tokens covered by a k-token span that
    occurs ≥ ``min_occ`` times in the whole corpus — the exact-substring
    duplication metric of "Deduplicating Training Data Makes Language
    Models Better" (Lee et al., ACL 2022): near-dup detectors score
    whole documents, this scores the duplicated REGIONS inside them
    (boilerplate, license blocks, quoted passages).

    Plan: tokenize once scan-side; positional k-shingles hash to h64
    BIGINTs inside codegen (8-byte join keys — the contamination-check
    lesson); one hash-agg finds shingles with ≥ min_occ occurrences;
    a semi-join keeps only duplicated START positions.  Coverage is the
    UNION LENGTH of the fixed-length intervals [start, start+k-1]:
    with starts sorted, ends are monotone, so each interval adds
    ``min(k, start - prev_start)`` tokens — one lag window per doc over
    only the duplicated starts.  No all-token spine, no all-pairs;
    everything past the tokenizer is sized by #duplicated starts.

    Returns (doc_id, n_tokens, dup_tokens, dup_frac) for every doc;
    docs with no duplicated span score 0.
    """
    from pyspark.sql import Window

    toks, dup_starts = _dup_span_starts(documents, k, min_occ)
    w = Window.partitionBy("doc_id").orderBy("start")
    per_doc = (
        dup_starts.withColumn("prev", F.lag("start").over(w))
        .select(
            "doc_id",
            F.when(
                F.col("prev").isNull() | (F.col("start") - F.col("prev") >= k),
                F.lit(k),
            )
            .otherwise(F.col("start") - F.col("prev"))
            .alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("long").alias("dup_tokens"))
    )
    return (
        toks.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


def duplicated_span_fraction_oracle(k: int = 8, min_occ: int = 2) -> str:
    toks = tokens_sql("text", "duckdb")
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(k))
    h = h64_sql(f"({parts})", "duckdb")
    return f"""WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks FROM t),
sh AS (
  SELECT doc_id,
         unnest(range(1, greatest(len(toks) - {k - 2}, 1))) AS start,
         unnest(list_transform(range(1, greatest(len(toks) - {k - 2}, 1)),
                               i -> {h})) AS h
  FROM base),
dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) >= {min_occ}),
ds AS (SELECT doc_id, start FROM sh WHERE h IN (SELECT h FROM dup)),
contrib AS (
  SELECT doc_id,
         CASE WHEN prev IS NULL OR start - prev >= {k} THEN {k}
              ELSE start - prev END AS c
  FROM (SELECT doc_id, start,
               lag(start) OVER (PARTITION BY doc_id ORDER BY start) AS prev
        FROM ds)),
per_doc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dup_tokens
            FROM contrib GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
             / CAST(greatest(b.n_tokens, 1) AS DOUBLE), 6) AS dup_frac
FROM base b LEFT JOIN per_doc p ON b.doc_id = p.doc_id"""


def exact_substring_strip(
    documents: DataFrame, k: int = 8, min_occ: int = 2
) -> DataFrame:
    """The TRANSFORM the duplicated-span metric implies: emit each
    document with every corpus-duplicated k-token span REMOVED — the
    ExactSubstr deduplication of Lee et al. (ACL 2022), the step
    between "measure boilerplate" (:func:`duplicated_span_fraction`)
    and training on the corpus.

    Plan keeps token rows OFF the wire: full token arrays are never
    exploded.  The duplicated START positions (same shared front half
    as the metric) fan out ×k into covered positions, collapse to one
    sorted per-doc array (rows ∝ duplicated starts only), and the
    rebuild is a single array-lambda filter over the doc's token array
    — one equi-join of documents against the (sparse) covered table,
    cost ∝ n_tokens × |covered| per doc, both bounded by the
    duplicated-region volume, not the corpus.  Docs with nothing
    duplicated pass through the left join untouched.

    Output (doc_id, n_tokens, n_kept, cleaned) with ``cleaned`` the
    exact remaining text — string-equality-checked by the oracle, so an
    off-by-one in span coverage hash-mismatches."""
    covered = (
        _dup_span_starts(documents, k, min_occ)[1]
        .select("doc_id", F.explode(F.expr(f"sequence(start, start + {k - 1})")).alias("p"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("p")).alias("cov"))
    )
    toks = documents.select(
        "doc_id", F.expr(tokens_sql("text", "spark")).alias("toks")
    )
    return (
        toks.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.expr("filter(toks, (t, i) -> NOT array_contains(coalesce(cov, array()), i + 1))").alias("kept"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("kept").cast("long").alias("n_kept"),
            F.concat_ws(" ", "kept").alias("cleaned"),
        )
    )


def exact_substring_strip_oracle(k: int = 8, min_occ: int = 2) -> str:
    toks = tokens_sql("text", "duckdb")
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(k))
    h = h64_sql(f"({parts})", "duckdb")
    return f"""WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks FROM t),
sh AS (
  SELECT doc_id,
         unnest(range(1, greatest(len(toks) - {k - 2}, 1))) AS start,
         unnest(list_transform(range(1, greatest(len(toks) - {k - 2}, 1)),
                               i -> {h})) AS h
  FROM base),
dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) >= {min_occ}),
cov AS (
  SELECT DISTINCT doc_id, unnest(range(start, start + {k})) AS p
  FROM sh WHERE h IN (SELECT h FROM dup)),
tok_rows AS (
  SELECT doc_id, unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS p
  FROM base),
kept AS (
  SELECT tr.doc_id, tr.tok, tr.p
  FROM tok_rows tr ANTI JOIN cov c ON tr.doc_id = c.doc_id AND tr.p = c.p),
agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS cleaned
  FROM kept GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(a.cleaned, '') AS cleaned
FROM base b LEFT JOIN agg a ON b.doc_id = a.doc_id"""


# --------------------------------------------------------------------------
# LSH recall audit (the dedup-side companion of ann_recall_at_k)
# --------------------------------------------------------------------------

def lsh_recall_audit(
    documents: DataFrame, threshold: float = 0.5, n_shingle: int = 3
) -> DataFrame:
    """Recall of the MinHash-LSH near-dup path against the EXACT
    inverted-index ground truth at the same threshold — the standing
    quality gate for the banding parameters (the dedup twin of
    ``similarity.ann_recall_at_k``).  Both paths verify candidates with
    exact shingle Jaccard, so the LSH output is a SUBSET of the truth
    (precision 1 by construction); the one free number is how many true
    pairs the bands never bucketed together.  Emits a single row
    (n_truth, n_found, n_missed, recall) — floor 6 dp from exact
    integer counts.

    Probability context (documented, not asserted): a true pair at
    j = 0.5 collides in ≥1 of the 8 4-row bands w.p.
    1-(1-j⁴)⁸ ≈ 0.40 at the threshold boundary and →1 rapidly above
    it, so recall is expected high-but-below-1 on threshold-straddling
    corpora; a recall COLLAPSE is the banding-bug signal this query
    exists to catch.

    Plan shape: truth = one posting-list pair expansion; found = the
    banded path; the audit joins the two PAIR sets (tiny relative to
    the corpus) and aggregates — the expensive inputs are each computed
    once.
    """
    truth = ngram_jaccard_pairs(documents, threshold, n_shingle).select(
        "doc_a", "doc_b"
    )
    found = (
        minhash_lsh_pairs(documents, threshold, n_shingle)
        .select("doc_a", "doc_b")
        .withColumn("hit", F.lit(1))
    )
    return (
        truth.join(found, ["doc_a", "doc_b"], "left")
        .agg(
            F.count("*").cast("long").alias("n_truth"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_found"),
        )
        .selectExpr(
            "n_truth",
            "n_found",
            "n_truth - n_found AS n_missed",
            "CASE WHEN n_truth = 0 THEN 1.0 ELSE"
            " floor(CAST(n_found AS DOUBLE) / CAST(n_truth AS DOUBLE) * 1e6) / 1e6"
            " END AS recall",
        )
    )


def lsh_recall_audit_oracle(threshold: float = 0.5, n_shingle: int = 3) -> str:
    truth = ngram_jaccard_pairs_oracle(threshold, n_shingle)
    found = minhash_lsh_pairs_oracle(threshold, n_shingle)
    return f"""WITH truth AS (
  SELECT doc_a, doc_b FROM ({truth})
), found AS (
  SELECT doc_a, doc_b, 1 AS hit FROM ({found})
), joined AS (
  SELECT t.doc_a, t.doc_b, COALESCE(f.hit, 0) AS hit
  FROM truth t LEFT JOIN found f
    ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
       CAST(SUM(hit) AS BIGINT) AS n_found,
       CAST(COUNT(*) - SUM(hit) AS BIGINT) AS n_missed,
       CASE WHEN COUNT(*) = 0 THEN 1.0 ELSE
         floor(CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e6) / 1e6
       END AS recall
FROM joined"""


def lsh_recall_audit_sampled(
    documents: DataFrame,
    pct: int = 25,
    threshold: float = 0.5,
    n_shingle: int = 3,
) -> DataFrame:
    """Sample-bounded form of :func:`lsh_recall_audit` — THE registered
    scale path for the recall gate.  The full-corpus audit inherits the
    exact truth's Σdf² posting expansion on BOTH sides (measured 48×
    growth per 10× docs, SCALE.md), so at 100 TB the contract is:
    hash-mod the doc_id to a deterministic ``pct``% corpus sample
    BEFORE both the LSH path and the exact-truth path, then run the
    identical audit on the slice.  Recall is a per-pair property and
    the h64 sample is key-uniform, so the sampled recall estimates the
    corpus recall unbiasedly while the audit's cost is bounded by the
    sample, not the corpus (cost shrinks ~pct² on the quadratic truth
    side).  Same h64-mod discipline as ``assign_split`` — the sample is
    reproducible in any engine, which is what lets the oracle replay it.

    The full-corpus form stays registered as the gate-scale exact
    anchor; this is the form a 100 TB run schedules.

    Output (1 row): n_docs_sampled, n_truth, n_found, n_missed, recall.
    """
    h = h64_sql("cast(doc_id as string)", "spark")
    sampled = documents.where(F.expr(f"{h} % 100 < {pct}"))
    audit = lsh_recall_audit(sampled, threshold, n_shingle)
    n = sampled.agg(F.count("*").cast("long").alias("n_docs_sampled"))
    # 1 × 1 declared cross: doc-count reduce × audit reduce (gate shape)
    return n.crossJoin(F.broadcast(audit)).select(
        "n_docs_sampled", "n_truth", "n_found", "n_missed", "recall"
    )


def lsh_recall_audit_sampled_oracle(
    pct: int = 25, threshold: float = 0.5, n_shingle: int = 3
) -> str:
    h = h64_sql("CAST(doc_id AS VARCHAR)", "duckdb")
    truth = ngram_jaccard_pairs_oracle(threshold, n_shingle, table="docs_s")
    found = minhash_lsh_pairs_oracle(threshold, n_shingle, table="docs_s")
    return f"""WITH docs_s AS (
  SELECT * FROM documents WHERE {h} % 100 < {pct}
), truth AS (
  SELECT doc_a, doc_b FROM ({truth})
), found AS (
  SELECT doc_a, doc_b, 1 AS hit FROM ({found})
), joined AS (
  SELECT t.doc_a, t.doc_b, COALESCE(f.hit, 0) AS hit
  FROM truth t LEFT JOIN found f
    ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b
), audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
         CAST(SUM(hit) AS BIGINT) AS n_found,
         CAST(COUNT(*) - SUM(hit) AS BIGINT) AS n_missed,
         CASE WHEN COUNT(*) = 0 THEN 1.0 ELSE
           floor(CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e6) / 1e6
         END AS recall
  FROM joined
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_sampled FROM docs_s)
SELECT n_docs_sampled, n_truth, n_found, n_missed, recall
FROM n CROSS JOIN audit"""


def split_ngram_novelty(
    documents: DataFrame, holdout_pct: int = 30, n_shingle: int = 3
) -> DataFrame:
    """n-gram NOVELTY of the holdout split vs train — the memorization/
    leakage diagnostic that complements ``doc_contamination_check``
    (overlap vs an external canary) and ``doc_split_vocab_kl``
    (unigram distribution drift): what fraction of the holdout's
    distinct 3-shingles were never seen in training?  A near-zero
    novelty rate means the holdout only re-tests memorized phrasing; a
    high rate means the split actually probes generalization.  Split =
    the house h64 membership (``h64(doc_id) % 100 < holdout_pct`` ⇒
    holdout), the same split every split-family operator uses.

    Plan shape: shingling is scan-side; each side collapses to its
    DISTINCT shingle set (vocab-sized, not corpus-sized); novelty is
    one anti-join of the two shingle sets + a 1-row readout.  At
    100 TB both sides are h64-bucketable on the shingle.

    Output (1 row): n_train_shingles, n_holdout_shingles, n_novel,
    novelty_rate (floored 1e-6).
    """
    h = h64_sql("cast(doc_id as string)", "spark")
    hs = h64_sql("s_", "spark")
    # shingles ship as 60-bit h64 hashes, not strings: the distinct and
    # the anti-join shuffle 8-byte longs instead of ~40-char text (the
    # ExactSubstr discipline; 60-bit collisions are negligible and the
    # oracle hashes identically, so the compare stays bit-exact)
    tagged = shingled_docs(documents, n_shingle).selectExpr(
        f"CAST({h} % 100 < {holdout_pct} AS INT) AS holdout",
        f"explode(transform(shingles, s_ -> {hs})) AS s",
    )
    train = tagged.where("holdout = 0").select("s").distinct()
    hold = tagged.where("holdout = 1").select("s").distinct()
    novel = hold.join(train, "s", "left_anti")
    counts = (
        train.agg(F.count("*").cast("long").alias("n_train_shingles"))
        .crossJoin(hold.agg(F.count("*").cast("long").alias("n_holdout_shingles")))
        .crossJoin(novel.agg(F.count("*").cast("long").alias("n_novel")))
    )  # three 1-row reduces: declared 1 × 1 crosses
    return counts.selectExpr(
        "n_train_shingles",
        "n_holdout_shingles",
        "n_novel",
        "CASE WHEN n_holdout_shingles > 0 THEN"
        " floor(CAST(n_novel AS DOUBLE) / n_holdout_shingles * 1000000) / 1000000"
        " END AS novelty_rate",
    )


def split_ngram_novelty_oracle(holdout_pct: int = 30, n_shingle: int = 3) -> str:
    h = h64_sql("CAST(doc_id AS VARCHAR)", "duckdb")
    sh = _shingle_expr("duckdb", n=n_shingle)
    hs = h64_sql("s_", "duckdb")
    return f"""WITH sh AS (
  SELECT CAST(({h}) % 100 < {holdout_pct} AS INT) AS holdout,
         unnest(list_transform({sh}, s_ -> {hs})) AS s
  FROM documents
), train AS (SELECT DISTINCT s FROM sh WHERE holdout = 0),
hold AS (SELECT DISTINCT s FROM sh WHERE holdout = 1),
novel AS (SELECT s FROM hold WHERE NOT EXISTS (SELECT 1 FROM train t WHERE t.s = hold.s)),
c AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM train) AS n_train_shingles,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM hold) AS n_holdout_shingles,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM novel) AS n_novel)
SELECT n_train_shingles, n_holdout_shingles, n_novel,
  CASE WHEN n_holdout_shingles > 0 THEN
    floor(CAST(n_novel AS DOUBLE) / n_holdout_shingles * 1000000) / 1000000
  END AS novelty_rate
FROM c"""
