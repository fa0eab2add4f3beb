"""Similarity search over the ``embeddings`` table (extension surface).

Two physical strategies for the same logical top-k-by-cosine query —
deliberately mirroring the reference's RS-join vs Rep-join lesson
(one logical query, two physical joins, ``README.md:79-81``):

  * brute force — query-set × corpus cross join; Spark broadcasts the
    small query side, every executor scans its corpus slice once.
    Exact; O(|Q|·|C|·d).  The correctness baseline.
  * sign-LSH buckets — random-hyperplane LSH degenerated to axis-aligned
    planes (sign bits of the first B dims) → equi-join on bucket id.
    Approximate; each query probes ~|C|/2^B candidates.  At 100 TB the
    bucket id becomes the shuffle/bucketing key so candidate lookup is
    a co-located join, no cross product anywhere.

Ranking ties are broken by vec_id so output is deterministic and
oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.functions.vector import (
    as_double,
    cosine,
    cosine_sql_duckdb,
    cosine_with_norms,
    dot,
    norm,
)
from twitter_followers_patterns_mapreduce_spark.functions.checkpoint import lazy_ckpt
from twitter_followers_patterns_mapreduce_spark.operators.topk import ranked_top_k
from twitter_followers_patterns_mapreduce_spark.sources.readers import fan_out

#: every 50th vector is a "query" — ~10 queries at sf0.01, ~100 at sf0.1.
QUERY_MOD = 50
LSH_SIGN_BITS = 6


def _queries_and_corpus(embeddings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Query/corpus split with the vector norm staged per side (``nq`` /
    ``nv``) so per-pair cosine is one dot product, not three."""
    # fan_out: the corpus side feeds every per-pair cosine downstream;
    # partitioning sized by work, not scan bytes (readers.py::fan_out).
    emb = fan_out(embeddings).select("vec_id", as_double("embedding").alias("v")).withColumn(
        "nv", norm(F.col("v"))
    )
    q = emb.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nv").alias("nq")
    )
    return q, emb


def ann_topk_bruteforce(embeddings: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.  The query side is
    tiny → broadcast; corpus scanned once per executor slice."""
    q, emb = _queries_and_corpus(embeddings)
    sim = F.round(cosine_with_norms(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv")), 6)
    scored = (
        F.broadcast(q)
        .join(emb, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def ann_topk_bruteforce_oracle(k: int = 10) -> str:
    cos = cosine_sql_duckdb("q.qv", "c.v")
    return f"""WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id % {QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, round({cos}, 6) AS sim
  FROM q JOIN emb c ON q.query_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, sim
FROM ranked WHERE rank <= {k}"""


def _sign_bucket(v: F.Column) -> F.Column:
    """Pack sign bits of the first LSH_SIGN_BITS dims into an int bucket id."""
    bucket = F.lit(0)
    for i in range(LSH_SIGN_BITS):
        # F.get (0-based) is null-safe past the array end — element_at
        # THROWS under ANSI mode (Spark 4 default) for dims < LSH_SIGN_BITS;
        # null >= 0 is null → falls to otherwise(0), matching DuckDB's
        # out-of-bounds v[i] = NULL
        bucket = bucket + F.when(F.get(v, i) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_topk_lsh(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket (equi-join on bucket id — broadcastable, co-locatable).

    Bucket columns are named distinctly per side (q_bucket/c_bucket) —
    both lineages derive from the same scan, so a shared name would hit
    the classic self-join column-ambiguity trap."""
    q, emb = _queries_and_corpus(embeddings)
    qb = q.withColumn("q_bucket", _sign_bucket(F.col("qv")))
    cb = emb.withColumn("c_bucket", _sign_bucket(F.col("v")))
    sim = F.round(cosine_with_norms(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv")), 6)
    scored = (
        F.broadcast(qb)
        .join(cb, (F.col("q_bucket") == F.col("c_bucket")) & (F.col("query_id") != F.col("vec_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def ann_topk_lsh_oracle(k: int = 5) -> str:
    bucket_terms = " + ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(LSH_SIGN_BITS)
    )
    cos = cosine_sql_duckdb("q.qv", "c.v")
    return f"""WITH emb AS (
  SELECT vec_id, v, {bucket_terms} AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
), q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM emb WHERE vec_id % {QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, round({cos}, 6) AS sim
  FROM q JOIN emb c ON q.bucket = c.bucket AND q.query_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, sim
FROM ranked WHERE rank <= {k}"""


def _ranked_top_pairs(pairs: DataFrame, top_n: int) -> DataFrame:
    """Global top-N pairs via orderBy().limit() — plans as
    TakeOrderedAndProject (per-partition top-N, driver merge of
    N·partitions rows), never a single-partition global window sort."""
    order = [F.col("sim").desc(), F.col("vec_a").asc(), F.col("vec_b").asc()]
    return ranked_top_k(pairs, order, top_n, anchor="vec_a").select(
        "rank", "vec_a", "vec_b", "sim"
    )


#: IVF coarse search: probe this many nearest centroids per query.
IVF_NPROBE = 2


def ivf_centroids(embeddings: DataFrame) -> DataFrame:
    """Coarse-quantizer centroids: element-wise mean vector per label
    (the harness ``label`` column plays the role of a trained k-means
    assignment).

    Shape: posexplode to (label, dim, val) narrow rows → one hash
    aggregate → reassemble the array ordered by dim.  Per-dimension sums
    go through DECIMAL so they are exact and order-independent — float
    summation order differs between engines (and between Spark tasks),
    and probe selection must be deterministic for the oracle."""
    emb = embeddings.select("label", as_double("embedding").alias("v"))
    # posexplode_outer: plain posexplode makes Catalyst infer size(v)>0 /
    # isnotnull(v) predicates that push to the scan with the array
    # expression inlined (v is non-empty by construction)
    dims = emb.select("label", F.posexplode_outer("v").alias("pos", "val"))
    avgs = dims.groupBy("label", "pos").agg(
        (F.sum(F.col("val").cast("decimal(28,12)")).cast("double") / F.count("*")).alias("avg")
    )
    return avgs.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, avg))), x -> x.avg)").alias(
            "centroid"
        )
    )


def ann_topk_ivf(embeddings: DataFrame, k: int = 5, n_probe: int = IVF_NPROBE) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus by ``label`` centroid,
    probe only the ``n_probe`` centroids nearest each query, then exact
    top-k within the probed inverted lists.

    Scale shape: centroids are dimension-table sized → broadcast both
    joins; the corpus is touched once via an equi-join on label.  At
    100 TB the corpus is bucketed/partitioned by label so the probe join
    is pruned to the selected partitions."""
    q, emb = _queries_and_corpus(embeddings)
    cb = embeddings.select("vec_id", F.col("label"))
    corpus = emb.join(cb, "vec_id")  # (vec_id, v, label)
    cents = ivf_centroids(embeddings)

    # nearest n_probe centroids per query (tiny cross: |Q| × |labels|)
    qc = F.broadcast(q).crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "nq", "label", cosine(F.col("qv"), F.col("centroid")).alias("csim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("label").asc())
    probes = (
        qc.withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= n_probe)
        .select("query_id", "qv", "nq", "label")
    )

    sim = F.round(cosine_with_norms(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv")), 6)
    scored = (
        F.broadcast(probes)
        .join(corpus, (probes["label"] == corpus["label"]) & (F.col("query_id") != F.col("vec_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def ann_topk_ivf_oracle(k: int = 5, n_probe: int = IVF_NPROBE) -> str:
    cos_c = cosine_sql_duckdb("q.qv", "c.centroid")
    cos_v = cosine_sql_duckdb("p.qv", "e.v")
    return f"""WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id % {QUERY_MOD} = 0
), cents AS (
  SELECT label, list(avg ORDER BY i) AS centroid FROM (
    SELECT label, i, CAST(SUM(CAST(v[i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS avg
    FROM emb, (SELECT unnest(range(1, 65)) AS i) dims
    GROUP BY label, i
  ) GROUP BY label
), probes AS (
  SELECT query_id, qv, label FROM (
    SELECT q.query_id, q.qv, c.label,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {cos_c} DESC, c.label ASC) AS crank
    FROM q CROSS JOIN cents c
  ) WHERE crank <= {n_probe}
), scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id, round({cos_v}, 6) AS sim
  FROM probes p JOIN emb e ON p.label = e.label AND p.query_id <> e.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, sim
FROM ranked WHERE rank <= {k}"""


def embedding_top_pairs(embeddings: DataFrame, top_n: int = 50) -> DataFrame:
    """Embedding-cosine near-dup: the N most-similar distinct pairs
    corpus-wide (global top-N keeps the result meaningful even when no
    pair crosses a fixed threshold).

    This is the DOCUMENTED exact brute-force baseline (all-pairs —
    O(n²) like any exact top-pairs); ``embedding_top_pairs_lsh`` is the
    equi-join scale path."""
    emb = fan_out(embeddings).select("vec_id", as_double("embedding").alias("v")).withColumn(
        "nv", norm(F.col("v"))
    )
    a, b = emb.alias("a"), emb.alias("b")
    sim = F.round(
        cosine_with_norms(F.col("a.v"), F.col("b.v"), F.col("a.nv"), F.col("b.nv")), 6
    )
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"), sim.alias("sim")
    )
    return _ranked_top_pairs(pairs, top_n)


def embedding_top_pairs_lsh(embeddings: DataFrame, top_n: int = 50) -> DataFrame:
    """Approximate top-N pairs: candidates restricted to same sign-LSH
    bucket — an EQUI-join on bucket id (shuffle/bucketing key at scale),
    no cross product anywhere.  High-cosine pairs land in the same
    bucket with high probability; the oracle applies the identical
    bucket restriction so results are deterministic and comparable."""
    emb = fan_out(embeddings).select("vec_id", as_double("embedding").alias("v")).withColumn(
        "nv", norm(F.col("v"))
    )
    a = emb.select("vec_id", "v", "nv", _sign_bucket(F.col("v")).alias("bucket")).alias("a")
    b = emb.select(
        F.col("vec_id").alias("vec_id_b"), F.col("v").alias("v_b"),
        F.col("nv").alias("nv_b"), _sign_bucket(F.col("v")).alias("bucket_b"),
    ).alias("b")
    sim = F.round(cosine_with_norms(F.col("v"), F.col("v_b"), F.col("nv"), F.col("nv_b")), 6)
    pairs = a.join(
        b, (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_id") < F.col("vec_id_b"))
    ).select(F.col("vec_id").alias("vec_a"), F.col("vec_id_b").alias("vec_b"), sim.alias("sim"))
    return _ranked_top_pairs(pairs, top_n)


def embedding_top_pairs_lsh_oracle(top_n: int = 50) -> str:
    bucket_terms = " + ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(LSH_SIGN_BITS)
    )
    cos = cosine_sql_duckdb("a.v", "b.v")
    return f"""WITH emb AS (
  SELECT vec_id, v, {bucket_terms} AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({cos}, 6) AS sim
  FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_a ASC, vec_b ASC) AS rank FROM pairs
)
SELECT CAST(rank AS INT) AS rank, vec_a, vec_b, sim FROM ranked WHERE rank <= {top_n}"""


def embedding_top_pairs_oracle(top_n: int = 50) -> str:
    cos = cosine_sql_duckdb("a.v", "b.v")
    return f"""WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({cos}, 6) AS sim
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_a ASC, vec_b ASC) AS rank FROM pairs
)
SELECT CAST(rank AS INT) AS rank, vec_a, vec_b, sim FROM ranked WHERE rank <= {top_n}"""


def embedding_top_pairs_blocked(
    embeddings: DataFrame, top_n: int = 50, n_blocks: int = 8
) -> DataFrame:
    """EXACT top-N cosine pairs via block-pair matrix multiply — the
    distributed exact-all-pairs design (same answer as
    ``embedding_top_pairs``, ~10× the throughput).

    Shape: each vector belongs to block ``pmod(vec_id, B)`` and is
    replicated to the B block-pair groups it participates in (√P
    replication, the standard 2-D decomposition for distributed
    similarity joins).  One ``applyInPandas`` per (bi ≤ bj) group runs
    a single BLAS matmul over its ≤ (n/B)² candidate slab and emits
    only its LOCAL top-N; the global merge is
    ``orderBy().limit(top_n)`` over B·(B+1)/2 · top_n rows.  Work is
    still O(n²·d) — exactness requires it — but vectorized, with
    per-group memory bounded by (n/B)·d and no driver involvement.

    Determinism: BLAS accumulates dot products in a different order
    than the sequential SQL fold, so raw doubles can differ in the last
    ulps; ties after round(·, 6) are broken by (vec_a, vec_b) exactly
    like the brute-force form, and the 6-dp rounding absorbs the ulp
    noise (differentially asserted equal to ``embedding_top_pairs`` in
    tests/test_similarity.py).
    """
    import numpy as np
    import pandas as pd

    emb = embeddings.select(
        "vec_id",
        as_double("embedding").alias("v"),
        F.pmod("vec_id", F.lit(n_blocks)).cast("int").alias("block"),
    )
    # replicate: vector in block b joins every group (min(b,j), max(b,j))
    groups = emb.select(
        "vec_id",
        "v",
        "block",
        F.explode_outer(
            F.expr(
                f"transform(sequence(0, {n_blocks - 1}), "
                f"j -> struct(least(block, j) AS gi, greatest(block, j) AS gj))"
            )
        ).alias("g"),
    ).select("vec_id", "v", "block", F.col("g.gi").alias("gi"), F.col("g.gj").alias("gj"))

    def block_topk(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "sim": []})
        gi, gj = int(key[0]), int(key[1])
        va = pdf[pdf["block"] == gi]
        if len(va) == 0 or (gi == gj and len(va) < 2):
            return empty
        ids_a = va["vec_id"].to_numpy()
        xa = np.vstack(va["v"].to_numpy())
        na = np.linalg.norm(xa, axis=1)
        if gi == gj:
            sims = (xa @ xa.T) / np.outer(na, na)
            iu, ju = np.triu_indices(len(ids_a), k=1)
            a, b, s = ids_a[iu], ids_a[ju], sims[iu, ju]
        else:
            vb = pdf[pdf["block"] == gj]
            if len(vb) == 0:
                return empty
            ids_b = vb["vec_id"].to_numpy()
            xb = np.vstack(vb["v"].to_numpy())
            nb = np.linalg.norm(xb, axis=1)
            sims = (xa @ xb.T) / np.outer(na, nb)
            ii, jj = np.meshgrid(np.arange(len(ids_a)), np.arange(len(ids_b)), indexing="ij")
            a, b, s = ids_a[ii.ravel()], ids_b[jj.ravel()], sims.ravel()
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"vec_a": lo, "vec_b": hi, "sim": np.round(s, 6)})
        return out.sort_values(
            ["sim", "vec_a", "vec_b"], ascending=[False, True, True]
        ).head(top_n)

    local = groups.groupBy("gi", "gj").applyInPandas(
        block_topk, schema="vec_a LONG, vec_b LONG, sim DOUBLE"
    )
    return _ranked_top_pairs(local, top_n)


# ---------------------------------------------------------------------------
# Grouped Pandas escape hatch: per-label principal component


def label_principal_component(embeddings: DataFrame, n_iter: int = 30) -> DataFrame:
    """Per-label top principal component via power iteration — the
    documented escape hatch for semantics Catalyst genuinely cannot
    express (iterative eigen-solve per group), done the right way:
    ``applyInPandas`` over ``groupBy(label)``, Arrow-batched, group
    state bounded by the label's row count (labels are a partition-
    sized dimension, not a per-row key).

    Deterministic up to float summation order (fixed all-ones init,
    fixed iteration count, sign normalized so the largest-|coordinate|
    entry is positive; row order within a group still varies with
    partitioning, so agreement across runs is ~1e-9, not bitwise).
    Output:
    (label, n_vecs, explained_ratio, pc_dim0, pc_dim1, pc_dim2).
    Oracle-checked after all: :func:`label_principal_component_oracle`
    unrolls the same iteration as a DuckDB CTE chain (float64 both
    sides, round(6) outputs); numpy differential tests remain in
    tests/test_similarity_pca.py.
    """
    import numpy as np
    import pandas as pd

    def pca_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # float64 from the start: the SQL oracle computes in DOUBLE, and
        # a float32 covariance diverges at ~1e-7 — above round(6) noise
        x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        x = x - x.mean(axis=0)
        cov = (x.T @ x) / max(len(x) - 1, 1)
        v = np.ones(cov.shape[0])
        for _ in range(n_iter):
            v = cov @ v
            n = np.linalg.norm(v)
            if n == 0.0:
                break
            v = v / n
        # sign convention: largest-magnitude coordinate positive
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        lam = float(v @ cov @ v)
        total = float(np.trace(cov))
        # round(6): the oracle replays the identical iteration in SQL,
        # where summation ORDER differs from BLAS — trajectories agree
        # to ~1e-12, and rounding makes the compared doubles bit-equal
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vecs": [len(x)],
                "explained_ratio": [round(lam / total, 6) if total > 0 else 0.0],
                "pc_dim0": [round(float(v[0]), 6)],
                "pc_dim1": [round(float(v[1]), 6)],
                "pc_dim2": [round(float(v[2]), 6)],
            }
        )

    schema = (
        "label LONG, n_vecs LONG, explained_ratio DOUBLE, "
        "pc_dim0 DOUBLE, pc_dim1 DOUBLE, pc_dim2 DOUBLE"
    )
    return embeddings.select("label", "embedding").groupBy("label").applyInPandas(
        pca_group, schema=schema
    )


def label_principal_component_oracle(n_iter: int = 30, dim: int = 64) -> str:
    """DuckDB oracle for :func:`label_principal_component`: the SAME
    power iteration unrolled as a CTE chain (the k-means-oracle
    technique) — per-label covariance from an exploded self-join, then
    ``n_iter`` × (matrix-vector product, L2 normalize), sign fix,
    Rayleigh quotient.  The chain CTEs are MATERIALIZED: DuckDB inlines
    plain CTEs, and each mv{k} is referenced twice — un-materialized,
    the 30-step chain inlines exponentially (observed as "too many
    open files" on the parquet view).  Everything is float64 on both sides and the
    outputs are round(6), so the iterative ``applyInPandas`` escape
    hatch is held to the exact same hash gate as the relational
    queries (it was the engine's last rows-only query)."""
    head = f"""WITH xs AS MATERIALIZED (
  SELECT label, vec_id, CAST(i AS INTEGER) AS i,
         CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE) AS x
  FROM embeddings, range({dim}) t(i)
),
mu AS (SELECT label, i, AVG(x) AS mu FROM xs GROUP BY 1, 2),
nv AS (SELECT label, COUNT(DISTINCT vec_id) AS n FROM xs GROUP BY 1),
c AS MATERIALIZED (
  SELECT xs.label, xs.vec_id, xs.i, xs.x - mu.mu AS v
  FROM xs JOIN mu ON xs.label = mu.label AND xs.i = mu.i
),
cov AS MATERIALIZED (
  SELECT a.label, a.i, b.i AS j,
         SUM(a.v * b.v) / GREATEST(MAX(nv.n) - 1, 1) AS val
  FROM c a
  JOIN c b ON a.label = b.label AND a.vec_id = b.vec_id
  JOIN nv ON nv.label = a.label
  GROUP BY 1, 2, 3
),
v0 AS (SELECT DISTINCT label, i, 1.0 AS val FROM cov)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f""",
mv{k} AS MATERIALIZED (
  SELECT c.label, c.i, SUM(c.val * v.val) AS val
  FROM cov c JOIN v{k - 1} v ON c.label = v.label AND c.j = v.i
  GROUP BY 1, 2),
nz{k} AS (SELECT label, SQRT(SUM(val * val)) AS nrm FROM mv{k} GROUP BY 1),
v{k} AS MATERIALIZED (SELECT m.label, m.i, m.val / n.nrm AS val
         FROM mv{k} m JOIN nz{k} n USING (label))""")
    tail = f""",
sgn AS (
  SELECT label, CASE WHEN val < 0 THEN -1.0 ELSE 1.0 END AS s FROM (
    SELECT label, val,
           ROW_NUMBER() OVER (PARTITION BY label
                              ORDER BY ABS(val) DESC, i ASC) AS rn
    FROM v{n_iter})
  WHERE rn = 1),
vf AS (SELECT v.label, v.i, v.val * s.s AS val FROM v{n_iter} v JOIN sgn s USING (label)),
lam AS (
  SELECT c.label, SUM(va.val * c.val * vb.val) AS lam
  FROM cov c
  JOIN vf va ON va.label = c.label AND va.i = c.i
  JOIN vf vb ON vb.label = c.label AND vb.i = c.j
  GROUP BY 1),
tr AS (SELECT label, SUM(val) AS tr FROM cov WHERE i = j GROUP BY 1)
SELECT CAST(nv.label AS BIGINT) AS label,
  CAST(nv.n AS BIGINT) AS n_vecs,
  CASE WHEN tr.tr > 0 THEN round(lam.lam / tr.tr, 6) ELSE 0.0 END AS explained_ratio,
  round(MAX(CASE WHEN vf.i = 0 THEN vf.val END), 6) AS pc_dim0,
  round(MAX(CASE WHEN vf.i = 1 THEN vf.val END), 6) AS pc_dim1,
  round(MAX(CASE WHEN vf.i = 2 THEN vf.val END), 6) AS pc_dim2
FROM nv
JOIN lam ON lam.label = nv.label
JOIN tr ON tr.label = nv.label
JOIN vf ON vf.label = nv.label
GROUP BY 1, 2, lam.lam, tr.tr"""
    return head + "".join(steps) + tail


# ---------------------------------------------------------------------------
# Scalar int8 quantization fidelity (the PQ-lite storage path)
# ---------------------------------------------------------------------------

def embedding_quantize_stats(embeddings: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization (scale = 127/max|x|,
    code = floor(x·scale + 0.5) clamped to ±127) with reconstruction
    fidelity per vector: max abs error, mean squared error, SATURATED
    code count — the audit a pipeline runs before shipping embeddings
    at 8-bit (4× smaller, ANN-recall-preserving if errors are tiny).
    With a symmetric per-vector scale the clamp never engages (max
    |x·scale| = 127 by construction — kept as a guard for callers who
    pass a global/shared scale); ``n_saturated`` counts codes AT the
    ±127 rail, ≥1 for every nonzero vector by definition.

    Pure scan-side higher-order functions (transform/zip_with/aggregate)
    on one pass — zero shuffles, whole-stage codegen; the sequential
    index-order fold makes the arithmetic bit-reproducible in DuckDB.
    """
    v = as_double("embedding")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(amax > F.lit(0.0), F.lit(127.0) / amax).otherwise(F.lit(1.0))
    base = embeddings.select("vec_id", v.alias("v"), scale.alias("scale"))
    q = F.transform(
        F.col("v"),
        lambda x: F.greatest(
            F.least(F.floor(x * F.col("scale") + F.lit(0.5)).cast("double"), F.lit(127.0)),
            F.lit(-127.0),
        ),
    )
    qd = base.withColumn("q", q)
    err = F.zip_with(F.col("v"), F.col("q"), lambda a, c: F.abs(a - c / F.col("scale")))
    ed = qd.select("vec_id", "scale", "q", err.alias("err"), F.size("v").alias("dim"))
    return ed.select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.round("scale", 6).alias("scale"),
        F.round(F.array_max("err"), 6).alias("max_abs_err"),
        F.round(
            F.aggregate("err", F.lit(0.0), lambda acc, e: acc + e * e) / F.col("dim"), 9
        ).alias("mean_sq_err"),
        F.size(F.filter("q", lambda c: F.abs(c) >= F.lit(127.0))).cast("long").alias("n_saturated"),
    )


EMBEDDING_QUANTIZE_ORACLE = """WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
    CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
         THEN 127.0 / list_max(list_transform(v, x -> abs(x))) ELSE 1.0 END AS scale
  FROM base
), qd AS (
  SELECT vec_id, v, scale,
    list_transform(v, x -> greatest(least(floor(x * scale + 0.5), 127.0), -127.0)) AS q
  FROM s
), ed AS (
  SELECT vec_id, scale, q,
    list_transform(range(1, len(v) + 1), i -> abs(v[i] - q[i] / scale)) AS err,
    len(v) AS dim
  FROM qd
)
SELECT vec_id, CAST(dim AS BIGINT) AS dim, round(scale, 6) AS scale,
  round(list_max(err), 6) AS max_abs_err,
  round(list_sum(list_transform(err, e -> e * e)) / dim, 9) AS mean_sq_err,
  CAST(len(list_filter(q, c -> abs(c) >= 127.0)) AS BIGINT) AS n_saturated
FROM ed"""


# ---------------------------------------------------------------------------
# Int8-quantized ANN (scalar-quantization candidates + exact rerank)
# ---------------------------------------------------------------------------

def _int8_codes(v: F.Column, scale: F.Column) -> F.Column:
    """Symmetric int8 codes (same arithmetic as
    :func:`embedding_quantize_stats`): floor(x·scale + 0.5) clamped to
    ±127, kept as exact small integers in DOUBLE so the downstream dot
    product is a plain zip_with fold."""
    return F.transform(
        v,
        lambda x: F.greatest(
            F.least(F.floor(x * scale + F.lit(0.5)).cast("double"), F.lit(127.0)),
            F.lit(-127.0),
        ),
    )


def ann_topk_pq(embeddings: DataFrame, k: int = 5, rerank: int = 20) -> DataFrame:
    """Two-stage quantized ANN: (1) candidate generation scores every
    query/corpus pair on INT8 codes — at scale the corpus's code table
    is 4× smaller than float32 (16× smaller than the staged doubles),
    so the scan stage is memory-bandwidth-bound on a quarter of the
    bytes; (2) only the top-``rerank`` candidates per query are
    re-scored with exact full-precision cosine, and the final top-``k``
    comes from that rerank.  This is the scalar-quantization (SQ8)
    retrieval pattern used by FAISS-style systems, expressed as pure
    DataFrame algebra.

    Determinism: codes are exact small integers (|code| ≤ 127, dot ≤
    127²·dim ≪ 2⁵³), the zip_with/aggregate fold runs in index order,
    and both rank windows break ties by neighbor_id — so the result is
    reproducible bit-for-bit in the DuckDB oracle.

    Scale: stage 1 is the brute-force shape (broadcast queries × corpus
    scan) on the compressed representation ONLY — candidate rows carry
    (query_id, neighbor_id, approx_sim), never the float vectors, so
    the rank shuffle moves narrow rows; stage 2 joins the
    |queries|·rerank shortlist back to the coded table for the exact
    vectors.  The staged ``codes`` column is the artifact a real
    deployment materializes once and scans instead of the raw
    vectors."""
    emb = fan_out(embeddings).select("vec_id", as_double("embedding").alias("v"))
    amax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    scale = F.when(amax > F.lit(0.0), F.lit(127.0) / amax).otherwise(F.lit(1.0))
    # lazy checkpoint: three branches read this (stage-1 query/corpus
    # sides, stage-2 exact join) — compute the codes once
    coded = (
        emb.select(
            "vec_id",
            "v",
            scale.alias("scale"),
            norm(F.col("v")).alias("nv"),
        )
        .withColumn("codes", _int8_codes(F.col("v"), F.col("scale")))
        .localCheckpoint(eager=False)
    )

    # stage 1: int8 dot → approximate cosine (descale, then true-norm
    # normalize).  Code columns only — no float vectors on candidate rows.
    q1 = coded.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("q_scale"),
        F.col("nv").alias("nq"),
        F.col("codes").alias("q_codes"),
    )
    c1 = coded.select("vec_id", F.col("scale").alias("c_scale"), "nv", "codes")
    adot = dot(F.col("q_codes"), F.col("codes"))
    approx = (adot / (F.col("q_scale") * F.col("c_scale"))) / (F.col("nq") * F.col("nv"))
    cands = (
        F.broadcast(q1)
        .join(c1, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), approx.alias("approx_sim"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cands.withColumn("crank", F.row_number().over(w1))
        .where(F.col("crank") <= rerank)
        .select("query_id", "neighbor_id")
    )

    # stage 2: join the shortlist back to the coded table for the exact
    # vectors (corpus side equi-join on vec_id; query side broadcast)
    qx = coded.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nv").alias("nq")
    )
    cx = coded.select(F.col("vec_id").alias("neighbor_id"), "v", "nv")
    sim = F.round(cosine_with_norms(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv")), 6)
    rescored = (
        shortlist.join(cx, "neighbor_id")
        .join(F.broadcast(qx), "query_id")
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def ann_topk_pq_oracle(k: int = 5, rerank: int = 20) -> str:
    cos = cosine_sql_duckdb("s.qv", "s.v")
    return f"""WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), coded AS (
  SELECT vec_id, v,
    CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
         THEN 127.0 / list_max(list_transform(v, x -> abs(x))) ELSE 1.0 END AS scale,
    sqrt(list_dot_product(v, v)) AS nv
  FROM emb
), coded2 AS (
  SELECT vec_id, v, scale, nv,
    list_transform(v, x -> greatest(least(floor(x * scale + 0.5), 127.0), -127.0)) AS codes
  FROM coded
), q AS (
  SELECT vec_id AS query_id, v AS qv, scale AS q_scale, nv AS nq, codes AS q_codes
  FROM coded2 WHERE vec_id % {QUERY_MOD} = 0
), cands AS (
  SELECT q.query_id, q.qv, q.nq, c.vec_id AS neighbor_id, c.v, c.nv,
    (list_dot_product(q.q_codes, c.codes) / (q.q_scale * c.scale)) / (q.nq * c.nv)
      AS approx_sim
  FROM q JOIN coded2 c ON q.query_id <> c.vec_id
), shortlist AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY approx_sim DESC, neighbor_id ASC) AS crank
    FROM cands) WHERE crank <= {rerank}
), rescored AS (
  SELECT query_id, neighbor_id, round({cos}, 6) AS sim FROM shortlist s
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM rescored) WHERE rank <= {k}"""


def ann_recall_at_k(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """Recall@k of the sign-LSH index against brute-force ground truth —
    the "measure, don't guess" audit for the approximate path: per query
    vector, how many of the exact top-k cosine neighbors the LSH bucket
    probe actually returned.

    The reference's Rep-join chapter teaches the strategy swap
    (``README.md:79-81``); this operator closes the loop by *quantifying*
    what the cheap strategy trades away, the way an ANN deployment
    tracks recall before widening probes.

    Plan shape (100 TB): ground truth is only ever computed for the
    query SAMPLE (``vec_id % QUERY_MOD``, |Q| ≪ |C|), so the exact side
    stays a broadcast-query × corpus scan, the LSH side the usual bucket
    equi-join; the comparison itself is a tiny (|Q|·k rows) equi-join
    and one hash aggregate.  ``localCheckpoint`` shares the truth
    subtree between the hit-join and the per-query denominator instead
    of rerunning the exact scan twice.
    """
    truth = (
        ann_topk_bruteforce(embeddings, k=k)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    approx = ann_topk_lsh(embeddings, k=k).select("query_id", "neighbor_id")
    per_q = (
        approx.join(
            truth.withColumn("_t", F.lit(1)), ["query_id", "neighbor_id"], "left"
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_approx"), F.count("_t").alias("n_hits"))
    )
    denom = truth.groupBy("query_id").agg(F.count("*").alias("n_truth"))
    return denom.join(per_q, "query_id", "left").select(
        "query_id",
        "n_truth",
        F.coalesce(F.col("n_approx"), F.lit(0)).alias("n_approx"),
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)), 6).alias(
            "recall_at_k"
        ),
    )


def ann_recall_at_k_oracle(k: int = 5) -> str:
    bucket_terms = " + ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(LSH_SIGN_BITS)
    )
    cos = cosine_sql_duckdb("q.qv", "c.v")
    return f"""WITH emb AS (
  SELECT vec_id, v, {bucket_terms} AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
), q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM emb WHERE vec_id % {QUERY_MOD} = 0
), truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM (SELECT q.query_id, c.vec_id AS neighbor_id, round({cos}, 6) AS sim
          FROM q JOIN emb c ON q.query_id <> c.vec_id)
  ) WHERE rank <= {k}
), approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM (SELECT q.query_id, c.vec_id AS neighbor_id, round({cos}, 6) AS sim
          FROM q JOIN emb c ON q.bucket = c.bucket AND q.query_id <> c.vec_id)
  ) WHERE rank <= {k}
), per_q AS (
  SELECT a.query_id, COUNT(*) AS n_approx, COUNT(t.neighbor_id) AS n_hits
  FROM approx a LEFT JOIN truth t
    ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
  GROUP BY 1
)
SELECT d.query_id,
       d.n_truth,
       COALESCE(p.n_approx, 0) AS n_approx,
       COALESCE(p.n_hits, 0) AS n_hits,
       ROUND(COALESCE(p.n_hits, 0)::DOUBLE / {k}, 6) AS recall_at_k
FROM (SELECT query_id, COUNT(*) AS n_truth FROM truth GROUP BY 1) d
LEFT JOIN per_q p ON d.query_id = p.query_id"""


#: radius for the range-search query — ≈ the p99 of the query→corpus
#: cosine distribution on the synthetic embeddings (max ≈ 0.45), so the
#: result set is selective but non-trivial at every harness sf
RADIUS_TAU = 0.30


def ann_radius_search(embeddings: DataFrame, tau: float = RADIUS_TAU) -> DataFrame:
    """Range (radius) similarity search: every corpus vector within
    cosine ≥ ``tau`` of each query vector — the "find ALL near things"
    dual of top-k (dedup candidate pull, positive-pair mining), where
    the result size is data-dependent rather than fixed at k.

    Shape = the exact scale path for query→corpus range search: the
    bounded query side broadcasts, the corpus streams through ONE
    scan-side join with zero shuffles (`.explain`: BroadcastHashJoin on
    nothing — a nested-loop over the broadcast rows), and the filter on
    the rounded cosine prunes before anything leaves the executor.
    Unlike top-k there is no window/rank stage at all — the threshold
    makes the operator embarrassingly parallel.  Output:
    (query_id, neighbor_id, sim)."""
    q, emb = _queries_and_corpus(embeddings)
    sim = F.round(
        cosine_with_norms(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv")), 6
    )
    return (
        F.broadcast(q)
        .join(emb, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
        .where(F.col("sim") >= tau)
    )


def ann_radius_search_oracle(tau: float = RADIUS_TAU) -> str:
    cos = cosine_sql_duckdb("q.qv", "c.v")
    return f"""WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id % {QUERY_MOD} = 0
)
SELECT q.query_id, c.vec_id AS neighbor_id, round({cos}, 6) AS sim
FROM q JOIN emb c ON q.query_id <> c.vec_id
WHERE round({cos}, 6) >= {tau}"""


def mmr_diversified_topk(
    embeddings: DataFrame, k: int = 5, m: int = 20, lam_num: int = 7, mu_num: int = 3
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: per query, greedily pick
    ``k`` of the top-``m`` cosine candidates maximizing
    ``lam·rel − mu·max_sim_to_already_selected`` with λ = lam_num/10,
    μ = mu_num/10 — the diversity-aware top-k of retrieval/RAG
    pipelines (plain top-k returns near-duplicates; MMR spends the
    budget on coverage).

    The greedy recurrence is inherently sequential in k but fully
    parallel across queries, so the driver unrolls exactly k-1 steps of
    DataFrame algebra (anti-join the selected set, one max-sim agg over
    the precomputed candidate-pair sims, one argmax window) — no
    ``collect``; per-query state is the bounded candidate set (m rows,
    m² sims), so 10⁶ queries at 100 TB still run as k joint passes.

    Determinism: similarities are snapped to 1e-6-scaled BIGINTs at
    birth and the MMR objective runs ENTIRELY in integers
    (score7 = lam_num·rel6 − mu_num·maxsim6) — a double form
    0.7·rel − 0.3·maxsim over 6-dp inputs lands exactly on 7th-decimal
    halfway points, where Spark (exact-BigDecimal HALF_UP) and DuckDB
    (multiply-then-round) disagree; integer argmax with an id tiebreak
    cannot.  Output: (query_id, step, neighbor_id, score) with
    score = rel at step 1, the MMR objective after (both exact
    small-integer / power-of-ten doubles)."""
    from pyspark.sql import Window

    q, emb = _queries_and_corpus(embeddings)
    rel6 = F.round(
        cosine_with_norms(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv")) * 1000000
    ).cast("long")
    rel_all = (
        F.broadcast(q)
        .join(emb, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"), rel6.alias("rel6"))
    )
    w_rel = Window.partitionBy("query_id").orderBy(F.desc("rel6"), F.asc("cand_id"))
    cand = (
        rel_all.withColumn("rn", F.row_number().over(w_rel))
        .where(F.col("rn") <= m)
        .drop("rn")
        .transform(lazy_ckpt)
    )
    va = emb.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("va"), F.col("nv").alias("na"))
    vb = emb.select(F.col("vec_id").alias("other_id"), F.col("v").alias("vb"), F.col("nv").alias("nb"))
    sim6 = F.round(
        cosine_with_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")) * 1000000
    ).cast("long")
    pairs = (
        cand.select("query_id", "cand_id")
        .join(
            cand.select(F.col("query_id"), F.col("cand_id").alias("other_id")),
            "query_id",
        )
        .where(F.col("cand_id") != F.col("other_id"))
        .join(va, "cand_id")
        .join(vb, "other_id")
        .select("query_id", "cand_id", "other_id", sim6.alias("sim6"))
        .transform(lazy_ckpt)
    )
    sel = (
        cand.withColumn("rn", F.row_number().over(w_rel))
        .where(F.col("rn") == 1)
        .select(
            "query_id",
            "cand_id",
            F.lit(1).cast("int").alias("step"),
            (F.col("rel6").cast("double") / F.lit(1000000.0)).alias("score"),
        )
        .transform(lazy_ckpt)
    )
    w_score = Window.partitionBy("query_id").orderBy(F.desc("score7"), F.asc("cand_id"))
    for step in range(2, k + 1):
        rem = cand.join(
            sel.select("query_id", "cand_id"), ["query_id", "cand_id"], "left_anti"
        )
        ms = (
            pairs.join(
                sel.select("query_id", F.col("cand_id").alias("other_id")),
                ["query_id", "other_id"],
                "left_semi",
            )
            .groupBy("query_id", "cand_id")
            .agg(F.max("sim6").alias("maxsim6"))
        )
        pick = (
            rem.join(ms, ["query_id", "cand_id"])
            .select(
                "query_id",
                "cand_id",
                (F.lit(lam_num) * F.col("rel6") - F.lit(mu_num) * F.col("maxsim6")).alias(
                    "score7"
                ),
            )
            .withColumn("rn", F.row_number().over(w_score))
            .where(F.col("rn") == 1)
            .select(
                "query_id",
                "cand_id",
                F.lit(step).cast("int").alias("step"),
                (F.col("score7").cast("double") / F.lit(10000000.0)).alias("score"),
            )
        )
        sel = sel.unionByName(pick).transform(lazy_ckpt)
    return sel.select("query_id", "step", F.col("cand_id").alias("neighbor_id"), "score")


def mmr_diversified_topk_oracle(
    k: int = 5, m: int = 20, lam_num: int = 7, mu_num: int = 3
) -> str:
    cos_qc = cosine_sql_duckdb("q.qv", "c.v")
    cos_ab = cosine_sql_duckdb("ea.v", "eb.v")
    sql = f"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id % {QUERY_MOD} = 0),
rel_all AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         CAST(round({cos_qc} * 1000000) AS BIGINT) AS rel6
  FROM q JOIN emb c ON q.query_id <> c.vec_id),
cand AS (
  SELECT query_id, cand_id, rel6 FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel6 DESC, cand_id) AS rn
    FROM rel_all) WHERE rn <= {m}),
pairs AS (
  SELECT a.query_id, a.cand_id, b.cand_id AS other_id,
         CAST(round({cos_ab} * 1000000) AS BIGINT) AS sim6
  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
  JOIN emb ea ON ea.vec_id = a.cand_id JOIN emb eb ON eb.vec_id = b.cand_id),
selu1 AS (
  SELECT query_id, cand_id, CAST(1 AS INT) AS step,
         CAST(rel6 AS DOUBLE) / 1000000.0 AS score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel6 DESC, cand_id) AS rn
    FROM cand) WHERE rn = 1)"""
    for i in range(2, k + 1):
        p = i - 1
        sql += f""",
rem{i} AS (
  SELECT c.* FROM cand c
  LEFT JOIN selu{p} s ON c.query_id = s.query_id AND c.cand_id = s.cand_id
  WHERE s.cand_id IS NULL),
ms{i} AS (
  SELECT p.query_id, p.cand_id, MAX(p.sim6) AS maxsim6
  FROM pairs p
  JOIN selu{p} s ON p.query_id = s.query_id AND p.other_id = s.cand_id
  JOIN rem{i} r ON r.query_id = p.query_id AND r.cand_id = p.cand_id
  GROUP BY 1, 2),
sel{i} AS (
  SELECT query_id, cand_id, CAST({i} AS INT) AS step,
         CAST(score7 AS DOUBLE) / 10000000.0 AS score FROM (
    SELECT r.query_id, r.cand_id,
           {lam_num} * r.rel6 - {mu_num} * ms{i}.maxsim6 AS score7,
           ROW_NUMBER() OVER (PARTITION BY r.query_id
                              ORDER BY {lam_num} * r.rel6 - {mu_num} * ms{i}.maxsim6 DESC,
                                       r.cand_id) AS rn
    FROM rem{i} r JOIN ms{i} ON r.query_id = ms{i}.query_id AND r.cand_id = ms{i}.cand_id)
  WHERE rn = 1),
selu{i} AS (SELECT * FROM selu{p} UNION ALL SELECT * FROM sel{i})"""
    return sql + f"""
SELECT query_id, step, cand_id AS neighbor_id, score FROM selu{k}"""


def embedding_dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension mean / std / min / max over the embedding matrix —
    the normalization statistics every ANN / quantization / whitening
    step consumes (PQ codebooks and SQ8 ranges are built from exactly
    these).  One posexplode scan (JVM-side, no Python) + one hash agg
    keyed by dimension (64 groups — map-side combinable to nothing).

    Exactness: each float element casts to double bit-exactly, then
    floors to a 1e-9-scaled BIGINT ``xi`` (identical IEEE multiply +
    floor on both engines); sums of xi and xi·xi run as exact
    DECIMAL(38,0) at the AGGREGATE input only — per-row arithmetic
    stays in LONG codegen (the corr-matrix pattern, measured ~11×
    faster than per-row DECIMAL(38,12) sums at sf1; assumes |x| ≤ 3 so
    xi·xi ≤ 9e18 fits BIGINT — embeddings are unit-scale).  Mean/std
    are thus the exact moments of the floored values, order-independent
    by construction, reported at 1e-9 resolution.  The std radicand is
    CASE-guarded > 0 on BOTH engines (a constant dimension can round
    q/n − (s/n)² a few ulps negative: NaN in Spark, hard Out-of-Range
    error in DuckDB) with ELSE 0.0 — a constant dimension's true std
    IS 0, unlike the skew/kurt ratios where zero variance is undefined
    and NULLed.  Min/max are order-free already.
    Output: (dim, n, mean, std, min_val, max_val).
    """
    el = embeddings.select(
        F.posexplode(as_double("embedding")).alias("dim", "x")
    ).selectExpr("dim", "x", "CAST(floor(x * 1000000000) AS BIGINT) AS xi")
    agg = el.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr("CAST(xi AS DECIMAL(38,0))")).alias("s"),
        F.sum(F.expr("CAST(xi * xi AS DECIMAL(38,0))")).alias("q"),
        F.min("x").alias("min_val"),
        F.max("x").alias("max_val"),
    )
    return agg.selectExpr(
        "dim",
        "n",
        "floor(CAST(s AS DOUBLE) / n) / 1000000000 AS mean",
        "CASE WHEN CAST(q AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) > 0"
        " THEN floor(sqrt(CAST(q AS DOUBLE) / n"
        " - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))) / 1000000000"
        " ELSE 0.0 END AS std",
        "min_val",
        "max_val",
    )


def embedding_dim_stats_oracle() -> str:
    return """WITH raw AS (
  SELECT unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings),
el AS (
  SELECT dim, x, CAST(floor(x * 1000000000) AS BIGINT) AS xi FROM raw)
SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
  floor(CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)) / 1000000000 AS mean,
  CASE WHEN CAST(SUM(CAST(xi * xi AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)
    - (CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*))
      * (CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)) > 0
  THEN floor(sqrt(CAST(SUM(CAST(xi * xi AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)
    - (CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*))
      * (CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)))) / 1000000000
  ELSE 0.0 END AS std,
  MIN(x) AS min_val, MAX(x) AS max_val
FROM el GROUP BY dim"""


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection + distance-preservation audit
# ---------------------------------------------------------------------------

def jl_projection_audit(
    embeddings: DataFrame,
    out_dims: int = 16,
    pair_mod: int = 17,
    bound_lo: float = 0.4,
    bound_hi: float = 2.5,
) -> DataFrame:
    """Johnson-Lindenstrauss Rademacher projection (d → ``out_dims``)
    with a distance-preservation audit — the DATA-INDEPENDENT
    dimensionality sketch that complements the corpus-trained PCA
    (``embedding_label_pca``): no fit pass, any node can project any
    vector with just the seed, which is what a 1000-executor ingest
    wants.  For R with ±1 entries, (1/k)·‖R(a−b)‖² is unbiased for
    ‖a−b‖², so projected distances estimate true distances with
    relative error ~√(1/k).

    Cross-engine exactness: the sign matrix is derived from the
    engine's md5-h64 (``sign(k, j) = ±1 by h64('k_j') parity``), and
    elements scale to micro-BIGINT, so projected coordinates y_k =
    Σ_j ±x_j are EXACT INTEGERS on both engines; the audited pair
    distances (true and projected) are exact integer sums, and only
    the final ratio is a floored double.  The audit runs on the
    deterministic pair sample ``vec_id % pair_mod == (0, 1)``.

    Scale shape: projection is k per-row integer fold expressions
    (scan-side codegen, no shuffle, no fit); the audit joins the two
    bounded sample sides.  Output (per sampled pair): (id_a, id_b,
    true_d2, proj_d2_scaled, ratio, within_bound).
    """
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    def signed_fold(k: int) -> str:
        # Σ_j sign(k,j)·xi_j over the micro-int elements, one fold per
        # output dim; signs resolve to literal ±1 at plan build time
        terms = []
        for j in range(64):
            import hashlib

            h = int(hashlib.md5(f"jl_{k}_{j}".encode()).hexdigest()[:15], 16)
            sgn = "+" if h % 2 == 0 else "-"
            terms.append(f"{sgn} xi[{j}]")
        return "(" + " ".join(terms).lstrip("+ ") + ")"

    base = embeddings.selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xi0",
    ).selectExpr("vec_id", "xi0 AS xi")
    proj = base.selectExpr(
        "vec_id",
        "xi",
        f"array({', '.join(signed_fold(k) for k in range(out_dims))}) AS y",
    )
    # pair key = vec_id div pair_mod: id_a = m·mod, id_b = m·mod + 1
    # share key m — an EQUI join, never a nested-loop inequality join
    a = proj.where(F.expr(f"vec_id % {pair_mod} = 0")).selectExpr(
        f"vec_id div {pair_mod} AS m", "vec_id AS id_a", "xi AS xa", "y AS ya"
    )
    b = proj.where(F.expr(f"vec_id % {pair_mod} = 1")).selectExpr(
        f"vec_id div {pair_mod} AS m", "vec_id AS id_b", "xi AS xb", "y AS yb"
    )
    pairs = a.join(b, "m")
    true_d2 = (
        "aggregate(zip_with(xa, xb, (p, q) -> (p - q) * (p - q)),"
        " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )
    proj_d2 = (
        "aggregate(zip_with(ya, yb, (p, q) -> (p - q) * (p - q)),"
        " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )
    ratio = f"(CAST({proj_d2} AS DOUBLE) / {out_dims} / CAST({true_d2} AS DOUBLE))"
    return pairs.selectExpr(
        "id_a",
        "id_b",
        f"{true_d2} AS true_d2",
        f"{proj_d2} AS proj_d2_scaled",
        f"CASE WHEN {true_d2} > 0 THEN floor({ratio} * 1000000) / 1000000 END AS ratio",
        f"CASE WHEN {true_d2} > 0 THEN {ratio} >= {bound_lo} AND {ratio} <= {bound_hi} END"
        " AS within_bound",
    )


def jl_projection_audit_oracle(
    out_dims: int = 16,
    pair_mod: int = 17,
    bound_lo: float = 0.4,
    bound_hi: float = 2.5,
) -> str:
    import hashlib

    def signed_fold(k: int, arr: str) -> str:
        terms = []
        for j in range(64):
            h = int(hashlib.md5(f"jl_{k}_{j}".encode()).hexdigest()[:15], 16)
            sgn = "+" if h % 2 == 0 else "-"
            terms.append(f"{sgn} {arr}[{j + 1}]")
        return "(" + " ".join(terms).lstrip("+ ") + ")"

    y_a = ", ".join(signed_fold(k, "xa") for k in range(out_dims))
    y_b = ", ".join(signed_fold(k, "xb") for k in range(out_dims))
    true_d2 = (
        "list_aggregate(list_transform(range(1, 65),"
        " i -> (xa[i] - xb[i]) * (xa[i] - xb[i])), 'sum')"
    )
    proj_d2 = (
        f"list_aggregate(list_transform(range(1, {out_dims + 1}),"
        " i -> (ya[i] - yb[i]) * (ya[i] - yb[i])), 'sum')"
    )
    ratio = f"(CAST({proj_d2} AS DOUBLE) / {out_dims} / CAST({true_d2} AS DOUBLE))"
    return f"""WITH base AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xi
  FROM embeddings),
a AS (SELECT vec_id // {pair_mod} AS m, vec_id AS id_a, xi AS xa
      FROM base WHERE vec_id % {pair_mod} = 0),
b AS (SELECT vec_id // {pair_mod} AS m, vec_id AS id_b, xi AS xb
      FROM base WHERE vec_id % {pair_mod} = 1),
pairs AS (
  SELECT id_a, id_b, xa, xb, [{y_a}] AS ya, [{y_b}] AS yb
  FROM a JOIN b USING (m))
SELECT id_a, id_b,
  CAST({true_d2} AS BIGINT) AS true_d2,
  CAST({proj_d2} AS BIGINT) AS proj_d2_scaled,
  CASE WHEN {true_d2} > 0 THEN floor({ratio} * 1000000) / 1000000 END AS ratio,
  CASE WHEN {true_d2} > 0 THEN {ratio} >= {bound_lo} AND {ratio} <= {bound_hi} END AS within_bound
FROM pairs"""


def hard_negative_mining(embeddings: DataFrame, margin: float = 0.05) -> DataFrame:
    """Triplet mining for contrastive training — per anchor, the
    hardest positive (nearest SAME-label vector) and hardest negative
    (nearest DIFFERENT-label vector), with the triplet margin and a
    ``violates_margin`` flag (sim_neg > sim_pos − margin: the triplets
    a contrastive run actually trains on; everything else is already
    separated).  This is the batch-mining step of every
    embedding-finetuning pipeline (sentence-transformers' mine-hard-
    negatives), asked as one query.

    Shape: the ann_topk_bruteforce scan (broadcast anchors × corpus,
    one cosine per pair) with the per-anchor top-1 taken TWICE under
    different label predicates in the SAME window pass — a conditional
    row_number per class, not two scans.  Exact: cosines floored 6dp,
    ties break on neighbor_id; at 100 TB the anchor side stays a
    broadcast sample and the corpus scan is the one data-sized pass
    (the IVF-bucketed variant swaps in exactly like ann_topk_ivf).

    Output (1 row per anchor): (query_id, anchor_label, pos_id,
    sim_pos, neg_id, sim_neg, triplet_margin, violates_margin).
    """
    emb = fan_out(embeddings).select(
        "vec_id", as_double("embedding").alias("v"), F.col("label").cast("long").alias("lbl")
    ).withColumn("nv", norm(F.col("v")))
    q = emb.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
        F.col("lbl").alias("qlbl"),
    )
    sim = F.round(
        cosine_with_norms(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv")), 6
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "qlbl",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("lbl") == F.col("qlbl")).alias("same"),
            sim.alias("sim"),
        )
    )
    w = Window.partitionBy("query_id", "same").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    best = scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") == 1)
    pos = best.where("same").selectExpr(
        "query_id", "qlbl", "neighbor_id AS pos_id", "sim AS sim_pos"
    )
    neg = best.where("NOT same").selectExpr(
        "query_id AS qid2", "neighbor_id AS neg_id", "sim AS sim_neg"
    )
    return (
        pos.join(neg, pos["query_id"] == neg["qid2"])
        .selectExpr(
            "query_id",
            "qlbl AS anchor_label",
            "pos_id",
            "sim_pos",
            "neg_id",
            "sim_neg",
            "floor((sim_pos - sim_neg) * 1000000) / 1000000 AS triplet_margin",
            f"sim_neg > sim_pos - {margin!r} AS violates_margin",
        )
    )


def hard_negative_mining_oracle(margin: float = 0.05) -> str:
    cos = cosine_sql_duckdb("q.qv", "c.v")
    return f"""WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, CAST(label AS BIGINT) AS lbl FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv, lbl AS qlbl FROM emb WHERE vec_id % {QUERY_MOD} = 0
), scored AS (
  SELECT q.query_id, q.qlbl, c.vec_id AS neighbor_id,
         c.lbl = q.qlbl AS same, round({cos}, 6) AS sim
  FROM q JOIN emb c ON q.query_id <> c.vec_id
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id, same
    ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
), pos AS (
  SELECT query_id, qlbl, neighbor_id AS pos_id, sim AS sim_pos
  FROM best WHERE same AND rank = 1
), neg AS (
  SELECT query_id, neighbor_id AS neg_id, sim AS sim_neg
  FROM best WHERE NOT same AND rank = 1
)
SELECT p.query_id, p.qlbl AS anchor_label, p.pos_id, p.sim_pos,
       n.neg_id, n.sim_neg,
       floor((p.sim_pos - n.sim_neg) * 1000000) / 1000000 AS triplet_margin,
       n.sim_neg > p.sim_pos - {margin!r} AS violates_margin
FROM pos p JOIN neg n ON p.query_id = n.query_id"""


def split_centroid_drift(
    embeddings: DataFrame, holdout_pct: int = 30, rel_tol: float = 0.02
) -> DataFrame:
    """Per-label centroid agreement between the h64 train/holdout
    halves — the embedding-space analogue of ``doc_split_drift_ks``: a
    sound random split leaves each class's two centroids nearly
    parallel (cosine → 1); a centroid cosine that sags flags leakage,
    imbalance, or a class too small to split.  This is the check an
    embedding-training pipeline runs BEFORE trusting holdout metrics.

    Exactness: elements floor to 1e6-scaled BIGINTs scan-side
    (dim_stats discipline), per-(label, split, dim) sums are exact
    BIGINTs, and the cosine between centroids is computed directly on
    the SUM vectors (the 1/n scaling cancels) with DECIMAL(38,0) cross
    products — order-independent end to end, floored 1e-6.  ``ok``
    asserts cosine ≥ 1 − rel_tol (informative; the oracle recomputes
    identically).

    Scale shape: one posexplode scan → one (label, split, dim) hash agg
    (≤ |labels|·2·d rows); the drift readout is a d-row equi-join per
    label.  Output (|labels| rows): (label, n_train, n_holdout,
    centroid_cosine, ok).
    """
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(vec_id AS STRING)", "spark")
    base = fan_out(embeddings).selectExpr(
        "CAST(label AS BIGINT) AS label",
        f"CAST({h} % 100 < {holdout_pct} AS INT) AS hold",
        "embedding",
    )
    el = base.select(
        "label", "hold", F.posexplode(as_double("embedding")).alias("dim", "x")
    ).selectExpr("label", "hold", "dim", "CAST(floor(x * 1000000) AS BIGINT) AS x6")
    sums = el.groupBy("label", "hold", "dim").agg(
        F.sum("x6").cast("long").alias("s"),
        F.count("*").cast("long").alias("n"),
    )
    t = sums.where("hold = 0").selectExpr("label", "dim", "s AS st", "n AS nt")
    hh = sums.where("hold = 1").selectExpr("label", "dim", "s AS sh", "n AS nh")
    per_label = (
        t.join(hh, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.max("nt").cast("long").alias("n_train"),
            F.max("nh").cast("long").alias("n_holdout"),
            F.sum(F.expr("CAST(st AS DECIMAL(38,0)) * sh")).alias("dot"),
            F.sum(F.expr("CAST(st AS DECIMAL(38,0)) * st")).alias("tt"),
            F.sum(F.expr("CAST(sh AS DECIMAL(38,0)) * sh")).alias("hh2"),
        )
    )
    cos = (
        "CAST(dot AS DOUBLE) / sqrt(CAST(tt AS DOUBLE) * CAST(hh2 AS DOUBLE))"
    )
    return per_label.selectExpr(
        "label",
        "n_train",
        "n_holdout",
        f"CASE WHEN tt > 0 AND hh2 > 0 THEN floor({cos} * 1000000) / 1000000 END"
        " AS centroid_cosine",
        f"CASE WHEN tt > 0 AND hh2 > 0 THEN {cos} >= 1 - {rel_tol!r} END AS ok",
    )


def split_centroid_drift_oracle(holdout_pct: int = 30, rel_tol: float = 0.02) -> str:
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(vec_id AS VARCHAR)", "duckdb")
    cos = "CAST(dot AS DOUBLE) / sqrt(CAST(tt AS DOUBLE) * CAST(hh2 AS DOUBLE))"
    return f"""WITH base AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(({h}) % 100 < {holdout_pct} AS INT) AS hold,
         embedding::DOUBLE[] AS v
  FROM embeddings),
el AS (
  SELECT label, hold, generate_subscripts(v, 1) - 1 AS dim,
         CAST(floor(unnest(v) * 1000000) AS BIGINT) AS x6
  FROM base),
sums AS (
  SELECT label, hold, dim, CAST(SUM(x6) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM el GROUP BY 1, 2, 3),
t AS (SELECT label, dim, s AS st, n AS nt FROM sums WHERE hold = 0),
hh AS (SELECT label, dim, s AS sh, n AS nh FROM sums WHERE hold = 1),
per_label AS (
  SELECT t.label, CAST(MAX(nt) AS BIGINT) AS n_train,
         CAST(MAX(nh) AS BIGINT) AS n_holdout,
         SUM(CAST(st AS DECIMAL(38,0)) * sh) AS dot,
         SUM(CAST(st AS DECIMAL(38,0)) * st) AS tt,
         SUM(CAST(sh AS DECIMAL(38,0)) * sh) AS hh2
  FROM t JOIN hh ON t.label = hh.label AND t.dim = hh.dim
  GROUP BY 1)
SELECT label, n_train, n_holdout,
  CASE WHEN tt > 0 AND hh2 > 0 THEN floor({cos} * 1000000) / 1000000 END
    AS centroid_cosine,
  CASE WHEN tt > 0 AND hh2 > 0 THEN {cos} >= 1 - {rel_tol!r} END AS ok
FROM per_label"""


def hard_negative_mining_ivf(
    embeddings: DataFrame, margin: float = 0.05, n_probe: int = IVF_NPROBE
) -> DataFrame:
    """The SCALE path of :func:`hard_negative_mining` — same triplet
    semantics, but candidates come from the ``n_probe`` nearest IVF
    inverted lists per anchor instead of the whole corpus (the
    ann_topk_ivf discipline; the dedup_lsh_recall_sampled lesson: an
    intentionally-exact op whose growth is anchor×corpus needs a
    REGISTERED bucketed twin).  Candidate volume is |anchors|·(probed
    list sizes), the corpus is touched once via an equi-join on the
    list key, and at 100 TB the lists are the bucketing/partition key
    so the probe join prunes to the selected partitions.

    Anchors whose probed lists lack one of the two classes drop out
    (documented; hard positives/negatives live in nearby lists by
    construction — the miss case is the recall the exact twin audits).
    Output (≤1 row per anchor): (query_id, anchor_label, pos_id,
    sim_pos, neg_id, sim_neg, triplet_margin, violates_margin).
    """
    emb = fan_out(embeddings).select(
        "vec_id", as_double("embedding").alias("v"),
        F.col("label").cast("long").alias("lbl"),
    ).withColumn("nv", norm(F.col("v")))
    q = emb.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
        F.col("lbl").alias("qlbl"),
    )
    cents = ivf_centroids(embeddings)
    qc = F.broadcast(q).crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "nq", "qlbl", "label",
        cosine(F.col("qv"), F.col("centroid")).alias("csim"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("label").asc()
    )
    probes = (
        qc.withColumn("crank", F.row_number().over(wp))
        .where(F.col("crank") <= n_probe)
        .select("query_id", "qv", "nq", "qlbl", "label")
    )
    sim = F.round(
        cosine_with_norms(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv")), 6
    )
    scored = (
        F.broadcast(probes)
        .join(
            emb,
            (probes["label"] == emb["lbl"]) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            "qlbl",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("lbl") == F.col("qlbl")).alias("same"),
            sim.alias("sim"),
        )
    )
    w = Window.partitionBy("query_id", "same").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    best = scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") == 1)
    pos = best.where("same").selectExpr(
        "query_id", "qlbl", "neighbor_id AS pos_id", "sim AS sim_pos"
    )
    neg = best.where("NOT same").selectExpr(
        "query_id AS qid2", "neighbor_id AS neg_id", "sim AS sim_neg"
    )
    return (
        pos.join(neg, pos["query_id"] == neg["qid2"])
        .selectExpr(
            "query_id",
            "qlbl AS anchor_label",
            "pos_id",
            "sim_pos",
            "neg_id",
            "sim_neg",
            "floor((sim_pos - sim_neg) * 1000000) / 1000000 AS triplet_margin",
            f"sim_neg > sim_pos - {margin!r} AS violates_margin",
        )
    )


def hard_negative_mining_ivf_oracle(
    margin: float = 0.05, n_probe: int = IVF_NPROBE
) -> str:
    cos_c = cosine_sql_duckdb("q.qv", "c.centroid")
    cos_v = cosine_sql_duckdb("p.qv", "e.v")
    return f"""WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, CAST(label AS BIGINT) AS lbl FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv, lbl AS qlbl FROM emb WHERE vec_id % {QUERY_MOD} = 0
), cents AS (
  SELECT label, list(avg ORDER BY i) AS centroid FROM (
    SELECT label, i, CAST(SUM(CAST(v[i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS avg
    FROM (SELECT vec_id, v, lbl AS label FROM emb), (SELECT unnest(range(1, 65)) AS i) dims
    GROUP BY label, i
  ) GROUP BY label
), probes AS (
  SELECT query_id, qv, qlbl, label FROM (
    SELECT q.query_id, q.qv, q.qlbl, c.label,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {cos_c} DESC, c.label ASC) AS crank
    FROM q CROSS JOIN cents c
  ) WHERE crank <= {n_probe}
), scored AS (
  SELECT p.query_id, p.qlbl, e.vec_id AS neighbor_id,
         e.lbl = p.qlbl AS same, round({cos_v}, 6) AS sim
  FROM probes p JOIN emb e ON p.label = e.lbl AND p.query_id <> e.vec_id
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id, same
    ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
), pos AS (
  SELECT query_id, qlbl, neighbor_id AS pos_id, sim AS sim_pos
  FROM best WHERE same AND rank = 1
), neg AS (
  SELECT query_id, neighbor_id AS neg_id, sim AS sim_neg
  FROM best WHERE NOT same AND rank = 1
)
SELECT p.query_id, p.qlbl AS anchor_label, p.pos_id, p.sim_pos,
       n.neg_id, n.sim_neg,
       floor((p.sim_pos - n.sim_neg) * 1000000) / 1000000 AS triplet_margin,
       n.sim_neg > p.sim_pos - {margin!r} AS violates_margin
FROM pos p JOIN neg n ON p.query_id = n.query_id"""


# ---------------------------------------------------------------------------
# Hybrid retrieval fusion (lexical BM25 + dense cosine, reciprocal-rank)
# ---------------------------------------------------------------------------

#: RRF discount constant (Cormack/Clarke/Büttcher, SIGIR'09 — k=60).
RRF_KAPPA = 60


def doc_hybrid_rrf_topk(
    documents: DataFrame,
    embeddings: DataFrame,
    k: int = 20,
    kappa: int = RRF_KAPPA,
    query_vec_id: int = 0,
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    top-k (``corpus.doc_bm25_topk``, fixed term query) and the dense
    cosine top-k against one query embedding — the RAG-pipeline closer
    where neither signal alone suffices (lexical misses paraphrase,
    dense misses rare exact terms).  RRF (Cormack et al., SIGIR'09)
    needs only RANKS, so the two retrievers stay independent and the
    fusion is rank arithmetic:

        rrf_u(d) = Σ_lists  1_000_000 div (kappa + rank_d)

    computed in EXACT integer micro-units (integer division, BIGINT
    sum — bit-identical on any engine; a float 1/(k+r) sum would hang
    the oracle gate on summation order).  Absent-from-list contributes
    0.  Ties break on doc_id; ``vec_id`` is the embedding of document
    ``doc_id`` (the harness's aligned universes).

    Plan shape (100 TB): each retriever is its own TakeOrdered top-k
    (per-partition heaps, never a global sort); the dense query is a
    1-row broadcast attached by the data-derived-zero-key equi-join
    (never a nested-loop cross); the fusion is a full-outer join of
    two ≤k-row frames plus a ≤2k-row readout — nothing after the
    retrievers is data-sized.  Rank columns come from
    ``ranked_top_k``'s partitioned window (WindowGroupLimit-safe).
    """
    from twitter_followers_patterns_mapreduce_spark.operators.corpus import (
        doc_bm25_topk,
    )

    lex = doc_bm25_topk(documents, k=k)
    lex_ranked = ranked_top_k(
        lex, [F.col("bm25").desc(), F.col("doc_id").asc()], k, "doc_id"
    ).select("doc_id", F.col("rank").alias("lex_rank"))

    emb = (
        fan_out(embeddings)
        .select("vec_id", as_double("embedding").alias("v"))
        .withColumn("nv", norm(F.col("v")))
    )
    qv = emb.where(F.col("vec_id") == query_vec_id).selectExpr(
        "v AS qv", "nv AS nq", "pmod(vec_id, 1) AS _k"
    )
    sim = F.round(
        cosine_with_norms(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv")), 6
    )
    scored = (
        emb.withColumn("_k", F.pmod(F.col("vec_id"), F.lit(1)))
        .join(F.broadcast(qv), "_k")
        .select(F.col("vec_id").alias("doc_id"), sim.alias("sim"))
    )
    dense_ranked = ranked_top_k(
        scored, [F.col("sim").desc(), F.col("doc_id").asc()], k, "doc_id"
    ).select("doc_id", F.col("rank").alias("dense_rank"))

    fused = lex_ranked.join(dense_ranked, "doc_id", "full_outer")
    return (
        fused.selectExpr(
            "doc_id",
            "CAST(lex_rank AS INT) AS lex_rank",
            "CAST(dense_rank AS INT) AS dense_rank",
            f"CAST(coalesce(1000000 div ({kappa} + lex_rank), 0)"
            f" + coalesce(1000000 div ({kappa} + dense_rank), 0) AS BIGINT) AS rrf_u",
        )
        .orderBy(F.col("rrf_u").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def doc_hybrid_rrf_topk_oracle(
    k: int = 20, kappa: int = RRF_KAPPA, query_vec_id: int = 0
) -> str:
    from twitter_followers_patterns_mapreduce_spark.operators.corpus import (
        doc_bm25_topk_oracle,
    )

    cos = cosine_sql_duckdb("q.qv", "e.v")
    return f"""WITH lex0 AS ({doc_bm25_topk_oracle(k=k)}),
lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS lex_rank
  FROM lex0),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM emb WHERE vec_id = {query_vec_id}),
scored AS (
  SELECT e.vec_id AS doc_id, round({cos}, 6) AS sim
  FROM emb e CROSS JOIN q),
dense AS (
  SELECT doc_id, dense_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id ASC) AS dense_rank
    FROM scored)
  WHERE dense_rank <= {k})
SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
       CAST(l.lex_rank AS INT) AS lex_rank,
       CAST(d.dense_rank AS INT) AS dense_rank,
       CAST(COALESCE(1000000 // ({kappa} + l.lex_rank), 0)
            + COALESCE(1000000 // ({kappa} + d.dense_rank), 0) AS BIGINT) AS rrf_u
FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
ORDER BY rrf_u DESC, doc_id ASC LIMIT {k}"""


def ann_topk_ivfsq(
    embeddings: DataFrame, k: int = 5, n_probe: int = IVF_NPROBE, rerank: int = 20
) -> DataFrame:
    """IVF + SQ8 composed — the full FAISS-style retrieval stack as one
    plan: (1) coarse-quantize by centroid and probe only the
    ``n_probe`` nearest inverted lists per query (the
    :func:`ann_topk_ivf` stage — at 100 TB the corpus is bucketed by
    list so the probe join prunes partitions), (2) score ONLY the
    probed lists on int8 codes (the :func:`ann_topk_pq` stage — a
    quarter of the bytes of float32 on the bandwidth-bound scan),
    (3) exact-rerank the top-``rerank`` shortlist at full precision.
    Compared to its parents the candidate stage touches
    |probed lists| · code-width bytes instead of EITHER the whole
    corpus (SQ8 alone) or full-precision floats (IVF alone) — the
    composition, not either trick, is what serves billion-vector
    corpora from RAM.

    Determinism: centroid means are DECIMAL-exact, codes are exact
    small integers, rank windows tie-break by id — reproducible
    bit-for-bit in the oracle."""
    emb = fan_out(embeddings).select("vec_id", as_double("embedding").alias("v"))
    amax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    scale = F.when(amax > F.lit(0.0), F.lit(127.0) / amax).otherwise(F.lit(1.0))
    lbl = embeddings.select("vec_id", "label")
    # one coded table feeds the probe stage, the candidate scan, and
    # both exact-rerank sides
    coded = (
        emb.select("vec_id", "v", scale.alias("scale"), norm(F.col("v")).alias("nv"))
        .withColumn("codes", _int8_codes(F.col("v"), F.col("scale")))
        .join(lbl, "vec_id")
        .localCheckpoint(eager=False)
    )
    q = coded.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("scale").alias("q_scale"),
        F.col("nv").alias("nq"),
        F.col("codes").alias("q_codes"),
    )
    cents = ivf_centroids(embeddings)
    qc = F.broadcast(q).crossJoin(F.broadcast(cents)).select(
        "query_id",
        "q_scale",
        "nq",
        "q_codes",
        "label",
        cosine(F.col("qv"), F.col("centroid")).alias("csim"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("label").asc()
    )
    probes = (
        qc.withColumn("crank", F.row_number().over(wp))
        .where(F.col("crank") <= n_probe)
        .select("query_id", "q_scale", "nq", "q_codes", "label")
    )
    adot = dot(F.col("q_codes"), F.col("codes"))
    approx = (adot / (F.col("q_scale") * F.col("scale"))) / (F.col("nq") * F.col("nv"))
    cands = (
        F.broadcast(probes)
        .join(
            coded,
            (probes["label"] == coded["label"])
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), approx.alias("approx_sim")
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cands.withColumn("srank", F.row_number().over(w1))
        .where(F.col("srank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qx = coded.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nv").alias("nq")
    )
    cx = coded.select(F.col("vec_id").alias("neighbor_id"), "v", "nv")
    sim = F.round(cosine_with_norms(F.col("qv"), F.col("v"), F.col("nq"), F.col("nv")), 6)
    rescored = (
        shortlist.join(cx, "neighbor_id")
        .join(F.broadcast(qx), "query_id")
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def ann_topk_ivfsq_oracle(
    k: int = 5, n_probe: int = IVF_NPROBE, rerank: int = 20
) -> str:
    cos_c = cosine_sql_duckdb("q.qv", "c.centroid")
    cos_v = cosine_sql_duckdb("s.qv", "s.v")
    return f"""WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, label
  FROM embeddings
), coded AS (
  SELECT vec_id, v, label,
    CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
         THEN 127.0 / list_max(list_transform(v, x -> abs(x))) ELSE 1.0 END AS scale,
    sqrt(list_dot_product(v, v)) AS nv
  FROM emb
), coded2 AS (
  SELECT vec_id, v, label, scale, nv,
    list_transform(v, x -> greatest(least(floor(x * scale + 0.5), 127.0), -127.0)) AS codes
  FROM coded
), q AS (
  SELECT vec_id AS query_id, v AS qv, scale AS q_scale, nv AS nq, codes AS q_codes
  FROM coded2 WHERE vec_id % {QUERY_MOD} = 0
), cents AS (
  SELECT label, list(avg ORDER BY i) AS centroid FROM (
    SELECT label, i, CAST(SUM(CAST(v[i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS avg
    FROM emb, (SELECT unnest(range(1, 65)) AS i) dims
    GROUP BY label, i
  ) GROUP BY label
), probes AS (
  SELECT query_id, q_scale, nq, q_codes, label FROM (
    SELECT q.query_id, q.q_scale, q.nq, q.q_codes, c.label,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {cos_c} DESC, c.label ASC) AS crank
    FROM q CROSS JOIN cents c
  ) WHERE crank <= {n_probe}
), cands AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
    (list_dot_product(p.q_codes, c.codes) / (p.q_scale * c.scale)) / (p.nq * c.nv)
      AS approx_sim
  FROM probes p JOIN coded2 c ON p.label = c.label AND p.query_id <> c.vec_id
), shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY approx_sim DESC, neighbor_id ASC) AS srank
    FROM cands) WHERE srank <= {rerank}
), rescored AS (
  SELECT s.query_id, s.neighbor_id, round({cos_v}, 6) AS sim FROM (
    SELECT sl.query_id, sl.neighbor_id, qx.qv, cx.v
    FROM shortlist sl
    JOIN (SELECT vec_id AS neighbor_id, v FROM coded2) cx USING (neighbor_id)
    JOIN (SELECT vec_id AS query_id, v AS qv FROM coded2) qx USING (query_id)
  ) s
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM rescored) WHERE rank <= {k}"""
