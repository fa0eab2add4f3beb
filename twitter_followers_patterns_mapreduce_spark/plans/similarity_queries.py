"""Named similarity-search queries over ``embeddings``.

Brute-force vs sign-LSH is the reference's RS-join vs Rep-join lesson
re-expressed for vector search (one logical query, two physical
strategies — ``README.md:79-81``): the brute-force baselines are the
documented exact O(n²) paths; the LSH variants are the equi-join scale
paths whose bucket id becomes the shuffle/bucketing key at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from twitter_followers_patterns_mapreduce_spark.operators import similarity as S
from twitter_followers_patterns_mapreduce_spark.plans.registry import register
from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table


@register(
    "ann_topk_bruteforce",
    oracle=S.ann_topk_bruteforce_oracle(k=10),
    description="exact top-10 cosine neighbors per query vector (broadcast query side)",
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ann_topk_bruteforce(load_table(spark, sf_dir, "embeddings"), k=10)


@register(
    "embedding_hard_negatives",
    oracle=S.hard_negative_mining_oracle(margin=0.05),
    description="triplet mining for contrastive training: per anchor the hardest "
    "same-label positive and hardest cross-label negative from ONE broadcast-anchor "
    "scan (conditional per-class top-1 in a single window pass), with the triplet "
    "margin and the violates-margin flag a finetuning run trains on",
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.hard_negative_mining(load_table(spark, sf_dir, "embeddings"), margin=0.05)


@register(
    "embedding_hard_negatives_ivf",
    oracle=S.hard_negative_mining_ivf_oracle(margin=0.05),
    description="the triplet miner's SCALE path: candidates restricted to each "
    "anchor's 2 nearest IVF inverted lists (equi-join on the list key — the "
    "bucket/partition key at 100 TB) instead of the whole corpus; same per-class "
    "top-1 window semantics as the exact twin",
)
def embedding_hard_negatives_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.hard_negative_mining_ivf(
        load_table(spark, sf_dir, "embeddings"), margin=0.05
    )


@register(
    "ann_topk_lsh",
    oracle=S.ann_topk_lsh_oracle(k=5),
    description="approximate top-5 neighbors via sign-LSH bucket equi-join",
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ann_topk_lsh(load_table(spark, sf_dir, "embeddings"), k=5)


@register(
    "ann_topk_ivf",
    oracle=S.ann_topk_ivf_oracle(k=5),
    description="IVF ANN: label-centroid coarse quantizer, probe 2 nearest lists, exact top-5 within",
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ann_topk_ivf(load_table(spark, sf_dir, "embeddings"), k=5)


@register(
    "embedding_top_pairs",
    oracle=S.embedding_top_pairs_oracle(top_n=50),
    description="exact global top-50 most-similar pairs (documented brute-force baseline)",
)
def embedding_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_top_pairs(load_table(spark, sf_dir, "embeddings"), top_n=50)


@register(
    "embedding_top_pairs_blocked",
    oracle=S.embedding_top_pairs_oracle(top_n=50),
    description="exact top-50 pairs via block-pair BLAS matmul (applyInPandas) — "
    "same answer as the brute-force baseline at ~10x the throughput",
)
def embedding_top_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_top_pairs_blocked(load_table(spark, sf_dir, "embeddings"), top_n=50)


@register(
    "embedding_top_pairs_lsh",
    oracle=S.embedding_top_pairs_lsh_oracle(top_n=50),
    description="top-50 similar pairs restricted to sign-LSH buckets — equi-join scale path",
)
def embedding_top_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_top_pairs_lsh(load_table(spark, sf_dir, "embeddings"), top_n=50)


@register(
    "embedding_label_pca",
    # The iterative eigen-solve IS oracle-checkable after all: the power
    # iteration unrolls into a CTE chain exactly like the k-means
    # oracle, float64 on both sides, round(6) outputs — the engine's
    # last rows-only query graduated to the full hash gate (numpy.eigh
    # differential remains in tests/test_similarity_pca.py).
    oracle=S.label_principal_component_oracle(),
    description="per-label top principal component via applyInPandas power iteration — "
    "the grouped-Pandas escape hatch for genuinely non-relational semantics, held to "
    "the full hash gate via an unrolled power-iteration oracle",
)
def embedding_label_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.label_principal_component(load_table(spark, sf_dir, "embeddings"))


from twitter_followers_patterns_mapreduce_spark.operators import clustering as KM  # noqa: E402


@register(
    "embedding_kmeans",
    oracle=KM.kmeans_fit_oracle(k=8, iters=2),
    description="deterministic Lloyd k-means (fixed init/iters, DECIMAL means, "
    "grid-floored argmin) — the real IVF coarse-quantizer trainer; oracle = "
    "unrolled CTE chain",
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return KM.kmeans_fit(load_table(spark, sf_dir, "embeddings"), k=8, iters=2)


@register(
    "ann_topk_ivf_kmeans",
    oracle=KM.ann_topk_ivf_kmeans_oracle(k=5, n_probe=2),
    description="end-to-end IVF ANN over the k-means-trained quantizer: train -> "
    "assign -> probe -> exact top-k in probed lists, one DAG",
)
def ann_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return KM.ann_topk_ivf_kmeans(load_table(spark, sf_dir, "embeddings"), k=5, n_probe=2)


@register(
    "embedding_quantize_stats",
    oracle=S.EMBEDDING_QUANTIZE_ORACLE,
    description="per-vector int8 quantization fidelity (scale, max abs / mean sq "
    "reconstruction error, saturated-code count) — scan-side higher-order functions, zero shuffles",
)
def embedding_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_quantize_stats(load_table(spark, sf_dir, "embeddings"))


@register(
    "ann_topk_pq",
    oracle=S.ann_topk_pq_oracle(k=5, rerank=20),
    description="SQ8 two-stage ANN: int8-code candidate scoring (4x smaller scan at "
    "scale) -> exact-cosine rerank of the per-query shortlist; bit-deterministic",
)
def ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ann_topk_pq(load_table(spark, sf_dir, "embeddings"), k=5, rerank=20)


@register(
    "ann_recall_at_k",
    oracle=S.ann_recall_at_k_oracle(k=5),
    description="recall@5 of the sign-LSH probe vs brute-force ground truth, "
    "per query vector — the ANN quality audit (truth only on the query sample)",
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ann_recall_at_k(load_table(spark, sf_dir, "embeddings"), k=5)


@register(
    "embedding_logreg_fit",
    oracle=KM.logreg_fit_oracle(target_label=0, iters=3, lr=0.5),
    description="distributed supervised trainer: full-batch logistic-regression GD "
    "(3 iterations, label==0 vs rest) — model as a (dim, w) table, broadcast-join dot "
    "products, DECIMAL gradient reductions; the allreduce is a d-row hash agg",
)
def embedding_logreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return KM.logreg_fit(load_table(spark, sf_dir, "embeddings"), target_label=0, iters=3, lr=0.5)


@register(
    "embedding_logreg_score",
    oracle=KM.logreg_score_oracle(target_label=0, iters=3, lr=0.5),
    description="batch inference with the in-DAG-trained logreg: every vector scored "
    "sigmoid(w.x+b) and thresholded into a keep/drop verdict — the classifier-based "
    "curation filter itself (model broadcast is d+1 rows)",
)
def embedding_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return KM.logreg_score(load_table(spark, sf_dir, "embeddings"), target_label=0, iters=3, lr=0.5)


@register(
    "embedding_logreg_eval",
    oracle=KM.logreg_eval_oracle(target_label=0, iters=3, lr=0.5),
    description="exact model evaluation: ROC-AUC by the grouped average-rank method "
    "(windows run over the bounded 6dp score histogram, never the rows), accuracy at "
    "0.5, Brier score — all reductions DECIMAL-exact",
)
def embedding_logreg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return KM.logreg_eval(load_table(spark, sf_dir, "embeddings"), target_label=0, iters=3, lr=0.5)


@register(
    "embedding_split_drift",
    oracle=S.split_centroid_drift_oracle(holdout_pct=30, rel_tol=0.02),
    description="per-label centroid cosine between the h64 train/holdout halves — "
    "the embedding-space split-soundness check (a sagging cosine flags leakage or "
    "a class too small to split); exact 1e6-integer element sums, cosine on the "
    "sum vectors (the 1/n cancels), DECIMAL cross products",
)
def embedding_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.split_centroid_drift(
        load_table(spark, sf_dir, "embeddings"), holdout_pct=30, rel_tol=0.02
    )


@register(
    "embedding_conformal_coverage",
    oracle=KM.conformal_coverage_oracle(target_label=0, alpha=0.1, cal_pct=50),
    description="split-conformal prediction audit: h64 calibration split, the "
    "(1-alpha)(n+1)/n nonconformity quantile from a bounded-histogram window, and "
    "realized test coverage + average prediction-set size (the efficiency check that "
    "says whether the distribution-free guarantee is vacuous)",
)
def embedding_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return KM.conformal_coverage(
        load_table(spark, sf_dir, "embeddings"), target_label=0, alpha=0.1, cal_pct=50
    )


@register(
    "ann_radius_search",
    oracle=S.ann_radius_search_oracle(),
    description="range (radius) similarity search: all corpus vectors within "
    "cosine >= 0.30 of each query — broadcast query side, one shuffle-free "
    "corpus scan, threshold filter instead of a rank window (the data-dependent "
    "dual of top-k)",
)
def ann_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ann_radius_search(load_table(spark, sf_dir, "embeddings"))


@register(
    "ann_mmr_topk",
    oracle=S.mmr_diversified_topk_oracle(),
    description="Maximal Marginal Relevance diversified top-5 from the top-20 cosine "
    "candidates (lam=0.7): the greedy recurrence unrolled as k-1 joint DataFrame "
    "passes (anti-join selected, max-sim agg over precomputed candidate pairs, "
    "argmax window) — sequential in k, fully parallel across queries, no collect",
)
def ann_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.mmr_diversified_topk(load_table(spark, sf_dir, "embeddings"))


@register(
    "embedding_dim_stats",
    oracle=S.embedding_dim_stats_oracle(),
    description="per-dimension mean/std/min/max of the embedding matrix (the "
    "normalization stats PQ/SQ8/whitening consume): one posexplode scan + one "
    "64-group hash agg; DECIMAL(38,12) sums make the float reduction exact and "
    "order-independent",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_dim_stats(load_table(spark, sf_dir, "embeddings"))


@register(
    "embedding_logreg_calibration",
    oracle=KM.logreg_calibration_oracle(target_label=0, iters=3, lr=0.5, n_bins=10),
    description="reliability diagram + per-bin ECE for the in-DAG-trained logreg "
    "curation filter: scan-side literal-model scoring, 10-bin floor binning on the "
    "1e-6 score grid, one |bins|-row agg + the house 1-row totals cross — how you "
    "pick a keep-threshold without labeling more data",
)
def embedding_logreg_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return KM.logreg_calibration(
        load_table(spark, sf_dir, "embeddings"), target_label=0, iters=3, lr=0.5, n_bins=10
    )


@register(
    "embedding_nearest_centroid",
    oracle=KM.nearest_centroid_eval_oracle(),
    description="nearest-centroid (Rocchio) multiclass eval as a confusion matrix: "
    "one aggregate trains the |labels|*d centroid table (broadcast dim join), "
    "distances are exact micro-BIGINT integers so the argmin has no float ties",
)
def embedding_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return KM.nearest_centroid_eval(load_table(spark, sf_dir, "embeddings"))


@register(
    "embedding_jl_audit",
    oracle=S.jl_projection_audit_oracle(out_dims=16, pair_mod=17),
    description="Johnson-Lindenstrauss Rademacher projection 64->16 with a "
    "distance-preservation audit on deterministic pairs: signs from md5-h64 parity "
    "so projected coordinates are exact integers on both engines — the "
    "data-independent vector sketch next to the corpus-trained PCA",
)
def embedding_jl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.jl_projection_audit(load_table(spark, sf_dir, "embeddings"))


@register(
    "embedding_uncertainty_sample",
    oracle=KM.uncertainty_sample_oracle(k=25, target_label=0),
    description="active-learning uncertainty sampling: the 25 vectors closest to the "
    "logreg 0.5 decision boundary (the batch a labeling budget buys next) — gated "
    "6dp scores, deterministic margin + vec_id ordering, TakeOrdered top-k",
)
def embedding_uncertainty_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return KM.uncertainty_sample(
        load_table(spark, sf_dir, "embeddings"), k=25, target_label=0
    )


@register(
    "doc_hybrid_rrf_topk",
    oracle=S.doc_hybrid_rrf_topk_oracle(k=20),
    description="hybrid retrieval fusion (the RAG closer): reciprocal-rank fusion of "
    "the BM25 lexical top-20 and the dense cosine top-20 against one query embedding "
    "- rrf_u = sum of 1000000 div (60 + rank) in EXACT integer micro-units (float "
    "1/(k+r) sums would hang the gate on summation order); two TakeOrdered "
    "retrievers, a 1-row broadcast query via the zero-key equi-join, one <=2k-row "
    "full-outer fusion - nothing after the retrievers is data-sized",
)
def doc_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.doc_hybrid_rrf_topk(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        k=20,
    )


@register(
    "ann_topk_ivfsq",
    oracle=S.ann_topk_ivfsq_oracle(k=5, rerank=20),
    description="IVF + SQ8 composed (the full FAISS-style retrieval stack): probe "
    "the 2 nearest inverted lists per query, score ONLY the probed lists on int8 "
    "codes, exact-rerank the top-20 shortlist at full precision — the candidate "
    "scan touches |probed lists| x code-width bytes instead of either the whole "
    "corpus (SQ8 alone) or full floats (IVF alone); DECIMAL-exact centroids, "
    "integer codes, id tie-breaks",
)
def ann_topk_ivfsq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ann_topk_ivfsq(load_table(spark, sf_dir, "embeddings"), k=5, rerank=20)
