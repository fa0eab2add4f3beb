"""Hand-computed goldens for similarity search (cosine math, top-k
ranking, sign-LSH bucketing) on tiny embedding tables.

QUERY_MOD=50 ⇒ vec_id 0 is a query vector in all fixtures.
"""

from __future__ import annotations

import math

import pytest

from twitter_followers_patterns_mapreduce_spark.operators import similarity as S

SCHEMA = "vec_id LONG, embedding ARRAY<FLOAT>"


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),   # identical to query → sim 1.0
        (2, [0.0, 1.0]),   # orthogonal → sim 0.0
        (3, [1.0, 1.0]),   # 45° → sim 1/√2
    ]
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_bruteforce_topk_goldens(emb):
    rows = S.ann_topk_bruteforce(emb, k=3).collect()
    got = [(r["rank"], r["neighbor_id"], r["sim"]) for r in rows if r["query_id"] == 0]
    assert got == [
        (1, 1, 1.0),
        (2, 3, round(1 / math.sqrt(2), 6)),
        (3, 2, 0.0),
    ]


def test_lsh_bucket_separation(spark):
    """Sign buckets: [x, -y] → bucket 1; [-x, y] → bucket 2.  Only the
    same-bucket neighbor is reachable via the LSH path."""
    rows = [
        (0, [1.0, -1.0]),
        (1, [2.0, -2.0]),   # same bucket, sim 1.0
        (2, [-1.0, 1.0]),   # other bucket, invisible to LSH
    ]
    emb = spark.createDataFrame(rows, schema=SCHEMA)
    got = [(r["neighbor_id"], r["sim"]) for r in S.ann_topk_lsh(emb, k=5).collect()]
    assert got == [(1, 1.0)]


def test_embedding_top_pairs_goldens(emb):
    rows = S.embedding_top_pairs(emb, top_n=2).collect()
    got = [(r["rank"], r["vec_a"], r["vec_b"], r["sim"]) for r in rows]
    s = round(1 / math.sqrt(2), 6)
    assert got == [(1, 0, 1, 1.0), (2, 0, 3, s)]


def test_lsh_pairs_subset_of_exact(emb):
    """Bucket-restricted pairs are a subset of all pairs, with identical
    sims for the pairs both report."""
    exact = {(r["vec_a"], r["vec_b"]): r["sim"] for r in S.embedding_top_pairs(emb, 100).collect()}
    lsh = {(r["vec_a"], r["vec_b"]): r["sim"] for r in S.embedding_top_pairs_lsh(emb, 100).collect()}
    assert set(lsh) <= set(exact)
    assert all(exact[p] == v for p, v in lsh.items())


def test_ivf_probes_only_nearest_centroid(spark):
    """Two well-separated label clusters; with n_probe=1 the query only
    sees its own cluster's inverted list."""
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.8, 0.2], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
    ]
    emb = spark.createDataFrame(rows, schema="vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    got = [
        (r["rank"], r["neighbor_id"], r["sim"])
        for r in S.ann_topk_ivf(emb, k=3, n_probe=1).collect()
    ]
    s1 = round(0.9 / math.sqrt(0.9**2 + 0.1**2), 6)
    s2 = round(0.8 / math.sqrt(0.8**2 + 0.2**2), 6)
    # only label-0 members (1, 2) are candidates — 3 and 4 are unprobed
    assert got == [(1, 1, s1), (2, 2, s2)]


def test_ivf_centroids_are_elementwise_means(spark):
    rows = [(0, [2.0, 4.0], 7), (1, [4.0, 8.0], 7)]
    emb = spark.createDataFrame(rows, schema="vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    cents = {r["label"]: r["centroid"] for r in S.ivf_centroids(emb).collect()}
    assert cents[7] == [3.0, 6.0]


def test_blocked_top_pairs_matches_bruteforce(spark):
    """The block-pair BLAS path must return EXACTLY the brute-force
    result — same pairs, same ranks, same 6-dp sims (the rounding
    absorbs BLAS-vs-sequential-fold ulp noise)."""
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    brute = [tuple(r) for r in S.embedding_top_pairs(emb, top_n=20).collect()]
    blocked = [tuple(r) for r in S.embedding_top_pairs_blocked(emb, top_n=20, n_blocks=4).collect()]
    assert brute == blocked


def test_blocked_top_pairs_handles_more_blocks_than_rows(spark):
    rows = [(i, [float(i), 1.0]) for i in range(3)]
    emb = spark.createDataFrame(rows, schema="vec_id LONG, embedding ARRAY<FLOAT>")
    got = S.embedding_top_pairs_blocked(emb, top_n=5, n_blocks=8).collect()
    # C(3,2) = 3 pairs, every one present exactly once
    assert len(got) == 3
    assert sorted((r["vec_a"], r["vec_b"]) for r in got) == [(0, 1), (0, 2), (1, 2)]


def test_quantize_stats_numpy_differential(spark):
    import numpy as np

    from twitter_followers_patterns_mapreduce_spark.operators.similarity import (
        embedding_quantize_stats,
    )

    rng = np.random.RandomState(7)
    vecs = [rng.uniform(-2, 2, 8).astype(np.float32) for _ in range(5)] + [
        np.zeros(8, dtype=np.float32)  # zero vector: scale falls back to 1.0
    ]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        schema="vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {r["vec_id"]: r for r in embedding_quantize_stats(df).collect()}
    for i, v in enumerate(vecs):
        vd = v.astype(np.float64)
        amax = np.abs(vd).max()
        scale = 127.0 / amax if amax > 0 else 1.0
        q = np.clip(np.floor(vd * scale + 0.5), -127.0, 127.0)
        err = np.abs(vd - q / scale)
        assert got[i]["dim"] == 8
        assert got[i]["max_abs_err"] == round(float(err.max()), 6)
        assert abs(got[i]["mean_sq_err"] - float((err * err).sum() / 8)) < 1e-9
        assert got[i]["n_saturated"] == int((np.abs(q) >= 127.0).sum())
    assert got[5]["max_abs_err"] == 0.0 and got[5]["scale"] == 1.0


def test_pq_topk_matches_bruteforce_after_rerank(spark):
    """With rerank covering the whole corpus, SQ8 + exact rerank must
    equal the exact brute-force answer — quantization error can reorder
    the shortlist but never the reranked top-k."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, schema=SCHEMA)
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in S.ann_topk_bruteforce(emb, k=5).collect()
    }
    pq = {
        (r.query_id, r.rank): r.neighbor_id
        for r in S.ann_topk_pq(emb, k=5, rerank=59).collect()
    }
    assert pq == exact


def test_pq_codes_are_saturating_integers(emb):
    out = S.ann_topk_pq(emb, k=3, rerank=3).collect()
    # identical vector still ranks first after int8 round-trip
    top = [r for r in out if r.query_id == 0 and r.rank == 1]
    assert top and top[0].neighbor_id == 1 and top[0].sim == 1.0


def test_ann_radius_search_matches_manual(spark):
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.similarity import (
        QUERY_MOD,
        ann_radius_search,
    )

    # vec 0 is a query (0 % QUERY_MOD == 0); 1 is near it, 2 is orthogonal
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, schema="vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    got = {
        (r["query_id"], r["neighbor_id"]): r["sim"]
        for r in ann_radius_search(df, tau=0.5).collect()
    }
    want = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert set(got) == {(0, 1)}
    assert abs(got[(0, 1)] - round(want, 6)) < 1e-9


def test_ann_radius_search_threshold_excludes(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.similarity import (
        ann_radius_search,
    )

    rows = [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0)]
    df = spark.createDataFrame(rows, schema="vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    assert ann_radius_search(df, tau=0.5).count() == 0


def test_mmr_prefers_diversity_over_near_duplicate(spark):
    import math
    import struct

    from twitter_followers_patterns_mapreduce_spark.operators.similarity import (
        mmr_diversified_topk,
    )

    def f32(v):
        return [struct.unpack("f", struct.pack("f", x))[0] for x in v]

    def cos6(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return int(d / (na * nb) * 1e6 + 0.5)  # HALF_UP on positive values

    vecs = {
        0: [1.0, 0.0, 0.0],       # query (0 % QUERY_MOD == 0)
        1: [0.95, 0.05, 0.0],     # top relevance
        2: [0.949, 0.051, 0.0],   # near-duplicate of 1
        3: [0.99027, 0.0, 0.13917],  # same query-angle as 2, different plane
        4: [0.0, 1.0, 0.0],       # low relevance
    }
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in vecs.items()],
        schema="vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    got = {
        r["step"]: (r["neighbor_id"], r["score"])
        for r in mmr_diversified_topk(df, k=3, m=4, lam_num=5, mu_num=5).collect()
    }
    v = {i: f32(x) for i, x in vecs.items()}
    rel = {i: cos6(v[0], v[i]) for i in (1, 2, 3, 4)}
    assert got[1] == (1, rel[1] / 1e6)  # step 1: pure relevance argmax
    # step 2: integer objective score7 = 5·rel6 − 5·maxsim6 (λ=0.5); 2 and 3
    # sit at the SAME angle from the query but 2 is a near-dup of the picked 1
    # while 3 lives in another plane — the penalty flips the order
    s7 = {i: 5 * rel[i] - 5 * cos6(v[i], v[1]) for i in (2, 3, 4)}
    best = max(((s, -i) for i, s in s7.items()))
    assert got[2] == (-best[1], best[0] / 1e7)
    assert got[2][0] == 3  # the diverse vector wins over the near-dup
    assert len(got) == 3 and got[3][0] in (2, 4)


def test_mmr_step_counts_and_distinct_picks(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.similarity import (
        mmr_diversified_topk,
    )

    rows = [(i, [float(i % 7 + 1), float((i * 3) % 5), float((i * 7) % 11)], 0) for i in range(12)]
    df = spark.createDataFrame(rows, schema="vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    out = mmr_diversified_topk(df, k=4, m=8).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, picks in per_q.items():
        assert sorted(p["step"] for p in picks) == [1, 2, 3, 4]
        ids = [p["neighbor_id"] for p in picks]
        assert len(set(ids)) == 4 and qid not in ids


def test_conformal_coverage_guarantee_and_determinism(spark):
    from twitter_followers_patterns_mapreduce_spark.operators import clustering as KM
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    (row,) = KM.conformal_coverage(emb, target_label=0, alpha=0.1, cal_pct=50).collect()
    assert row["n_cal"] + row["n_test"] == emb.count()
    assert 0.0 <= row["qhat"] <= 1.0
    # distribution-free guarantee: coverage ~ 0.9 in expectation; allow
    # finite-sample slack but catch a broken threshold (coverage ~ 0.5)
    assert row["coverage"] >= 0.8
    assert 0.0 <= row["avg_set_size"] <= 2.0
    assert row["meets_target"] == (row["coverage"] >= 0.9 - 1e-9)
    (again,) = KM.conformal_coverage(emb, target_label=0, alpha=0.1, cal_pct=50).collect()
    assert again == row  # h64 split + floored scores: fully deterministic


def test_hard_negative_mining_picks_and_margin_flag(spark):
    """Anchor at (1,0): nearest same-label is id 1, but the label-1
    vector id 3 sits even closer — the violating triplet the miner
    exists to surface."""
    from twitter_followers_patterns_mapreduce_spark.operators.similarity import (
        hard_negative_mining,
    )

    rows = [
        (0, [1.0, 0.0], 0),    # anchor (vec_id % 50 == 0)
        (1, [1.0, 0.2], 0),    # hardest positive (cos ~ 0.9806)
        (2, [0.0, 1.0], 0),    # far positive
        (3, [1.0, 0.1], 1),    # hardest negative (cos ~ 0.9950) -> violation
        (4, [-1.0, 0.0], 1),   # far negative
    ]
    emb = spark.createDataFrame(
        rows, schema="vec_id LONG, embedding ARRAY<DOUBLE>, label LONG"
    )
    (row,) = hard_negative_mining(emb, margin=0.05).collect()
    assert (row["query_id"], row["anchor_label"]) == (0, 0)
    assert (row["pos_id"], row["neg_id"]) == (1, 3)
    assert row["sim_neg"] > row["sim_pos"]
    assert row["triplet_margin"] < 0
    assert row["violates_margin"]


def test_split_centroid_drift_parallel_vs_rotated(spark):
    """Label 0: every vector along (1, 0) in both halves -> cosine 1.
    Label 1: construct so the two h64 halves point along different
    axes -> cosine must sag and the ok flag must drop."""
    import hashlib

    from twitter_followers_patterns_mapreduce_spark.operators.similarity import (
        split_centroid_drift,
    )

    def hold(vid, pct=50):
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16) % 100 < pct

    rows = []
    for vid in range(40):
        if vid % 2 == 0:
            rows.append((vid, [1.0, 0.0], 0))  # label 0: same direction everywhere
        else:
            # label 1: holdout half along y, train half along x
            v = [0.0, 1.0] if hold(vid) else [1.0, 0.0]
            rows.append((vid, v, 1))
    emb = spark.createDataFrame(
        rows, schema="vec_id LONG, embedding ARRAY<DOUBLE>, label LONG"
    )
    out = {r["label"]: r for r in split_centroid_drift(emb, holdout_pct=50).collect()}
    assert out[0]["centroid_cosine"] == 1.0 and out[0]["ok"]
    assert out[1]["centroid_cosine"] == 0.0 and not out[1]["ok"]
    n = {0: 0, 1: 0}
    for vid in range(40):
        n[vid % 2] += 1
    assert out[0]["n_train"] + out[0]["n_holdout"] == n[0]
    assert out[1]["n_train"] + out[1]["n_holdout"] == n[1]


def test_hard_negatives_ivf_agrees_when_probes_cover(spark):
    """With only two labels and n_probe=2 every anchor probes the whole
    corpus — the IVF twin must then equal the exact miner row-for-row."""
    from twitter_followers_patterns_mapreduce_spark.operators.similarity import (
        hard_negative_mining,
        hard_negative_mining_ivf,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.2], 0),
        (2, [0.0, 1.0], 0),
        (3, [1.0, 0.1], 1),
        (4, [-1.0, 0.0], 1),
        (50, [0.0, -1.0], 1),  # second anchor (vec_id % 50 == 0)
        (6, [0.1, -1.0], 0),
    ]
    emb = spark.createDataFrame(
        rows, schema="vec_id LONG, embedding ARRAY<DOUBLE>, label LONG"
    )
    exact = sorted(map(tuple, hard_negative_mining(emb, margin=0.05).collect()))
    ivf = sorted(map(tuple, hard_negative_mining_ivf(emb, margin=0.05, n_probe=2).collect()))
    assert exact == ivf and len(exact) == 2


def test_hybrid_rrf_fusion_arithmetic(spark):
    """The fusion layer is pinned against its own two retrievers: for
    every fused row, rrf_u == 1e6 div (60+lex_rank) + 1e6 div
    (60+dense_rank) with absent lists contributing 0, ranks agree with
    the standalone BM25 / dense top-k orders, output is rrf-desc with
    doc_id tie-breaks, and <= k rows.  (End-to-end values are pinned by
    the DuckDB oracle; this isolates the rank arithmetic.)"""
    from twitter_followers_patterns_mapreduce_spark.operators import similarity as S
    from twitter_followers_patterns_mapreduce_spark.operators.corpus import doc_bm25_topk

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    k, kappa = 10, 60
    fused = S.doc_hybrid_rrf_topk(docs, emb, k=k, kappa=kappa).collect()
    assert 0 < len(fused) <= k

    lex_order = [r["doc_id"] for r in doc_bm25_topk(docs, k=k).collect()]
    lex_rank = {d: i + 1 for i, d in enumerate(lex_order)}

    import math
    qv = emb.where("vec_id = 0").collect()[0]["embedding"]
    rows = emb.collect()
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))), 6)
    dense_order = sorted(
        ((-cos(qv, r["embedding"]), r["vec_id"]) for r in rows)
    )[:k]
    dense_rank = {vid: i + 1 for i, (_, vid) in enumerate(dense_order)}

    for r in fused:
        d = r["doc_id"]
        assert r["lex_rank"] == lex_rank.get(d), (d, r["lex_rank"], lex_rank.get(d))
        assert r["dense_rank"] == dense_rank.get(d)
        want = (1_000_000 // (kappa + lex_rank[d]) if d in lex_rank else 0) + (
            1_000_000 // (kappa + dense_rank[d]) if d in dense_rank else 0
        )
        assert r["rrf_u"] == want
        assert d in lex_rank or d in dense_rank
    keys = [(-r["rrf_u"], r["doc_id"]) for r in fused]
    assert keys == sorted(keys)  # rrf desc, doc_id asc


def test_ivfsq_with_full_rerank_equals_ivf(spark):
    """Differential pin of the composition: with rerank wide enough to
    cover every probed candidate, the SQ8 stage only REORDERS the
    shortlist and the exact rerank restores the plain-IVF answer
    exactly — same probed lists, same top-k, same sims."""
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.similarity import (
        ann_topk_ivf,
        ann_topk_ivfsq,
    )

    # deterministic synthetic corpus: 120 vectors, 3 labels, 64 dims
    def vec(i):
        return [math.sin(0.1 * i * (d + 1)) for d in range(64)]

    rows = [(i, vec(i), i % 3) for i in range(1, 121)]  # vec(0) is all-zero
    emb = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    ivf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in ann_topk_ivf(emb, k=5).collect()
    }
    ivfsq = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in ann_topk_ivfsq(emb, k=5, rerank=1000).collect()
    }
    assert ivfsq == ivf and len(ivf) > 0
