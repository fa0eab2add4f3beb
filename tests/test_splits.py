"""Deterministic split assignment: membership is a pure function of the
key — invariant to partitioning, row order, and dataset growth — and
the holdout fraction lands near the requested percentage."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_followers_patterns_mapreduce_spark.operators import splits as SP


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, "en", 100) for i in ids], schema="doc_id LONG, lang STRING, n_chars LONG"
    )


def test_split_invariant_to_partitioning_and_growth(spark):
    small = SP.assign_split(_docs(spark, range(200)))
    grown = SP.assign_split(_docs(spark, range(1000)).repartition(17))
    a = {r["doc_id"]: r["split"] for r in small.collect()}
    b = {r["doc_id"]: r["split"] for r in grown.collect()}
    assert all(b[k] == v for k, v in a.items())  # growth never reassigns


def test_holdout_fraction_near_target(spark):
    r = SP.assign_split(_docs(spark, range(5000)), holdout_pct=10)
    n_hold = r.where(F.col("split") == "holdout").count()
    assert 0.06 < n_hold / 5000 < 0.14  # 100-bucket quantization around 10%


def test_split_is_exhaustive_and_exclusive(spark):
    r = SP.assign_split(_docs(spark, range(500)))
    assert r.where(~F.col("split").isin("train", "holdout")).count() == 0
    assert r.count() == 500


def _text_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )


def test_contamination_check_detects_copied_ngrams(spark):
    # find one holdout id and one train id under the real bucket function
    ids = SP.assign_split(_docs(spark, range(200))).collect()
    hold_id = next(r["doc_id"] for r in ids if r["split"] == "holdout")
    train_id = next(r["doc_id"] for r in ids if r["split"] == "train")
    clean_id = next(r["doc_id"] for r in ids if r["split"] == "holdout" and r["doc_id"] != hold_id)

    leaked = "alpha beta gamma delta epsilon zeta"  # 2 distinct 5-gram shingles
    docs = _text_docs(
        spark,
        [
            (train_id, f"prefix words here {leaked} and a tail of extra words"),
            (hold_id, leaked),
            (clean_id, "one two three four five six seven"),
        ],
    )
    got = {r["doc_id"]: r for r in SP.contamination_check(docs).collect()}
    assert got[hold_id]["n_shingles"] == 2
    assert got[hold_id]["n_contaminated"] == 2
    assert got[hold_id]["contamination_ratio"] == 1.0
    assert got[clean_id]["n_contaminated"] == 0
    assert train_id not in got  # train docs are never audited rows


def test_contamination_short_docs_drop_out(spark):
    ids = SP.assign_split(_docs(spark, range(200))).collect()
    hold_id = next(r["doc_id"] for r in ids if r["split"] == "holdout")
    docs = _text_docs(spark, [(hold_id, "too short for five grams")])  # 5 tokens → 1 shingle
    rows = SP.contamination_check(docs).collect()
    assert len(rows) == 1 and rows[0]["n_shingles"] == 1
    docs2 = _text_docs(spark, [(hold_id, "only four tokens here")])
    assert SP.contamination_check(docs2).count() == 0


def test_mixture_sample_caps_each_source_at_sqrt(spark):
    rows = [(i, "x " * 5, "en", "big" if i < 100 else "small", 10) for i in range(110)]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    got = SP.mixture_sample(docs, stratum="source").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["big"]) == 10  # ceil(sqrt(100))
    assert len(by_src["small"]) == 4  # ceil(sqrt(10))
    # deterministic: rerun on shuffled input picks the same doc_ids
    again = SP.mixture_sample(docs.repartition(7), stratum="source").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in got}


def test_split_drift_ks_detects_planted_shift(spark):
    """KS audit: a healthy hash split over one distribution is below the
    critical value; identical distributions give a small ks_stat and
    drifted=False. Planted drift (holdout lengths shifted +1000) pushes
    KS to 1.0 and flips the verdict."""
    from twitter_followers_patterns_mapreduce_spark.operators.splits import (
        assign_split,
        split_drift_ks,
    )

    rows = [(i, f"t{i}", "en", "src0", 100 + (i % 50)) for i in range(2000)]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    # 50/50 split: enough holdout mass that discretization wobble of a
    # HEALTHY split sits well under the critical value (at 10% the same
    # fixture lands at p≈0.015 and legitimately trips the 5% test —
    # small-holdout KS audits need the matching n-dependent critical
    # value taken seriously, which is exactly why the query emits it)
    healthy = split_drift_ks(docs, holdout_pct=50).collect()[0]
    assert healthy["n_train"] + healthy["n_holdout"] == 2000
    assert not healthy["drifted"]
    assert 0.0 <= healthy["ks_stat"] <= healthy["ks_crit_5pct"]

    # plant drift: shift n_chars by +1000 exactly for the rows the split
    # assigns to holdout -> the two CDFs never overlap -> KS = 1.0
    from pyspark.sql import functions as F

    shifted = assign_split(docs, "doc_id", 10).withColumn(
        "n_chars",
        F.when(F.col("split") == "holdout", F.col("n_chars") + 1000).otherwise(
            F.col("n_chars")
        ),
    ).drop("split")
    drifted = split_drift_ks(shifted, holdout_pct=10).collect()[0]
    assert drifted["ks_stat"] == 1.0
    assert drifted["drifted"]


def test_weighted_sample_matches_reference_formula(spark):
    # deterministic differential: replicate u = (h64(doc_id)+1)/2^60 and
    # key = floor(-ln(u)/w * 1e12) in pure python, expect the exact top-k
    import hashlib
    import math

    docs = [(i, f"t{i}", "en", "s", 10 + (i * 37) % 500) for i in range(200)]
    df = spark.createDataFrame(
        docs, schema="doc_id long, text string, lang string, source string, n_chars long"
    )
    got = [(r["sample_rank"], r["doc_id"], r["weight"])
           for r in SP.weighted_sample(df, k=25).collect()]

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    keyed = []
    for doc_id, _, _, _, n_chars in docs:
        u = (h64(str(doc_id)) + 1) / 1152921504606846976.0
        keyed.append((math.floor(-math.log(u) / n_chars * 1_000_000_000_000), doc_id, n_chars))
    keyed.sort()
    expected = [(i + 1, d, w) for i, (_, d, w) in enumerate(keyed[:25])]
    assert sorted(got) == expected

    # heavier docs must be overrepresented: sample mean weight > corpus mean
    ws = [w for _, _, w in got]
    corpus_mean = sum(d[4] for d in docs) / len(docs)
    assert sum(ws) / len(ws) > corpus_mean


def test_priority_sum_estimate_degenerate_and_model(spark):
    """k >= n: tau = 0 and the estimator IS the exact sum.  k < n: tau,
    estimate, and error all match a direct Python model of DLT priority
    sampling with the same hash-derived u."""
    import hashlib
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.splits import (
        priority_sum_estimate,
    )

    rows = [(i, "t", "en", "A", 50 + 37 * i) for i in range(6)]
    docs = spark.createDataFrame(
        rows, schema="doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    exact = sum(r[4] for r in rows)

    big = priority_sum_estimate(docs, k=10).collect()[0]
    assert big["tau"] == 0.0
    assert big["exact_chars"] == exact
    assert big["est_chars"] == float(exact)
    assert big["abs_rel_err"] == 0.0

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    k = 3
    qs = sorted(
        ((w / ((h64(str(i)) + 1.0) / 2**60), i, w) for i, _, _, _, w in rows),
        key=lambda t: (-t[0], t[1]),
    )
    tau = qs[k][0]
    est6 = sum(math.floor(max(float(w), tau) * 1e6) for _, _, w in qs[:k])
    row = priority_sum_estimate(docs, k=k).collect()[0]
    assert row["n_docs"] == 6
    assert row["tau"] == tau
    assert row["est_chars"] == math.floor(est6 / 1e6 * 1e6) / 1e6
    assert row["abs_rel_err"] == math.floor(abs(est6 / 1e6 - exact) / exact * 1e6) / 1e6


def test_dsir_select_matches_reference_formula(spark):
    """Closed-form DSIR check: a tiny corpus whose hashed-bigram model
    is replicated independently in Python (md5-h64 buckets, Laplace
    smoothing, ln on the 1e-6 round-half-up grid) — the Spark scores
    must match the Python recompute EXACTLY (they are BIGINT), raw docs
    heavy in target-distinctive tokens must outrank raw-only phrasing,
    and only raw-pool docs may appear."""
    import hashlib
    import math

    from twitter_followers_patterns_mapreduce_spark.operators.splits import (
        dsir_weights,
    )

    B = 512
    rows = [
        (0, "alpha beta alpha beta", "curated"),
        (1, "alpha beta gamma", "curated"),
        (2, "alpha beta alpha", "web"),      # reads like the target
        (3, "delta epsilon zeta", "web"),    # raw-only phrasing
        (4, "alpha delta", "web"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def feats(text: str) -> list[int]:
        toks = [t for t in text.split() if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [h64(g) % B for g in grams]

    t_cnt: dict[int, int] = {}
    r_cnt: dict[int, int] = {}
    for _i, text, src in rows:
        for b in feats(text):
            d = t_cnt if src == "curated" else r_cnt
            d[b] = d.get(b, 0) + 1
    t_tot, r_tot = sum(t_cnt.values()), sum(r_cnt.values())

    def w_micro(b: int) -> int:
        num = (t_cnt.get(b, 0) + 1.0) / (t_tot + float(B))
        den = (r_cnt.get(b, 0) + 1.0) / (r_tot + float(B))
        return int(math.floor(1_000_000.0 * math.log(num / den) + 0.5))

    expect = {
        i: sum(w_micro(b) for b in feats(text))
        for i, text, src in rows
        if src != "curated"
    }

    out = dsir_weights(
        docs.repartition(5), b_buckets=B, k=10, target_sources=("curated",)
    ).collect()
    got = {r["doc_id"]: r["dsir_score_micro"] for r in out}
    assert got == expect
    assert all(r["source"] == "web" for r in out)
    assert {r["doc_id"]: r["n_feats"] for r in out} == {2: 5, 3: 5, 4: 3}
    # target-like phrasing outranks raw-only phrasing
    assert got[2] > got[3]
    # returned in score order, doc_id tie-break
    scores = [(r["dsir_score_micro"], -r["doc_id"]) for r in out]
    assert scores == sorted(scores, reverse=True)


def test_quality_classifier_learns_separable_corpus(spark):
    """Behavioral pin on a linearly separable corpus: curated docs use
    one vocabulary, junk another, and two unlabeled-style raw docs echo
    one side each.  After 3 rounds the curated-vocabulary docs must
    outscore the junk-vocabulary ones, scores stay in [0,1] on the
    6dp grid, keep == (score >= 0.5), and the result is invariant to
    input partitioning (DECIMAL reductions are order-free)."""
    from twitter_followers_patterns_mapreduce_spark.operators.splits import (
        quality_classifier_scores,
    )

    rows = [
        (0, "alpha beta gamma alpha beta", "curated"),
        (1, "beta gamma alpha gamma", "curated"),
        (2, "alpha gamma beta beta", "curated"),
        (3, "zap zap junk spam junk", "web"),
        (4, "spam junk zap spam", "web"),
        (5, "alpha beta gamma beta", "web"),   # curated-like raw doc
        (6, "junk spam zap zap", "web"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    out = {
        r["doc_id"]: r
        for r in quality_classifier_scores(
            docs, b_buckets=128, iters=3, lr=1.0, target_sources=("curated",)
        ).collect()
    }
    assert {i: out[i]["y"] for i in range(7)} == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0}
    for r in out.values():
        assert 0.0 <= r["score"] <= 1.0
        assert r["keep"] == (r["score"] >= 0.5)
    # curated vocabulary outscores junk vocabulary — including the
    # curated-LIKE raw doc over every junk doc
    assert min(out[i]["score"] for i in (0, 1, 2, 5)) > max(
        out[i]["score"] for i in (3, 4, 6)
    )
    out2 = {
        r["doc_id"]: r["score"]
        for r in quality_classifier_scores(
            docs.repartition(7),
            b_buckets=128,
            iters=3,
            lr=1.0,
            target_sources=("curated",),
        ).collect()
    }
    assert out2 == {i: out[i]["score"] for i in out}
