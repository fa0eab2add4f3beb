"""Hand-computed goldens for the dedup operators on tiny corpora."""

from __future__ import annotations

import pytest

from twitter_followers_patterns_mapreduce_spark.operators import dedup as D

DOCS_SCHEMA = "doc_id LONG, text STRING"


@pytest.fixture(scope="module")
def corpus(spark):
    """3 exact copies of A, one near-dup of B, one unrelated C."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),  # exact dup of 1
        (5, "alpha beta gamma delta epsilon"),  # exact dup of 1
        (3, "one two three four"),
        (4, "one two three four five"),  # superset of 3: jaccard 2/3
        (6, "completely different words here now"),
    ]
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def test_exact_dup_groups(corpus):
    rows = D.exact_dup_groups(corpus).collect()
    assert len(rows) == 1
    assert rows[0]["n_copies"] == 3
    assert rows[0]["keeper_id"] == 1


def test_minhash_signatures_shape(corpus):
    sigs = D.minhash_signatures(corpus)
    row = {r["doc_id"]: r for r in sigs.collect()}
    # "one two three four" → 2 distinct 3-shingles
    assert row[3]["n_shingles"] == 2
    assert row[4]["n_shingles"] == 3
    # identical docs → identical signatures
    assert all(row[1][f"sig{j}"] == row[2][f"sig{j}"] for j in range(12))


def test_minhash_lsh_finds_exact_dups(corpus):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in D.minhash_lsh_pairs(corpus).collect()}
    # identical docs always collide in every band and verify at 1.0
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 5)] == 1.0
    assert pairs[(2, 5)] == 1.0
    # unrelated doc never pairs
    assert not any(6 in p for p in pairs)


def test_ngram_jaccard_exact_values(corpus):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(corpus).collect()}
    # docs 3/4: shingles {one two three, two three four} vs +{three four five}
    assert pairs[(3, 4)] == round(2 / 3, 6)
    assert pairs[(1, 2)] == 1.0


def test_jaccard_prefix_equals_inverted_index_golden(corpus):
    a = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs_prefix(corpus).collect()
    }
    b = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(corpus).collect()
    }
    assert a == b and (3, 4) in a


def test_jaccard_prefix_equals_inverted_index_real_docs(spark):
    """Differential on the real documents table: the prefix-filtered
    candidate set must lose NOTHING vs expanding every posting list —
    identical (pair, jaccard) output at two thresholds (0.5 exercises
    even-size prefixes, 0.7 the ceil rounding on odd sizes)."""
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for t in (0.5, 0.7):
        a = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in D.ngram_jaccard_pairs_prefix(docs, threshold=t).collect()
        }
        b = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in D.ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        assert a == b, (t, len(a), len(b))
    assert len(a) > 0  # t=0.7 still finds the near-dup pairs planted in testdata


def test_exact_substring_strip_golden(spark):
    """k=3, min_occ=2: the shared 3-gram 'a b c' (both docs) is
    stripped from both; unique tails survive; a doc that is ONLY the
    duplicated span collapses to the empty string."""
    docs = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (2, "q q a b c"),
            (3, "a b c"),
            (4, "totally unique words here"),
        ],
        schema=DOCS_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in D.exact_substring_strip(docs, k=3).collect()}
    assert rows[1]["cleaned"] == "x y z" and rows[1]["n_kept"] == 3
    assert rows[2]["cleaned"] == "q q" and rows[2]["n_kept"] == 2
    assert rows[3]["cleaned"] == "" and rows[3]["n_kept"] == 0
    assert rows[4]["cleaned"] == "totally unique words here"
    assert rows[4]["n_tokens"] == rows[4]["n_kept"] == 4


def test_exact_substring_strip_consistent_with_metric(spark):
    """The transform and the metric must agree on every real doc:
    tokens kept == n_tokens - dup_tokens (the metric's union length is
    exactly the covered-position count the strip removes)."""
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kept = {r["doc_id"]: (r["n_tokens"], r["n_kept"]) for r in D.exact_substring_strip(docs).collect()}
    frac = {r["doc_id"]: (r["n_tokens"], r["dup_tokens"]) for r in D.duplicated_span_fraction(docs).collect()}
    assert set(kept) == set(frac)
    assert all(kept[d][1] == frac[d][0] - frac[d][1] for d in kept)
    assert any(frac[d][1] > 0 for d in frac)  # the corpus plants dup spans


def test_simhash_identical_docs_zero_hamming(corpus):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in D.simhash_near_pairs(corpus).collect()}
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 5)] == 0


def test_simhash_bands_cover_all_bits():
    bands = D._simhash_bands(8)
    assert len(bands) == 9  # r+1 bands
    covered = [lo + i for lo, w in bands for i in range(w)]
    assert sorted(covered) == list(range(60))  # disjoint, complete


def test_simhash_prefilter_is_lossless(spark):
    """Band prefilter must find every pair within max_hamming: construct
    docs whose simhashes differ by a few bits by perturbing tokens and
    compare against the brute-force hamming over the simhash table."""
    rows = [(i, f"shared common prefix tokens here plus unique{i}") for i in range(8)]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    table = {r["doc_id"]: r["simhash"] for r in D.simhash_table(docs).collect()}
    want = {
        (a, b)
        for a in table
        for b in table
        if a < b and bin(table[a] ^ table[b]).count("1") <= 30
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.simhash_near_pairs(docs, max_hamming=30).collect()
    }
    assert got == want


def test_exact_dedup_keep_best(spark):
    rows = [
        (2, "the quick brown fox jumps over it"),
        (1, "the quick brown fox jumps over it"),  # same text, lower id wins tie
        (3, "zz"),
    ]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    kept = {r["keeper_id"] for r in D.exact_dedup_keep_best(docs).collect()}
    assert kept == {1, 3}


def test_salted_count_equals_plain_count(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.skew import salted_count

    rows = [(i % 3, f"v{i}") for i in range(300)]  # key 0/1/2, heavy duplication
    df = spark.createDataFrame(rows, schema="k LONG, v STRING")
    got = {r["k"]: r["count"] for r in salted_count(df, "k", n_salts=8).collect()}
    assert got == {0: 100, 1: 100, 2: 100}


def test_salted_broadcast_join_equals_plain_join(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.skew import salted_broadcast_join

    fact = spark.createDataFrame([(i % 2, i) for i in range(100)], schema="k LONG, x LONG")
    dim = spark.createDataFrame([(0, "a"), (1, "b")], schema="k LONG, name STRING")
    got = sorted(map(tuple, salted_broadcast_join(fact, dim, "k", n_salts=4).select("k", "x", "name").collect()))
    want = sorted(map(tuple, fact.join(dim, "k").select("k", "x", "name").collect()))
    assert got == want


def test_salted_skew_join_equals_plain_join(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.skew import salted_skew_join

    # key 0 is hot (90 rows), keys 1..10 are cold (1-2 rows each)
    rows = [(0, i) for i in range(90)] + [(k, 100 + k) for k in range(1, 11)]
    fact = spark.createDataFrame(rows, schema="k LONG, x LONG")
    dim = spark.createDataFrame(
        [(k, f"n{k}") for k in range(11)], schema="dk LONG, name STRING"
    )
    got = sorted(
        map(
            tuple,
            salted_skew_join(fact, dim, "k", "dk", hot_threshold=50, n_salts=4)
            .select("k", "x", "name")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            fact.join(dim, fact["k"] == dim["dk"]).select("k", "x", "name").collect(),
        )
    )
    assert len(got) == 100
    assert got == want


def test_salted_skew_join_same_key_name(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.skew import salted_skew_join

    fact = spark.createDataFrame([(i % 2, i) for i in range(60)], schema="k LONG, x LONG")
    dim = spark.createDataFrame([(0, "a"), (1, "b")], schema="k LONG, name STRING")
    got = sorted(
        map(
            tuple,
            salted_skew_join(fact, dim, "k", "k", hot_threshold=10, n_salts=4)
            .select("k", "x", "name")
            .collect(),
        )
    )
    want = sorted(map(tuple, fact.join(dim, "k").select("k", "x", "name").collect()))
    assert got == want


def test_salted_skew_join_hot_path_actually_splits(spark):
    """The VERDICT-r9 ask: prove the hot key's fact rows land on >1 salt
    (i.e. >1 task's worth of sub-keys), and that the plan is the
    split-union shape (two joins under a Union), not a collapsed single
    join."""
    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.operators.skew import (
        salted_skew_join,
        skew_split,
    )

    rows = [(0, i) for i in range(200)] + [(k, 100 + k) for k in range(1, 6)]
    fact = spark.createDataFrame(rows, schema="k LONG, x LONG")
    dim = spark.createDataFrame(
        [(k, f"n{k}") for k in range(6)], schema="dk LONG, name STRING"
    )

    hot_keys, fact_hot, fact_cold = skew_split(fact, "k", 50)
    assert [r["k"] for r in hot_keys.collect()] == [0]
    assert fact_hot.count() == 200 and fact_cold.count() == 5

    # reproduce the operator's salting on the hot half: the hot key's
    # rows must spread across >1 salt value (200 rows, 8 salts — the
    # chance of all landing on one salt is 8^-199)
    n_salts = 8
    salted = fact_hot.withColumn(
        "_fs",
        F.pmod(
            F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(n_salts)
        ).cast("int"),
    )
    distinct_salts = salted.agg(F.countDistinct("_fs")).first()[0]
    assert distinct_salts > 1

    plan = salted_skew_join(
        fact, dim, "k", "dk", hot_threshold=50, n_salts=n_salts
    )._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan
    assert plan.count("Join") >= 2  # hot half + cold half


def test_dedup_incremental_statuses(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import dedup_incremental

    base = "the quick brown fox jumps over the lazy dog near the old stone bridge"
    rows = [
        (0, base),                                   # corpus
        (2, "completely different corpus text about spark shuffles and joins"),
        (1, base),                                   # new: exact dup of 0
        (3, base + " tonight"),                      # new: near dup of 0
        (5, "unrelated new document with its own fresh vocabulary entirely"),  # kept
    ]
    df = spark.createDataFrame(rows, schema="doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in dedup_incremental(df, threshold=0.5).collect()}
    assert set(got) == {1, 3, 5}  # only NEW (odd) docs are judged
    assert got[1]["status"] == "exact_dup" and got[1]["near_dup_of"] is None
    assert got[3]["status"] == "near_dup" and got[3]["near_dup_of"] == 0
    assert got[3]["jaccard"] >= 0.5
    assert got[5]["status"] == "kept" and got[5]["jaccard"] is None


def test_dedup_incremental_tag_route_equals_parity_route(spark):
    """The new_predicate (tag-column semi-join) path must reproduce the
    default parity-split exactly when the tag IS the parity — guards the
    membership-routing refactor."""
    from pyspark.sql import functions as F

    from twitter_followers_patterns_mapreduce_spark.operators.dedup import dedup_incremental
    from twitter_followers_patterns_mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    default = sorted(map(tuple, dedup_incremental(docs, threshold=0.5).collect()))
    tagged = docs.withColumn("_new", F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    via_tag = sorted(
        map(tuple, dedup_incremental(tagged, threshold=0.5, new_predicate=F.col("_new")).collect())
    )
    assert default == via_tag


def test_containment_catches_doc_inside_doc(spark):
    """A short doc quoted wholesale inside a long one: containment 1.0
    with the short side named `contained_doc`, while symmetric Jaccard
    stays below any useful threshold (the case this operator exists for)."""
    rows = [
        (1, "one two three four"),  # 2 tri-shingles, both inside doc 2
        (2, "zero one two three four five six seven eight nine ten eleven"),
        (3, "unrelated filler text entirely"),
    ]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    out = D.containment_pairs(docs, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["contained_doc"] == 1
    assert r["containment"] == 1.0
    assert r["n_common"] == 2
    # same pair under symmetric Jaccard: 2 common / (2 + 10 - 2) = 0.2
    assert D.ngram_jaccard_pairs(docs, threshold=0.5).count() == 0


# ---------------------------------------------------------------------------
# FastSS fuzzy match
# ---------------------------------------------------------------------------


def test_fuzzy_match_fastss_cases(spark):
    # catalog: {"widget", "gadget", "midget", "wwidget"}; probes built so
    # every edit class appears — the deterministic typo deletes char at
    # p_partkey % len(name), and probe_mod=1 keeps every row
    parts = spark.createDataFrame(
        [
            # key 0 → delete pos 0 of "widget" → "idget" (deletion probe)
            (0, "widget"),
            # key 7 → 7 % 6 = 1 → delete pos 1 of "gadget" → "gdget"
            (7, "gadget"),
            # key 14 → 14 % 7 = 0 → delete pos 0 of "wwidget" → "widget" (exact)
            (14, "wwidget"),
            (1, "midget"),
        ],
        schema="p_partkey long, p_name string",
    )
    out = D.fuzzy_match_fastss(parts, probe_mod=7).collect()
    got = {(r["probe_id"], r["name"]): r["dist"] for r in out}
    # probe 0 "idget": dist 1 to widget AND midget (substitution vs
    # deletion both reachable), dist 2 to wwidget → excluded
    # probe 14 "widget": dist 0 to widget, dist 1 to midget and wwidget
    assert got == {
        (0, "widget"): 1,
        (0, "midget"): 1,
        (7, "gadget"): 1,
        (14, "widget"): 0,
        (14, "midget"): 1,
        (14, "wwidget"): 1,
    }


def test_duplicated_span_fraction_interval_union(spark):
    # doc 1 and doc 2 share the 3-gram "a b c" twice inside doc 1 at
    # overlapping starts — the interval union must not double count
    docs = spark.createDataFrame(
        [
            # toks: a b c a b c x  → dup 3-gram starts at 1 and 4 ("a b c")
            #   union of [1,3] and [4,6] = 6 tokens of 7
            (1, "a b c a b c x", "en", "s", 13),
            # contains "a b c" once → start 1, plus unique tail
            (2, "a b c z z z", "en", "s", 11),
            # no duplicated 3-gram anywhere
            (3, "p q r s t", "en", "s", 9),
        ],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in D.duplicated_span_fraction(docs, k=3).collect()
    }
    assert out[1] == (7, 6, round(6 / 7, 6))
    assert out[2] == (6, 3, 0.5)
    assert out[3] == (5, 0, 0.0)


def test_duplicated_span_fraction_overlapping_starts(spark):
    # "a a a a a" with k=3: starts 1,2,3 all the same shingle → dup;
    # union of [1,3],[2,4],[3,5] = 5 = whole doc
    docs = spark.createDataFrame(
        [(1, "a a a a a", "en", "s", 9)],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    r = D.duplicated_span_fraction(docs, k=3).collect()[0]
    assert (r["n_tokens"], r["dup_tokens"], r["dup_frac"]) == (5, 5, 1.0)


def test_fuzzy_match_fastss_property_vs_bruteforce(spark):
    # randomized-but-seeded catalog: the FastSS pipeline must equal the
    # brute-force all-pairs levenshtein filter exactly (lossless blocking)
    import itertools
    import random

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rnd = random.Random(20260814)
    names = [
        "".join(rnd.choice("abc") for _ in range(rnd.randint(1, 6)))
        for _ in range(40)
    ]
    parts = spark.createDataFrame(
        list(enumerate(names)), schema="p_partkey long, p_name string"
    )
    out = {
        (r["probe_id"], r["name"]): r["dist"]
        for r in D.fuzzy_match_fastss(parts, probe_mod=1).collect()
    }
    # reproduce the deterministic typo probes and brute-force the truth
    catalog = sorted(set(names))
    expected = {}
    for key, name in enumerate(names):
        pos = key % len(name)
        q = name[:pos] + name[pos + 1 :]
        for cand in catalog:
            d = lev(q, cand)
            if d <= 1:
                expected[(key, cand)] = d
    assert out == expected


def test_duplicated_span_fraction_random_differential(spark):
    # seeded random corpora vs an independent brute-force implementation
    # (set-of-covered-positions, no interval trick) — pins the lag-window
    # union against the obvious-but-slow definition
    import random

    rnd = random.Random(20260814)
    k = 3
    docs = []
    for doc_id in range(25):
        n = rnd.randint(1, 20)
        docs.append((doc_id, " ".join(rnd.choice("abcd") for _ in range(n)), "en", "s", 0))

    def brute(docs):
        sh = {}
        toks = {d: t.split() for d, t, *_ in docs}
        for d, tt in toks.items():
            for i in range(len(tt) - k + 1):
                sh.setdefault(tuple(tt[i : i + k]), []).append((d, i))
        out = {}
        for d, tt in toks.items():
            covered = set()
            for i in range(len(tt) - k + 1):
                if len(sh[tuple(tt[i : i + k])]) >= 2:
                    covered.update(range(i, i + k))
            out[d] = (len(tt), len(covered))
        return out

    expected = brute(docs)
    df = spark.createDataFrame(
        docs, schema="doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in D.duplicated_span_fraction(df, k=k).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# LSH recall audit
# ---------------------------------------------------------------------------

def test_lsh_recall_perfect_on_exact_dups(spark):
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import lsh_recall_audit

    # identical docs share every shingle → identical signatures → every
    # band collides → recall must be exactly 1
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, text) for i in range(4)] + [(9, "completely different words here now")],
        schema="doc_id LONG, text STRING",
    )
    row = lsh_recall_audit(docs, threshold=0.5).collect()[0]
    assert (row["n_truth"], row["n_found"], row["n_missed"], row["recall"]) == (6, 6, 0, 1.0)


def test_lsh_recall_counts_misses_below_banding_power(spark):
    """At a threshold far below the banding operating point the exact
    truth set contains low-jaccard pairs the bands rarely bucket —
    n_missed must count them and recall = floor(found/truth * 1e6)/1e6."""
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import lsh_recall_audit

    # every doc shares a 4-word head (2 common 3-shingles) and has a
    # distinct 6-word tail: each pair's jaccard = 2/14 ~ 0.143 >= 0.1,
    # but band collision probability ~ 8*j^4 ~ 0.003 -> the bands miss
    # essentially all of them
    docs = spark.createDataFrame(
        [
            (i, "c1 c2 c3 c4 " + " ".join(f"u{i}x{j}" for j in range(6)))
            for i in range(10)
        ],
        schema="doc_id LONG, text STRING",
    )
    row = lsh_recall_audit(docs, threshold=0.1).collect()[0]
    assert row["n_truth"] == 45  # all C(10,2) pairs are true at j~0.143
    assert row["n_missed"] > 0  # the banding-power gap is visible
    assert row["n_found"] + row["n_missed"] == row["n_truth"]
    import math as _m
    assert row["recall"] == _m.floor(row["n_found"] / row["n_truth"] * 1e6) / 1e6


def test_bucket_pairs_hot_bucket_fallback_is_lossless(spark):
    # one "hot" bucket above the cap (self-join branch) + one small
    # bucket (array-expansion branch): the union must be exactly all
    # in-bucket pairs either way — the cap only moves the quadratic
    # expansion off a single task, never changes the pair set
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import _bucket_pairs

    keyed = spark.createDataFrame(
        [("hot", i) for i in range(10)] + [("small", 100), ("small", 101)],
        schema="key STRING, doc_id LONG",
    )
    expected = {(a, b) for a in range(10) for b in range(10) if a < b} | {(100, 101)}
    capped = {
        (r["da"], r["db"]) for r in _bucket_pairs(keyed, ["key"], max_bucket=4).collect()
    }
    uncapped = {(r["da"], r["db"]) for r in _bucket_pairs(keyed, ["key"]).collect()}
    assert capped == expected
    assert uncapped == expected


# ---------------------------------------------------------------------------
# Sampled LSH recall audit (the registered scale path)
# ---------------------------------------------------------------------------

def test_lsh_recall_sampled_equals_audit_of_hash_slice(spark):
    """The sampled audit must be EXACTLY the full audit run on the
    h64(doc_id)%100 < pct slice — the sample is applied before both
    paths, so the two compositions are the same computation."""
    from twitter_followers_patterns_mapreduce_spark.functions.hashing import h64_sql
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        lsh_recall_audit,
        lsh_recall_audit_sampled,
    )
    from pyspark.sql import functions as F

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, text if i % 3 else text + f" tail{i}") for i in range(40)],
        schema="doc_id LONG, text STRING",
    )
    got = lsh_recall_audit_sampled(docs, pct=50, threshold=0.5).collect()[0]
    h = h64_sql("cast(doc_id as string)", "spark")
    sliced = docs.where(F.expr(f"{h} % 100 < 50"))
    want = lsh_recall_audit(sliced, threshold=0.5).collect()[0]
    assert got["n_docs_sampled"] == sliced.count()
    assert 0 < got["n_docs_sampled"] < 40  # the sample actually bites
    for c in ("n_truth", "n_found", "n_missed", "recall"):
        assert got[c] == want[c]


def test_lsh_recall_sampled_pct100_is_full_audit(spark):
    """pct=100 keeps every doc — the sampled form degenerates to the
    full-corpus audit (the anchor the scale path must agree with)."""
    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        lsh_recall_audit,
        lsh_recall_audit_sampled,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, text + (f" t{i}" if i % 2 else "")) for i in range(12)],
        schema="doc_id LONG, text STRING",
    )
    got = lsh_recall_audit_sampled(docs, pct=100, threshold=0.5).collect()[0]
    want = lsh_recall_audit(docs, threshold=0.5).collect()[0]
    assert got["n_docs_sampled"] == 12
    for c in ("n_truth", "n_found", "n_missed", "recall"):
        assert got[c] == want[c]


def test_split_ngram_novelty_closed_form(spark):
    """Hand-checkable split: pick ids so the h64 split puts one doc in
    the holdout, then count its shingles that never occur in train."""
    import hashlib

    from twitter_followers_patterns_mapreduce_spark.operators.dedup import (
        split_ngram_novelty,
    )

    def is_holdout(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return h % 100 < 30

    train_text = "alpha beta gamma delta epsilon zeta"
    hold_text = "alpha beta gamma completely novel phrasing here"
    ids = list(range(50))
    hold_ids = [i for i in ids if is_holdout(i)]
    train_ids = [i for i in ids if not is_holdout(i)]
    assert hold_ids and train_ids
    rows = [(train_ids[0], train_text), (hold_ids[0], hold_text)]
    docs = spark.createDataFrame(rows, schema="doc_id LONG, text STRING")
    row = split_ngram_novelty(docs, holdout_pct=30).first()

    def sh3(text):
        w = text.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    train_sh, hold_sh = sh3(train_text), sh3(hold_text)
    novel = hold_sh - train_sh
    assert row["n_train_shingles"] == len(train_sh)
    assert row["n_holdout_shingles"] == len(hold_sh)
    assert row["n_novel"] == len(novel)
    import math

    assert row["novelty_rate"] == math.floor(len(novel) / len(hold_sh) * 1e6) / 1e6
