"""Cross-engine deterministic hashing primitives.

The reference has no hashing at all (its "Approx" job approximates by
MAX-filter sampling, ``README.md:77`` — SURVEY.md §2.4); MinHash /
SimHash / fingerprinting are part of the engine's training-data
extension surface.  Every hash here is derived from md5 so the exact
same 64-bit values are computable in Spark SQL *and* DuckDB ANSI SQL —
that is what lets the correctness harness hash-compare LSH outputs
instead of falling back to rows-only checks.

``h64(s)`` = first 60 bits of md5(s) as a non-negative BIGINT.
MinHash permutations are universal hashes ``(a·(h mod P) + b) mod P``
over the Mersenne prime P = 2^31 − 1; coefficients come from a fixed
seeded RNG so Spark expressions and oracle SQL share literal constants.
"""

from __future__ import annotations

import random

#: Mersenne prime 2^31-1 — all minhash arithmetic stays < 2^62, int64-safe.
P_MERSENNE_31 = 2_147_483_647

#: Number of minhash permutations and the LSH banding shape (6 bands × 2 rows:
#: collision-probability threshold ≈ (1/6)^(1/2) ≈ 0.41 — catches jaccard ≥ 0.5
#: candidates with high probability).
MINHASH_K = 12
LSH_BANDS = 6
LSH_ROWS = 2


def minhash_coeffs(k: int = MINHASH_K) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs shared by Spark plans and DuckDB oracles."""
    rnd = random.Random(20240813)
    return [
        (rnd.randrange(1, P_MERSENNE_31), rnd.randrange(0, P_MERSENNE_31)) for _ in range(k)
    ]


def h64_sql(x: str, dialect: str) -> str:
    """60-bit md5-derived hash of expression ``x`` as BIGINT, identical in
    both engines (verified bit-for-bit in tests)."""
    if dialect == "spark":
        return f"cast(conv(substring(md5({x}),1,15),16,10) as bigint)"
    if dialect == "duckdb":
        return f"CAST(concat('0x', substring(md5({x}),1,15)) AS BIGINT)"
    raise ValueError(dialect)


def minhash_sql(x: str, j: int, dialect: str) -> str:
    """j-th minhash permutation applied to expression ``x``."""
    a, b = minhash_coeffs()[j]
    h = h64_sql(x, dialect)
    return f"(({a} * ({h} % {P_MERSENNE_31}) + {b}) % {P_MERSENNE_31})"


def minhash_perm_sql(h: str, j: int) -> str:
    """j-th minhash permutation over an ALREADY-h64-hashed value ``h`` —
    pure int64 affine arithmetic, dialect-free.  Hashing each shingle
    once and permuting K times is K× cheaper than ``minhash_sql`` per
    permutation (md5 dominates; the affine step is ~free)."""
    a, b = minhash_coeffs()[j]
    return f"(({a} * ({h} % {P_MERSENNE_31}) + {b}) % {P_MERSENNE_31})"


#: Count-min-sketch hash family: depth (rows) and width (buckets per
#: row).  w=512 → expected per-key overcount N/512 per row; d=4 rows
#: take the min.  Both are literals shared by engine and oracle.
CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_coeffs(d: int = CMS_DEPTH) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the CMS rows — same universal-hash
    family as the minhash permutations but a DIFFERENT fixed seed, so
    the two sketch families stay statistically independent."""
    rnd = random.Random(20260816)
    return [
        (rnd.randrange(1, P_MERSENNE_31), rnd.randrange(0, P_MERSENNE_31)) for _ in range(d)
    ]


def cms_bucket_sql(h: str, j: int, w: int = CMS_WIDTH) -> str:
    """Row-j CMS bucket for an ALREADY-h64-hashed key ``h`` — pure int64
    affine-mod arithmetic, dialect-free (the minhash_perm_sql shape)."""
    a, b = cms_coeffs()[j]
    return f"((({a} * ({h} % {P_MERSENNE_31}) + {b}) % {P_MERSENNE_31}) % {w})"
