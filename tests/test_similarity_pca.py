"""Per-label PCA (applyInPandas power iteration) differential-tested
against numpy.linalg.eigh on the same groups, plus determinism under
repartitioning."""

from __future__ import annotations

import numpy as np
import pytest

from twitter_followers_patterns_mapreduce_spark.operators.similarity import (
    label_principal_component,
)


@pytest.fixture(scope="module")
def labeled_vecs(spark):
    rng = np.random.RandomState(7)
    rows = []
    for label, direction in [(0, [3.0, 1.0, 0.2, 0.0]), (1, [0.1, 0.2, 4.0, 1.0])]:
        d = np.array(direction)
        for _ in range(40):
            v = d * rng.normal(1.0, 0.3) + rng.normal(0, 0.05, size=4)
            rows.append((label, [float(x) for x in v]))
    return spark.createDataFrame(rows, schema="label LONG, embedding ARRAY<FLOAT>")


def _eigh_pc(mat: np.ndarray) -> tuple[np.ndarray, float]:
    x = mat - mat.mean(axis=0)
    cov = (x.T @ x) / (len(x) - 1)
    w, v = np.linalg.eigh(cov)
    pc = v[:, -1]
    j = int(np.argmax(np.abs(pc)))
    explained = float(w[-1] / w.sum())
    return (-pc if pc[j] < 0 else pc), explained


def test_pca_matches_numpy_eigh(labeled_vecs, spark):
    got = {r["label"]: r for r in label_principal_component(labeled_vecs).collect()}
    pdf = labeled_vecs.toPandas()
    for label in (0, 1):
        mat = np.vstack(pdf[pdf["label"] == label]["embedding"].to_numpy())
        pc, explained = _eigh_pc(mat)
        r = got[label]
        assert r["n_vecs"] == 40
        for i in range(3):
            assert r[f"pc_dim{i}"] == pytest.approx(float(pc[i]), abs=1e-4)
        # explained_ratio pinned against the eigen-solve itself, not
        # just a sanity band — this is the rows-only query's oracle
        assert r["explained_ratio"] == pytest.approx(explained, rel=1e-4)


def _power_iter_pc(mat: np.ndarray, n_iter: int = 30) -> tuple[np.ndarray, float]:
    """Independent replica of the operator's SPEC (n_iter power steps
    from all-ones, largest-|coord|-positive sign, Rayleigh ratio) —
    what the result must equal even when the spectrum is degenerate."""
    x = mat - mat.mean(axis=0)
    cov = (x.T @ x) / max(len(x) - 1, 1)
    v = np.ones(cov.shape[0])
    for _ in range(n_iter):
        v = cov @ v
        n = np.linalg.norm(v)
        if n == 0.0:
            break
        v = v / n
    j = int(np.argmax(np.abs(v)))
    if v[j] < 0:
        v = -v
    lam = float(v @ cov @ v)
    total = float(np.trace(cov))
    return v, (lam / total if total > 0 else 0.0)


def test_pca_matches_numpy_on_harness_table(spark):
    """Differential on the REAL embeddings table (all labels) — the
    check the driver can't run (needs numpy).  The harness embeddings
    are near-isotropic (top eigen-gap ≈ 1.02-1.2), so a fixed-iteration
    power method provably cannot match ``eigh``'s top eigenvector there;
    the tight assertion is against the spec replica, and ``eigh``
    contributes the Rayleigh UPPER bound (explained_ratio can never
    exceed λ1/trace) plus the exact match on the synthetic
    strong-gap fixture above."""
    from tests.conftest import SF_DIR_MED

    emb = spark.read.parquet(f"{SF_DIR_MED}/embeddings.parquet")
    got = {r["label"]: r for r in label_principal_component(emb).collect()}
    pdf = emb.select("label", "embedding").toPandas()
    for label, grp in pdf.groupby("label"):
        mat = np.vstack(grp["embedding"].to_numpy()).astype(np.float64)
        pc, explained = _power_iter_pc(mat)
        x = mat - mat.mean(axis=0)
        w = np.linalg.eigh((x.T @ x) / (len(x) - 1))[0]
        r = got[label]
        assert r["n_vecs"] == len(mat)
        # operator outputs are round(6) (the oracle contract); compare
        # against the identically-rounded replica values
        assert r["explained_ratio"] == pytest.approx(round(explained, 6), abs=1e-9)
        for i in range(3):
            assert r[f"pc_dim{i}"] == pytest.approx(round(float(pc[i]), 6), abs=1e-9)
        # +5.1e-7: the output is round(6), which can round UP past the
        # un-rounded Rayleigh bound by half a rounding step
        assert r["explained_ratio"] <= float(w[-1] / w.sum()) + 5.1e-7


def test_pca_invariant_to_partitioning(labeled_vecs):
    a = {r["label"]: r["pc_dim0"] for r in label_principal_component(labeled_vecs).collect()}
    b = {
        r["label"]: r["pc_dim0"]
        for r in label_principal_component(labeled_vecs.repartition(11)).collect()
    }
    for k in a:
        # row order inside a group changes with partitioning, so the
        # float reductions differ at machine epsilon — not at 1e-6
        assert a[k] == pytest.approx(b[k], abs=1e-6)
