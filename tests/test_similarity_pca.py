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


def _eigh_pc(mat: np.ndarray) -> np.ndarray:
    x = mat - mat.mean(axis=0)
    cov = (x.T @ x) / (len(x) - 1)
    w, v = np.linalg.eigh(cov)
    pc = v[:, -1]
    j = int(np.argmax(np.abs(pc)))
    return -pc if pc[j] < 0 else pc


def test_pca_matches_numpy_eigh(labeled_vecs, spark):
    got = {r["label"]: r for r in label_principal_component(labeled_vecs).collect()}
    pdf = labeled_vecs.toPandas()
    for label in (0, 1):
        mat = np.vstack(pdf[pdf["label"] == label]["embedding"].to_numpy())
        pc = _eigh_pc(mat)
        r = got[label]
        assert r["n_vecs"] == 40
        for i in range(3):
            assert r[f"pc_dim{i}"] == pytest.approx(float(pc[i]), abs=1e-4)
        assert 0.5 < r["explained_ratio"] <= 1.0  # one dominant direction


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
