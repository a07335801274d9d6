"""Distributed PCA (operators/pca.py) vs numpy reference."""

from __future__ import annotations

import numpy as np
import pytest

from fenix_spark.operators.pca import fit_pca, pca_transform


@pytest.fixture(scope="module")
def emb_mat(spark, embeddings):
    rows = embeddings.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.asarray([r["embedding"] for r in rows], dtype="float64")


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / x.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    return mean, evecs[:, order].T, evals[order]


def test_fit_matches_numpy_reference(spark, embeddings, emb_mat):
    mean, comps, var = fit_pca(embeddings, "embedding", k=8)
    nmean, ncomps, nvar = _numpy_pca(emb_mat, 8)
    assert np.allclose(mean, nmean, atol=1e-9)
    assert np.allclose(var, nvar, rtol=1e-6)
    # eigenvectors match up to sign; our convention pins the sign
    for i in range(8):
        ref = ncomps[i] if ncomps[i][np.argmax(np.abs(ncomps[i]))] > 0 else -ncomps[i]
        assert np.allclose(comps[i], ref, atol=1e-8)


def test_fit_partition_invariant(spark, embeddings):
    """Sufficient statistics commute: any partitioning gives the same
    model (bit-differences only in the last ulp of the float sums)."""
    m1, c1, v1 = fit_pca(embeddings, "embedding", k=4)
    m2, c2, v2 = fit_pca(embeddings.repartition(17), "embedding", k=4)
    assert np.allclose(m1, m2, atol=1e-12)
    assert np.allclose(np.abs(c1), np.abs(c2), atol=1e-8)


def test_projection_native_and_correct(spark, embeddings, emb_mat):
    mean, comps, _ = fit_pca(embeddings, "embedding", k=8)
    out = pca_transform(embeddings, "embedding", mean, comps).select("vec_id", "pca")
    got = {r["vec_id"]: np.asarray(r["pca"]) for r in out.collect()}
    exp = (emb_mat - mean) @ comps.T
    for vid, vec in got.items():
        assert np.allclose(vec, exp[vid], atol=1e-9)
    # projection must be expression-only: no Python eval in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan or "mapInPandas" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_variance_ordering_and_capture(spark, embeddings, emb_mat):
    """Components are best-first and k=d captures all variance."""
    d = emb_mat.shape[1]
    _, _, var = fit_pca(embeddings, "embedding", k=d)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(d - 1))
    total = emb_mat.var(axis=0, ddof=0).sum()
    assert np.isclose(var.sum(), total, rtol=1e-9)


def test_fit_ignores_null_and_nan_rows(spark):
    import numpy as np

    clean = [(i, [float(i), 1.0]) for i in range(20)]
    dirty = clean + [(100, None), (101, [float("nan"), 2.0]), (102, [None, 3.0])]
    a = spark.createDataFrame(clean, "id bigint, embedding array<double>")
    b = spark.createDataFrame(dirty, "id bigint, embedding array<double>")
    ma, ca, va = fit_pca(a, "embedding", k=2)
    mb, cb, vb = fit_pca(b, "embedding", k=2)
    assert np.allclose(ma, mb) and np.allclose(va, vb)
