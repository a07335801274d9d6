"""OPQ tests: rotation orthogonality, native-expression/numpy parity,
monotone reconstruction improvement on cross-block-correlated data,
and end-to-end integration with the existing PQ search surface."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.coder import CodingConfig, coding_to_numpy
from fenix_spark.operators.opq import (
    fit_opq,
    opq_transform,
    rotate_expr,
    rotate_query,
)

D, N_ROWS = 8, 1500


@pytest.fixture(scope="module")
def correlated(spark):
    """Data whose variance structure straddles the sub-block boundary:
    latent 2-dim signal mixed into all 8 dims, so fixed-slice PQ is
    mis-aligned and a rotation genuinely helps."""
    rng = np.random.default_rng(11)
    z = rng.normal(size=(N_ROWS, 2)) * np.array([5.0, 3.0])
    mix = rng.normal(size=(2, D))
    x = z @ mix + 0.1 * rng.normal(size=(N_ROWS, D))
    rows = [(i, x[i].tolist()) for i in range(N_ROWS)]
    df = spark.createDataFrame(rows, "id bigint, vec array<double>").repartition(8)
    return df, x


@pytest.fixture(scope="module")
def model(correlated):
    df, _ = correlated
    cfg = CodingConfig(metric="l2", codebook_size=8, num_codebooks=2, max_iter=10)
    return fit_opq(df, "vec", cfg, iters=3)


def test_rotation_is_orthogonal(model):
    r = model.rotation
    assert np.allclose(r @ r.T, np.eye(D), atol=1e-9)


def test_rotate_expr_matches_numpy(spark, correlated, model):
    df, x = correlated
    got = (
        df.orderBy("id")
        .select(rotate_expr("vec", model.rotation).alias("y"))
        .limit(50)
        .collect()
    )
    want = x[:50] @ model.rotation
    for i, row in enumerate(got):
        assert np.allclose(row.y, want[i], atol=1e-9)


def test_opq_strictly_beats_plain_pq(model):
    # history[0] is identity-rotation PQ; later iterations must improve
    h = model.mse_history
    assert len(h) == 3
    assert h[-1] < h[0] * 0.9  # ≥10% reconstruction-error cut


def test_mse_history_monotone_nonincreasing(model):
    h = model.mse_history
    assert all(h[i + 1] <= h[i] + 1e-9 for i in range(len(h) - 1))


def test_query_rotation_roundtrip(model):
    q = np.arange(D, dtype="float64")
    rq = np.asarray(rotate_query(q, model))
    # orthogonality ⇒ norms preserved
    assert np.isclose(np.linalg.norm(rq), np.linalg.norm(q))


def test_end_to_end_with_pq_surface(spark, correlated, model):
    """Rotated data + existing ADC search returns sane neighbors: the
    nearest neighbor of a database vector's own rotation is itself."""
    df, x = correlated
    rotated = opq_transform(df, "vec", model, out_col="opq")
    cents, metric, k, n = coding_to_numpy(model.coding)
    assert metric == "l2" and (k, n) == (8, 2)

    from fenix_spark.operators.search import knn

    q = rotate_query(x[7], model)
    hits = knn(rotated, "opq", q, k=1, metric="l2", id_col="id").collect()
    assert hits[0].id == 7


def test_opq_ivfpq_composition(spark, correlated, model, tmp_path):
    """rotate → IVF-PQ build → rotated-query search returns self as
    nearest for database vectors (the end-to-end contract)."""
    from fenix_spark.operators.coder import CodingConfig, train_coding
    from fenix_spark.operators.opq import (
        build_opq_ivfpq_index,
        opq_ivfpq_search,
        opq_transform,
    )

    df, x = correlated
    rotated = opq_transform(df, "vec", model, out_col="__opq")
    coarse = train_coding(
        rotated, "__opq", CodingConfig(metric="l2", codebook_size=4, num_codebooks=1)
    )
    path = str(tmp_path / "opq_idx")
    build_opq_ivfpq_index(df.withColumnRenamed("id", "vec_id"), "vec", model, coarse, path)
    indexed = spark.read.parquet(path)
    hits = opq_ivfpq_search(
        indexed, model, coarse, x[11], k=3, probes=4, rerank=10
    ).collect()
    assert hits[0].vec_id == 11


def test_fit_opq_empty_frame_raises(spark):
    df = spark.createDataFrame([], "id bigint, vec array<double>")
    with pytest.raises(ValueError, match="empty input frame"):
        fit_opq(df, "vec", CodingConfig(num_codebooks=2, codebook_size=4))
