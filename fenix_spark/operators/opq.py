"""Optimized Product Quantization (OPQ) — learn an orthogonal rotation
that minimizes PQ reconstruction error before coding (Ge et al.,
"Optimized Product Quantization", CVPR 2013, non-parametric variant).

Classic PQ slices the vector into fixed sub-blocks; if variance is
unevenly spread or dimensions are correlated ACROSS block boundaries,
codebooks waste bits. OPQ alternates:

    1. code the ROTATED data with plain PQ (reuses
       ``coder.train_coding`` — distributed KMeans per sub-block),
    2. re-solve the rotation as an orthogonal Procrustes problem
       ``min_R ‖XR − Ŷ‖_F`` → R = UVᵀ from SVD(XᵀŶ),

which monotonically decreases ‖XR − Ŷ‖² (each step optimizes one
block of variables exactly).

Scale shape (same playbook as operators/pca.py):

- The Procrustes statistic XᵀŶ is a d×d matrix: each Arrow batch
  contributes one BLAS-shaped partial (assign codes in numpy against
  the broadcast centroid tensor, one gemm), the driver sums partials
  and runs an O(d³) SVD. One scan per iteration, zero shuffles.
- The learned rotation applies as a NATIVE expression
  (``rotate_expr`` → pca_project_expr with zero mean), so indexing
  100 TB of vectors through R is whole-stage-codegen scan work.
- Query-side rotation is a d×d numpy dot on the driver — per query,
  microseconds.

Integration: `opq_transform` writes the rotated column; train/index/
search then use the EXISTING PQ surface (build_ivfpq_index,
ivfpq_search) on it, with queries passed through `rotate_query`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.operators.coder import CodingConfig, coding_to_numpy, train_coding
from fenix_spark.operators.pca import pca_project_expr


@dataclass(frozen=True)
class OPQModel:
    rotation: np.ndarray  # (d, d) orthogonal
    coding: DataFrame  # the trained coding table on rotated data
    mse_history: list[float]  # reconstruction MSE after each iteration


def rotate_expr(column: str | Column, rotation: np.ndarray) -> Column:
    """y = xR as a native array<double> expression (zero-mean PCA
    projection onto R's columns — one fused multiply-accumulate per
    output dim, no Python in the scan)."""
    r = np.asarray(rotation, dtype="float64")
    return pca_project_expr(column, np.zeros(r.shape[0]), r.T)


def opq_transform(
    df: DataFrame, column: str, model: "OPQModel | np.ndarray", out_col: str = "opq"
) -> DataFrame:
    rot = model.rotation if isinstance(model, OPQModel) else model
    return df.withColumn(out_col, rotate_expr(column, rot))


def rotate_query(q, model: "OPQModel | np.ndarray") -> list[float]:
    rot = model.rotation if isinstance(model, OPQModel) else model
    return (np.asarray(q, dtype="float64") @ rot).tolist()


def _procrustes_stats(
    df: DataFrame, column: str, rotation: np.ndarray, cents: np.ndarray
) -> tuple[np.ndarray, float, int]:
    """One scan: Σ XᵀŶ (d×d), Σ‖XR − Ŷ‖², n — codes assigned in
    numpy per Arrow batch against the broadcast centroids."""
    import pandas as pd

    d = rotation.shape[0]
    n_books, k, sub_dim = cents.shape
    rot_b = rotation.copy()
    cents_b = cents.copy()

    src = df.select(F.col(column).cast("array<double>").alias("__v"))

    def partials(batches):
        c_acc = np.zeros((d, d))
        sse = 0.0
        n_rows = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf["__v"].tolist(), dtype="float64")
            y = x @ rot_b
            yhat = np.empty_like(y)
            for j in range(n_books):
                blk = y[:, j * sub_dim : (j + 1) * sub_dim]
                d2 = ((blk[:, None, :] - cents_b[j][None, :, :]) ** 2).sum(-1)
                yhat[:, j * sub_dim : (j + 1) * sub_dim] = cents_b[j][
                    d2.argmin(axis=1)
                ]
            c_acc += x.T @ yhat
            sse += float(((y - yhat) ** 2).sum())
            n_rows += x.shape[0]
        yield pd.DataFrame(
            {"c": [c_acc.ravel().tolist()], "sse": [sse], "n": [n_rows]}
        )

    parts = src.mapInPandas(
        partials, "c array<double>, sse double, n bigint"
    ).collect()
    c_total = np.zeros((d, d))
    sse_total, n_total = 0.0, 0
    for r in parts:
        c_total += np.asarray(r["c"], dtype="float64").reshape(d, d)
        sse_total += r["sse"]
        n_total += r["n"]
    return c_total, sse_total, n_total


def fit_opq(
    df: DataFrame,
    column: str,
    config: CodingConfig,
    iters: int = 4,
    dim: int | None = None,
) -> OPQModel:
    """Alternate PQ training and Procrustes rotation updates.

    Per iteration: n_codebooks distributed KMeans fits on the rotated
    column + one statistics scan. ``mse_history[0]`` is plain PQ
    (identity rotation) — the baseline OPQ must beat; tests assert the
    strict improvement on cross-block-correlated data."""
    if config.metric not in ("l2", "euclidean"):
        raise ValueError(
            "OPQ optimizes L2 reconstruction error; train the coding "
            f"with metric='l2' (got {config.metric!r})"
        )
    if dim is None:
        head = df.select(column).head()
        if head is None or head[0] is None:
            raise ValueError(
                "fit_opq: empty input frame (or null first vector) — "
                "cannot infer dim; pass dim= explicitly"
            )
        dim = len(head[0])
    rotation = np.eye(dim)
    coding = None
    history: list[float] = []
    for _ in range(iters):
        rotated = df.withColumn("__opq", rotate_expr(column, rotation))
        coding = train_coding(rotated, "__opq", config, dim=dim)
        cents, _, _, _ = coding_to_numpy(coding)
        c, sse, n = _procrustes_stats(df, column, rotation, cents)
        history.append(sse / max(n, 1))
        u, _, vt = np.linalg.svd(c)
        rotation = u @ vt
    # final coding must match the FINAL rotation
    rotated = df.withColumn("__opq", rotate_expr(column, rotation))
    coding = train_coding(rotated, "__opq", config, dim=dim)
    return OPQModel(rotation, coding, history)


def build_opq_ivfpq_index(
    df: DataFrame,
    column: str,
    model: OPQModel,
    coarse_coding: DataFrame,
    path: str,
):
    """Convenience composition: rotate → standard IVF-PQ build on the
    rotated column (fine coding = the OPQ-trained one). Search with
    ``opq_ivfpq_search`` which rotates the query. The index layout is
    EXACTLY operators/index.build_ivfpq_index's — OPQ changes the
    geometry, not the storage or query machinery.

    ``coarse_coding`` must be trained on the ROTATED column (train it
    on ``opq_transform(df, column, model)`` output) — coarse cells and
    fine codes must live in the same rotated space."""
    from fenix_spark.operators.index import build_ivfpq_index

    rotated = opq_transform(df, column, model, out_col="__opq")
    return build_ivfpq_index(rotated, "__opq", coarse_coding, model.coding, path)


def opq_ivfpq_search(
    indexed: DataFrame,
    model: OPQModel,
    coarse_coding: DataFrame,
    query,
    k: int = 10,
    probes: int = 8,
    rerank: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    from fenix_spark.operators.index import ivfpq_search

    return ivfpq_search(
        indexed, coarse_coding, model.coding, "__opq",
        rotate_query(query, model), metric="l2", k=k, probes=probes,
        rerank=rerank, id_col=id_col,
    )
