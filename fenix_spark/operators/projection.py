"""Johnson-Lindenstrauss random projection — model-free dimensionality
reduction as a pure scan expression.

The JL lemma (Johnson & Lindenstrauss 1984; database form: Achlioptas,
JCSS 2003) guarantees that projecting onto d_out random ±1 directions
preserves all pairwise Euclidean distances within 1±ε for
d_out = O(ε⁻² log n) — no training pass, no data-dependent state. That
makes it the zero-cost front end for the vector stack when PCA's
fitting scan isn't worth it: shrink 768-dim embeddings to 128 before
LSH bucketing / 1-bit quantization / brute rerank, at scan speed.

Scale design:

- The projection matrix is NOT random state: entry signs derive from
  ``blake2b("jl|seed|j|chunk")`` (RFC 7693 — the same keyless pinned
  construction as multimodal/cdc.py's gear table), so every executor,
  every retry, every engine derives the same matrix from the seed
  string. Nothing is broadcast, nothing persisted.
- Application is a NATIVE Catalyst expression (one fused
  zip_with/aggregate per output dim against a ±1/√d_out literal —
  operators/pca.py's projection shape): whole-stage-codegen, no
  Python, no shuffle. Projecting 100 TB costs exactly one scan.
- Rademacher entries satisfy JL with the same constants as Gaussian
  (Achlioptas Thm 1.1) and fold to add/subtract in the hot loop.

The reference has no dimensionality reduction at all (vectors pass
through torch cdist at full width, src/fenix/flight.py:254-256); this
is an extension for the 100 TB vector tier.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.metrics import query_literal, vec_double


def jl_matrix(d_in: int, d_out: int, seed: str = "") -> np.ndarray:
    """The (d_in, d_out) Rademacher projection matrix, entries
    ±1/√d_out, a pure function of (d_in, d_out, seed): column j's
    signs are the bits of ``blake2b("jl|{seed}|{j}|{chunk}")``
    (512 bits per chunk). Deterministic across platforms, numpy
    versions, and processes — safe to re-derive anywhere."""
    if d_in < 1 or d_out < 1:
        raise ValueError(f"dims must be >= 1, got ({d_in}, {d_out})")
    cols = []
    n_chunks = (d_in + 511) // 512
    for j in range(d_out):
        bits: list[int] = []
        for c in range(n_chunks):
            digest = hashlib.blake2b(
                f"jl|{seed}|{j}|{c}".encode(), digest_size=64
            ).digest()
            for byte in digest:
                for b in range(8):
                    bits.append((byte >> b) & 1)
        col = np.where(np.array(bits[:d_in]) == 1, 1.0, -1.0)
        cols.append(col)
    return np.stack(cols, axis=1) / np.sqrt(float(d_out))


def jl_project_expr(column: str | Column, matrix: np.ndarray) -> Column:
    """array<double> of d_out scores as a native expression:
    y_j = Σ_i x_i · R_ij — one fused multiply-accumulate per output
    dim against a column literal."""
    v = vec_double(column) if isinstance(column, str) else column
    m = np.asarray(matrix, dtype="float64")
    scores = [
        F.aggregate(
            F.zip_with(v, query_literal(m[:, j]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for j in range(m.shape[1])
    ]
    return F.array(*scores)


def jl_project(
    df: DataFrame,
    column: str,
    d_in: int,
    d_out: int,
    seed: str = "",
    out_col: str = "jl",
) -> DataFrame:
    """Append the projected vector column. ``d_in`` is asserted
    against the data (a silent width mismatch would zero-pad through
    zip_with); rows with NULL vectors project to NULL."""
    m = jl_matrix(d_in, d_out, seed)
    proj = jl_project_expr(column, m)
    guarded = (
        F.when(F.col(column).isNull(), F.lit(None).cast("array<double>"))
        .when(
            F.size(column) != d_in,
            F.raise_error(
                F.concat(
                    F.lit(f"jl_project: expected {d_in}-dim vectors, got "),
                    F.size(column).cast("string"),
                )
            ),
        )
        .otherwise(proj)
    )
    return df.withColumn(out_col, guarded)
