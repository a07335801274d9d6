"""Signed-random-projection (SRP) LSH — the hash-bucketed ANN path.

Complements the IVF index (operators/index.py) with the other classic
ANN scale-out: no training pass at all. Each vector hashes to an
``nbits``-bit bucket by the signs of its dot products with ``nbits``
fixed random hyperplanes (Charikar, STOC'02); cosine-close vectors
collide with probability 1 − θ/π per bit. A query scans only the
buckets within a small Hamming radius of its own bucket (multi-probe),
then runs the exact-distance top-k tail.

Scale design: the bucket id is a pure Catalyst expression over literal
hyperplanes (seeded, so both engines and every run agree) — computed at
scan time or co-written at ingest and used as a partition column, in
which case the multi-probe ``IN`` filter is physical partition pruning,
exactly like the IVF ``__CODED_ID__`` layout. No codebook, no driver
state: at 100 TB, adding data never requires retraining, which is the
operational reason to prefer SRP over IVF for append-heavy stores.
"""

from __future__ import annotations

from collections.abc import Sequence
from itertools import combinations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.metrics import distance, query_literal, vec_double
from fenix_spark.operators.search import knn

BUCKET_COL = "__LSH_BUCKET__"


def srp_planes(dim: int, nbits: int = 8, seed: int = 42) -> np.ndarray:
    """(nbits, dim) hyperplane normals, deterministic for a seed."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((nbits, dim))


def srp_bucket_expr(column: str | Column, planes: np.ndarray) -> Column:
    """Bucket id = Σ_i [v·plane_i ≥ 0]·2^i as a native expression; the
    planes ship with the plan as literals (nbits·dim doubles — tiny)."""
    v = vec_double(column)
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(v, query_literal(plane), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(int(2**i))).otherwise(F.lit(0)).cast("bigint")
    return bucket


def srp_bucket_of(target: Sequence[float], planes: np.ndarray) -> int:
    """Driver-side bucket of a query vector (same rule as the expr)."""
    t = np.asarray(target, dtype="float64")
    return int(sum(2**i for i, p in enumerate(planes) if float(p @ t) >= 0))


def probe_buckets(bucket: int, nbits: int, radius: int = 1) -> list[int]:
    """All buckets within Hamming distance ``radius`` (multi-probe
    LSH): C(nbits, ≤radius) ids — 37 of 256 for nbits=8, radius=2."""
    out = [bucket]
    for r in range(1, radius + 1):
        for bits in combinations(range(nbits), r):
            flipped = bucket
            for b in bits:
                flipped ^= 1 << b
            out.append(flipped)
    return sorted(out)


def lsh_ann_search(
    df: DataFrame,
    column: str,
    target: Sequence[float],
    planes: np.ndarray,
    metric: str = "cosine",
    k: int = 10,
    radius: int = 2,
    id_col: str | None = None,
    bucket_col: str | None = None,
) -> DataFrame:
    """ANN top-k via SRP bucket pruning + exact-distance tail.

    ``bucket_col``: name of a pre-materialized bucket column (ingest-
    time ``srp_bucket_expr``, ideally a partition column → physical
    pruning). When None the bucket is computed in the scan filter —
    still a single map pass, no shuffle, but reads all rows once.
    """
    bucket = (
        F.col(bucket_col) if bucket_col else srp_bucket_expr(column, planes)
    )
    probes = probe_buckets(srp_bucket_of(target, planes), len(planes), radius)
    pred = bucket.isin(probes)
    return knn(df, column, target, metric=metric, k=k, filter=pred, id_col=id_col)
