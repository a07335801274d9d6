"""Product-quantization codebook training — the reference's "coding"
(C3, src/fenix/io/coder/coder.py:94-127).

The reference trains ``num_codebooks`` k-means codebooks over equal
slices of the vector with a torch mini-batch Lloyd loop, vmapped on one
node. Here each slice gets a distributed ``pyspark.ml.clustering.KMeans``
fit (seeded) — the scalable equivalent: training data never leaves the
executors, only k·D centroid doubles come back to the driver.

The trained coding is persisted as a PLAIN PARQUET TABLE
``{codebook, cell, centroid, metric, codebook_size, num_codebooks}``
(FIXTURES.md §2) instead of a torch pickle
(coder.py:120-125) — readable by Spark, DuckDB, and the oracle, which
makes code ASSIGNMENT an independently checkable query.

Joint cell id semantics mirror coder.py:171-181 exactly: with n
codebooks of k cells, id = Σ_j cell_j · k^(n−1−j) (base-k digits,
codebook 0 most significant); a joint cell's score for a query is the
SUM of per-codebook distances.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CodingConfig:
    """Mirrors the reference config (coder.py:24-29); batch_size and
    num_epochs belong to the torch loop and map to KMeans maxIter."""

    metric: str = "l2"
    codebook_size: int = 8
    num_codebooks: int = 2
    max_iter: int = 20
    seed: int = 42


def sub_vector(column: str, j: int, sub_dim: int):
    """Slice j of the vector column (1-based F.slice), cast to double."""
    return F.slice(F.col(column), j * sub_dim + 1, sub_dim).cast("array<double>")


def train_coding(
    df: DataFrame, column: str, config: CodingConfig, dim: int | None = None
) -> DataFrame:
    """Fit one KMeans per sub-vector; return the coding table.

    Uses Spark ML's distributed Lloyd iterations — each fit is a few
    passes over the (cached) slice projection, which is the right shape
    at any scale. KMeans minimizes euclidean WCSS regardless of the
    coding metric (like classic PQ); the coding METRIC governs
    assignment and probe scoring, matching the reference's behavior of
    carrying ``metric`` in the coding config (coder.py:24-29).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    spark = df.sparkSession
    if dim is None:
        dim = len(df.select(column).head()[0])
    n, k = config.num_codebooks, config.codebook_size
    if dim % n:
        raise ValueError(f"dim {dim} not divisible by num_codebooks {n}")
    sub_dim = dim // n

    slices = df.select(
        *[array_to_vector(sub_vector(column, j, sub_dim)).alias(f"sub{j}") for j in range(n)]
    ).cache()
    try:
        # materialize the cache ONCE so the concurrent fits below read
        # stored blocks instead of racing to compute the projection
        slices.count()

        def fit_one(j: int) -> list[Row]:
            km = KMeans(
                k=k,
                seed=config.seed + j,
                maxIter=config.max_iter,
                featuresCol=f"sub{j}",
                distanceMeasure="cosine" if config.metric == "cosine" else "euclidean",
            )
            model = km.fit(slices)
            # Stable cell numbering: the reference's cell order is an
            # artifact of torch init; ours sorts centroids
            # lexicographically so retraining is reproducible.
            cents = sorted(
                (np.asarray(c).tolist() for c in model.clusterCenters()),
                key=lambda c: tuple(c),
            )
            return [
                Row(
                    codebook=j,
                    cell=i,
                    centroid=[float(x) for x in c],
                    metric=config.metric,
                    codebook_size=k,
                    num_codebooks=n,
                )
                for i, c in enumerate(cents)
            ]

        # The n per-codebook fits are INDEPENDENT jobs over the same
        # cached slices — run them concurrently so each fit's stragglers
        # back-fill with the next fit's tasks (guide §2.6). Each fit is
        # seeded and its centroids sorted, so results are byte-identical
        # to the sequential order; rows are assembled in codebook order.
        from concurrent.futures import ThreadPoolExecutor

        rows: list[Row] = []
        with ThreadPoolExecutor(max_workers=min(n, 4)) as pool:
            for part in pool.map(fit_one, range(n)):
                rows.extend(part)
        _ = vector_to_array  # imported for parity; slices hold vectors
        return spark.createDataFrame(
            rows,
            "codebook int, cell int, centroid array<double>, "
            "metric string, codebook_size int, num_codebooks int",
        )
    finally:
        slices.unpersist()


_CODING_MEMO: "weakref.WeakKeyDictionary" = None  # type: ignore[assignment]


def _local_scan_rows(df: DataFrame):
    """Rows of ``df`` read driver-locally with pyarrow when — and only
    when — it is a bare parquet scan over local files. Codebook tables
    are a handful of rows, but ``collect()`` still pays a full Spark
    job (~0.1-0.3 s of scheduling); a driver-side footer+page read of
    the same files is ~ms and reads the identical bytes. Every
    invocation still reads the parquet inputs — this changes WHO reads
    the file, never WHEN (no cross-invocation caching; the weak
    per-instance memo above is unchanged). Returns None for anything
    that is not a plain local parquet scan — non-parquet sources,
    percent-encoded paths pyarrow can't open, and HIVE-PARTITIONED
    layouts (whose partition columns live in directory names, not the
    leaf files — the column check below catches them) all fall back to
    collect()."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRelation":
            return None
        files = df.inputFiles()
        if not files or not all(f.startswith("file:") for f in files):
            return None
        from urllib.parse import unquote

        import pyarrow.parquet as pq

        paths = [unquote(f[len("file:"):]) for f in files]
        tables = [pq.read_table(p) for p in sorted(paths)]
        # EVERY file must contain EVERY DataFrame column (intersection,
        # not union — ADVICE r13): a partition-directory column is
        # absent from all leaf files, and a schema-EVOLVED dir (an older
        # file missing a newer column, readable via mergeSchema) would
        # pass a union check yet yield rows without the key where
        # collect() yields None — callers would KeyError instead of
        # falling back.
        cols = set.intersection(*(set(t.column_names) for t in tables))
        if not set(df.columns) <= cols:
            return None
    except Exception:  # noqa: BLE001 — any fast-path failure: collect() instead
        return None
    out = []
    for t in tables:
        out.extend(t.to_pylist())
    return out or None


def coding_to_numpy(coding: DataFrame) -> tuple[np.ndarray, str, int, int]:
    """Collect a coding table to a (n, k, sub_dim) centroid array +
    (metric, k, n). Codebooks are tiny by design (n·k rows) — this is
    the one intentional driver-side materialization, same as the
    reference loading the codebook into process memory (coder.py:68-76).

    Memoized per DataFrame INSTANCE (weak-keyed): a DataFrame's
    content is fixed by its plan, and callers (assign/rank/lut) hit
    the same coding object several times per query — e.g. the 3-arm
    ivfpq suite row — so each tiny collect job runs once, not ~10×.
    """
    global _CODING_MEMO
    import weakref

    if _CODING_MEMO is None:
        _CODING_MEMO = weakref.WeakKeyDictionary()
    try:
        hit = _CODING_MEMO.get(coding)
    except TypeError:  # unhashable/unweakrefable frame impl: no memo
        hit = None
    if hit is not None:
        return hit
    rows = _local_scan_rows(coding)
    if rows is None:
        rows = coding.collect()
    metric = rows[0]["metric"]
    k = rows[0]["codebook_size"]
    n = rows[0]["num_codebooks"]
    sub_dim = len(rows[0]["centroid"])
    cents = np.zeros((n, k, sub_dim), dtype="float64")
    for r in rows:
        cents[r["codebook"], r["cell"]] = r["centroid"]
    out = (cents, metric, k, n)
    try:
        _CODING_MEMO[coding] = out
    except TypeError:  # unhashable/unweakrefable frame impl: just skip
        pass
    return out


def numpy_metric(metric: str, mat: np.ndarray, target: np.ndarray) -> np.ndarray:
    """fenix distance conventions for driver-side probe ranking
    (coder.py:38-50): mat (m, d) vs target (d,) → (m,) distances."""
    if metric in ("l2", "euclidean"):
        return np.linalg.norm(mat - target, axis=1)
    if metric == "cosine":
        denom = np.linalg.norm(mat, axis=1) * np.linalg.norm(target)
        return 0.5 - 0.5 * (mat @ target) / denom
    if metric in ("dot", "inner_product"):
        return -(mat @ target)
    raise ValueError(f"unknown metric {metric!r}")


# Densely scoring k^n joint cells allocates a k^n float64 array —
# ideal at the reference config (64 cells), catastrophic at production
# PQ shapes (16^8 cells = 34 GB on the driver). Above this bound
# rank_cells requires ``limit`` and switches to an exact beam fold.
_MAX_DENSE_CELLS = 1 << 22


def rank_cells(
    coding: DataFrame, target, metric: str | None = None, limit: int | None = None
) -> list[int]:
    """Rank joint cells for a query by the sum of per-codebook centroid
    distances — the reference's joint-cell scoring (coder.py:171-186),
    done with numpy over the tiny centroid tensor. Returns joint ids
    best-first (ties by id, unlike the reference's unstable argsort).

    ``limit=None`` ranks ALL cells (dense k^n scoring — only allowed
    up to ``_MAX_DENSE_CELLS``). With ``limit`` set, large codebooks
    use an EXACT top-``limit`` beam fold over codebooks — the
    driver-side twin of ``index.probe_cells_join``'s pruning, same
    exactness argument: a prefix pruned at stage j extends only to
    joint cells strictly dominated by the kept prefixes' extensions.
    """
    cents, coding_metric, k, n = coding_to_numpy(coding)
    metric = metric or coding_metric
    target = np.asarray(target, dtype="float64")
    sub_dim = cents.shape[2]
    per_codebook = [
        numpy_metric(metric, cents[j], target[j * sub_dim : (j + 1) * sub_dim]) for j in range(n)
    ]
    if k**n > _MAX_DENSE_CELLS:
        if limit is None:
            raise ValueError(
                f"ranking all {k**n:,} joint cells densely would allocate "
                f"{k**n * 8 / 2**30:.0f} GiB on the driver; pass limit= "
                "(e.g. the probe count) for the exact beam path"
            )
        return _beam_rank(per_codebook, k, n, limit)
    # score[joint] = Σ_j per_codebook[j][digit_j(joint)]
    score = np.zeros(k**n)
    for j in range(n):
        reps = k ** (n - 1 - j)
        tiles = k**j
        score += np.tile(np.repeat(per_codebook[j], reps), tiles)
    order = np.lexsort((np.arange(k**n), score))
    out = [int(i) for i in order]
    return out if limit is None else out[:limit]


def _beam_rank(per_codebook: list[np.ndarray], k: int, n: int, limit: int) -> list[int]:
    """Exact top-``limit`` (score, joint) fold, codebook 0 most
    significant — mirrors probe_cells_join's SQL fold including its
    left-to-right float addition order, so both paths return
    bit-identical rankings."""
    beam = [(0.0, 0)]
    for j in range(n):
        short = sorted((float(d), c) for c, d in enumerate(per_codebook[j]))[: min(k, limit)]
        beam = sorted((s + d, joint * k + c) for s, joint in beam for d, c in short)[:limit]
    return [joint for _, joint in beam]
