"""KNN search operators — the reference's flagship query surface.

- ``knn``           = C1 brute-force search (ref: src/fenix/io/index/
  index.py:81-170 with coding=None): [filter] → distance column →
  [select] → top-k.
- ``probe_filter``  = the IVF cell-pruning predicate used by C2
  (ref: index.py:113-126); composed by ``fenix_spark.operators.index``.
- ``similarity_join`` = batch KNN: every left row → top-k nearest right
  rows (not in the reference, which only serves one query vector per
  call; this is the distributed generalization).

Physical plan notes (verified via .explain, see tests):

- ``knn`` compiles to Scan → WholeStageCodegen(filter+project) →
  TakeOrderedAndProject. NO shuffle, NO global sort: each partition
  keeps its local top-k and the driver merges k·numPartitions rows.
  At 100 TB this is a single map pass — the optimal plan.
- the distance expression is pure Catalyst (zip_with/aggregate), so the
  scan only reads the vector column + selected columns (column pruning)
  and user filters push down to parquet row groups.
- ``similarity_join`` broadcasts the (small) query side and prunes with
  a window top-k; for large×large use the IVF variant in
  ``operators.index`` (cell-equi-join = shuffle on a low-cardinality
  key, then per-cell distance).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fenix_spark.functions.metrics import distance, query_literal, vec_double

DISTANCE_COL = "__DISTANCE__"


def knn(
    df: DataFrame,
    column: str,
    target: Sequence[float],
    metric: str = "l2",
    k: int = 10,
    filter: Column | None = None,  # noqa: A002 - mirrors reference kwarg
    select: Sequence[str] | None = None,
    id_col: str | None = None,
    dist_col: str = DISTANCE_COL,
) -> DataFrame:
    """Brute-force top-k nearest rows to ``target``.

    Mirrors the reference's search signature (source, column, target,
    metric, filter, select, maxval) from src/fenix/flight.py:242-257.
    Unlike the reference's tie-unstable ``select_k_unstable``
    (index.py:165-167), ties are broken by ``id_col`` when given, making
    output deterministic and oracle-checkable.
    """
    out = df
    if filter is not None:
        out = out.where(filter)
    out = out.withColumn(dist_col, distance(metric, vec_double(column), query_literal(target)))
    if select is not None:
        out = out.select(*select, dist_col)
    order = [F.col(dist_col).asc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    return out.orderBy(*order).limit(k)


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    column: str,
    metric: str = "l2",
    k: int = 1,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    dist_col: str = DISTANCE_COL,
) -> DataFrame:
    """For every left row, the k nearest right rows by ``metric``.

    Plan: broadcast the smaller (right) side → crossJoin (map-side, no
    shuffle) → one shuffle for the per-left-row window top-k. Output
    columns: left_id, right_id, ``dist_col``, rank.

    For two large sides, pre-bucket both by IVF cell and equi-join on
    ``__CODED_ID__`` instead (see operators/index.py), which replaces
    the crossJoin with a key join — the fenix-flavored join described
    in SURVEY.md §2.3.
    """
    lcol, rcol = f"__l_{column}", f"__r_{column}"
    l = left.select(F.col(left_id).alias("left_id"), vec_double(column).alias(lcol))
    r = right.select(F.col(right_id).alias("right_id"), vec_double(column).alias(rcol))
    joined = l.crossJoin(F.broadcast(r)).withColumn(dist_col, distance(metric, F.col(lcol), F.col(rcol)))
    w = Window.partitionBy("left_id").orderBy(F.col(dist_col).asc(), F.col("right_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("left_id", "right_id", dist_col, "rank")
    )
