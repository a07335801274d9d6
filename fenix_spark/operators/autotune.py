"""ANN parameter auto-tuning — pick the smallest ``probes`` that meets
a recall target, MEASURED on the actual index and a deterministic
query sample instead of guessed from rules of thumb.

The reference exposes ``probes`` as a raw knob the caller must tune by
hand (ref: src/fenix/io/coder/coder.py config + flight.py search
kwargs); RECALL.md records this repo's static curves per round. This
module turns the curve into an operator: ground truth is the SAME
``batch_probe_search`` code path probing ALL k^n cells (probing every
cell scans every row — exact by construction, no second
implementation to disagree with), candidates are the doubling
schedule 1, 2, 4, …, n_cells, and recall@k is computed with one
distributed join per schedule point. Early-stops at the first point
meeting the target, so a well-clustered index costs ~log(probes*)
batch searches over a SAMPLE of queries.

Scale shape: the query sample is bottom-k-deterministic and small
(default 64); every batch search is the suite's equi-join plan
(probes/k^n of the index touched); recall math is a query-keyed join
over k·|sample| rows. Nothing full-corpus moves except the index
scans the searches themselves do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60
from fenix_spark.operators.coder import coding_to_numpy
from fenix_spark.operators.index import batch_probe_search

__all__ = ["tune_probes", "recall_at_k"]


def recall_at_k(approx: DataFrame, exact: DataFrame, query_id: str = "query_id") -> float:
    """Mean per-query fraction of the exact top-k ids recovered by the
    approximate result. Both frames carry (query_id, vec_id) rows —
    the comparison is an equi-join + two summary aggregates."""
    hits = approx.join(exact, [query_id, "vec_id"], "inner")
    per_q = (
        exact.groupBy(query_id)
        .agg(F.count(F.lit(1)).alias("n_true"))
        .join(
            hits.groupBy(query_id).agg(F.count(F.lit(1)).alias("n_hit")),
            query_id,
            "left",
        )
        .select(
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_true")).alias("r")
        )
    )
    row = per_q.agg(F.avg("r")).first()
    return float(row[0]) if row and row[0] is not None else 0.0


def tune_probes(
    indexed: DataFrame,
    coding: DataFrame,
    column: str,
    target_recall: float = 0.95,
    k: int = 10,
    n_queries: int = 64,
    metric: str | None = None,
    id_col: str = "vec_id",
    salt: str = "tune",
) -> dict:
    """Smallest ``probes`` in the doubling schedule whose measured
    recall@k on a deterministic query sample meets ``target_recall``.

    Returns ``{"probes", "recall", "curve": [(probes, recall), ...],
    "k", "n_queries", "n_cells"}``. ``probes`` is ``n_cells`` (exact
    search) when no smaller point meets the target — the honest answer
    for an index whose clustering doesn't support the ask. Queries are
    the ``n_queries`` rows with smallest ``hash60(id + salt)``
    (bottom-k: deterministic, layout-independent, re-runs comparable).
    """
    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    _, coding_metric, kk, n = coding_to_numpy(coding)
    metric = metric or coding_metric
    n_cells = kk**n

    queries = (
        indexed.withColumn(
            "__h", hash60(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
        )
        .orderBy("__h", id_col)
        .limit(n_queries)
        .drop("__h")
    )
    queries = queries.localCheckpoint(eager=True)

    exact = batch_probe_search(
        queries, indexed, coding, column, metric=metric, k=k,
        probes=n_cells, query_id=id_col, right_id=id_col,
    ).select("query_id", F.col("right_id").alias("vec_id"))
    exact = exact.localCheckpoint(eager=True)

    schedule = []
    p = 1
    while p < n_cells:
        schedule.append(p)
        p *= 2
    schedule.append(n_cells)

    curve: list[tuple[int, float]] = []
    for probes in schedule:
        if probes == n_cells:
            # probing every cell IS the ground truth: recall 1 by
            # construction, no need to re-run the search
            curve.append((n_cells, 1.0))
            break
        approx = batch_probe_search(
            queries, indexed, coding, column, metric=metric, k=k,
            probes=probes, query_id=id_col, right_id=id_col,
        ).select("query_id", F.col("right_id").alias("vec_id"))
        r = recall_at_k(approx, exact)
        curve.append((probes, r))
        if r >= target_recall:
            break
    probes_star, recall_star = curve[-1]
    return {
        "probes": probes_star,
        "recall": recall_star,
        "curve": curve,
        "k": k,
        "n_queries": n_queries,
        "n_cells": n_cells,
    }
