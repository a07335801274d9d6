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

__all__ = ["tune_probes", "tune_ivfpq", "recall_at_k"]


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


def tune_ivfpq(
    indexed: DataFrame,
    coarse: DataFrame,
    fine: DataFrame,
    column: str,
    target_recall: float = 0.95,
    k: int = 10,
    n_queries: int = 16,
    max_rerank: int | None = None,
    metric: str | None = None,
    id_col: str = "vec_id",
    salt: str = "tune",
    search=None,
) -> dict:
    """Joint (probes, rerank) tuning for ``ivfpq_search`` — the two
    knobs trade off against each other (more probes = more candidate
    IO; deeper rerank = more exact-distance reads on the shortlist),
    so tuning them separately leaves cost on the table. VERDICT r09
    #6: the suite's rerank depth was a fixed constant until this.

    One search per (query, probes) scores EVERY rerank depth: a rerank
    at depth r returns the exact-distance top-k of the ADC top-r
    shortlist, so recall at every r ≤ max_rerank is a pure function of
    ONE depth-``max_rerank`` ADC shortlist with exact distances
    attached — no per-depth re-search. Rerank recall is monotone
    non-decreasing in r by construction (a true-top-k member can only
    be displaced from the exact-top-k of a larger shortlist by another
    exact-closer candidate, which is itself a true-top-k member) —
    pinned in tests. ADC-only recall equals rerank at r = k (same id
    set, reordered), also pinned.

    Ground truth is ``batch_probe_search`` probing ALL coarse cells
    (exact distances over every row, one batched job). Returns::

        {"probes", "rerank", "recall", "met",
         "frontier": [(probes, rerank_or_None, recall), ...],
         "k", "n_queries", "n_cells", "max_rerank"}

    The chosen config is the cheapest meeting the target, ordered by
    probes (candidate IO dominates at scale) then rerank depth (None —
    no rerank join — cheapest). ``met=False`` returns the best recall
    seen (max probes + max rerank) when nothing reaches the target —
    the honest answer for a coding too coarse for the ask; buy recall
    with code bits (RECALL.md coding-size sweep), not depth.

    ``search`` defaults to ``index.ivfpq_search``; pass
    ``index.ivfpq_residual_search`` (same signature, no ``metric``)
    to tune the residual variant.
    """
    from fenix_spark.functions.metrics import distance, query_literal, vec_double
    from fenix_spark.operators.index import ivfpq_search
    from fenix_spark.operators.search import DISTANCE_COL

    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    if max_rerank is None:
        max_rerank = 8 * k
    if max_rerank < k:
        raise ValueError(f"max_rerank must be >= k, got {max_rerank} < {k}")
    if search is None:
        search = ivfpq_search
    _, coarse_metric, ck, cn = coding_to_numpy(coarse)
    metric = metric or coarse_metric
    n_cells = ck**cn

    sample = (
        indexed.withColumn(
            "__h", hash60(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
        )
        .orderBy("__h", id_col)
        .limit(n_queries)
        .drop("__h")
        .localCheckpoint(eager=True)
    )
    qvecs = [
        (r[0], list(r[1]))
        for r in sample.select(id_col, vec_double(column)).collect()
    ]

    truth_df = batch_probe_search(
        sample, indexed, coarse, column, metric=metric, k=k,
        probes=n_cells, query_id=id_col, right_id=id_col,
    ).select("query_id", "right_id")
    truth: dict = {}
    for r in truth_df.collect():
        truth.setdefault(r[0], set()).add(r[1])

    rerank_grid: list[int | None] = [None]
    r = 2 * k
    while r < max_rerank:
        rerank_grid.append(r)
        r *= 2
    rerank_grid.append(max_rerank)

    schedule = []
    p = 1
    while p < n_cells:
        schedule.append(p)
        p *= 2
    schedule.append(n_cells)

    extra_kwargs = {} if search is not ivfpq_search else {"metric": metric}
    frontier: list[tuple[int, int | None, float]] = []
    best: tuple[int, int | None, float] | None = None
    for probes in schedule:
        per_depth_hits = {d: 0 for d in rerank_grid}
        denom = 0
        for qid, vec in qvecs:
            want = truth.get(qid, set())
            denom += len(want)
            shortlist = search(
                indexed, coarse, fine, column, vec,
                k=max_rerank, probes=probes, rerank=None, id_col=id_col,
                select=(column,), **extra_kwargs,
            )
            exact = distance(metric, vec_double(column), query_literal(vec))
            rows = (
                shortlist.withColumn("__exact", exact)
                .orderBy(F.col(DISTANCE_COL).asc(), F.col(id_col).asc())
                .select(id_col, "__exact")
                .collect()
            )
            for d in rerank_grid:
                if d is None:
                    got = {r2[0] for r2 in rows[:k]}  # ADC order top-k
                else:
                    head = sorted(rows[:d], key=lambda r2: (r2[1], r2[0]))
                    got = {r2[0] for r2 in head[:k]}
                per_depth_hits[d] += len(got & want)
        for d in rerank_grid:
            rec = per_depth_hits[d] / denom if denom else 0.0
            frontier.append((probes, d, rec))
            if best is None and rec >= target_recall:
                best = (probes, d, rec)
        if best is not None:
            break
    if best is None:
        # nothing met the target: report the deepest config honestly
        best = frontier[-1]
    probes_star, rerank_star, recall_star = best
    return {
        "probes": probes_star,
        "rerank": rerank_star,
        "recall": recall_star,
        "met": recall_star >= target_recall,
        "frontier": frontier,
        "k": k,
        "n_queries": n_queries,
        "n_cells": n_cells,
        "max_rerank": max_rerank,
    }
