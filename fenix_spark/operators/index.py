"""IVF index build + probe search (reference C4 + C2,
src/fenix/io/index/index.py:37-65, 81-170).

The reference writes a row-position-aligned ``__CODED_ID__`` sidecar
file and h-stacks it on read (index.py:19-34) — impossible to do safely
under a distributed shuffle. Here the code column is CO-WRITTEN with the
data and the indexed table is PARTITIONED BY ``__CODED_ID__``, so the
probe filter ``__CODED_ID__ IN (top cells)`` becomes physical partition
pruning: a 16-of-64-cell probe reads ~25% of the files at any scale
(verified in tests/test_index.py via the executed plan's partition
count). This is the Spark-native equivalent of the reference's manual
``isin`` mask (index.py:119-126).

Code assignment is a pure Catalyst expression (argmin over k per-cell
distances, per codebook) — whole-stage codegen, no Python, no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fenix_spark.functions.metrics import distance, query_literal, vec_double
from fenix_spark.operators.coder import coding_to_numpy, rank_cells, sub_vector
from fenix_spark.operators.search import DISTANCE_COL, knn

CODE_COL = "__CODED_ID__"
PROBE_COL = "__PROBES__"


def assign_code_expr(column: str, coding: DataFrame, metric: str | None = None) -> Column:
    """Joint cell id of each row's vector as a native expression.

    Per codebook j: build the k-vector of distances from the row's
    sub-vector to each centroid (literal arrays — the codebook is tiny
    and ships with the plan), take argmin with lowest-cell tiebreak,
    then compose base-k digits: id = Σ_j cell_j · k^(n−1−j)
    (reference semantics, coder.py:171-181; top-1 at index.py:48-49).
    """
    cents, coding_metric, k, n = coding_to_numpy(coding)
    metric = metric or coding_metric
    sub_dim = cents.shape[2]
    joint = F.lit(0).cast("bigint")
    for j in range(n):
        sub = sub_vector(column, j, sub_dim)
        dists = F.array(
            *[distance(metric, sub, query_literal(cents[j, c])) for c in range(k)]
        )
        cell = F.array_position(dists, F.array_min(dists)) - 1  # 1-based → 0-based
        joint = joint + cell.cast("bigint") * F.lit(int(k ** (n - 1 - j))).cast("bigint")
    return joint


def build_index(
    df: DataFrame,
    column: str,
    coding: DataFrame,
    path: str,
    metric: str | None = None,
) -> None:
    """Write ``df`` + ``__CODED_ID__`` partitioned by the code — one map
    pass over the source, then a parquet layout where every IVF cell is
    its own partition directory (physical pruning for C2)."""
    out = df.withColumn(CODE_COL, assign_code_expr(column, coding, metric))
    out.write.mode("overwrite").partitionBy(CODE_COL).parquet(path)


def read_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def probe_search(
    indexed: DataFrame,
    coding: DataFrame,
    column: str,
    target: Sequence[float],
    metric: str | None = None,
    k: int = 10,
    probes: int | None = None,
    filter: Column | None = None,  # noqa: A002 - mirrors reference kwarg
    select: Sequence[str] | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """IVF probe search (C2): rank cells driver-side over the tiny
    centroid table, prepend ``__CODED_ID__ IN (top probes)`` to the
    user filter (→ partition pruning), then the brute-force KNN tail
    (C1). ``probes=None`` or ≥ k^n degenerates to exact search over all
    cells, matching reference behavior (index.py:113-126)."""
    _, coding_metric, kk, n = coding_to_numpy(coding)
    metric = metric or coding_metric
    pred = filter
    if probes is not None and probes < kk**n:
        cells = rank_cells(coding, target, metric)[:probes]
        cell_pred = F.col(CODE_COL).isin(cells)
        pred = cell_pred if pred is None else (cell_pred & pred)
    return knn(
        indexed, column, target, metric=metric, k=k, filter=pred, select=select, id_col=id_col
    )


def probe_cells_expr(column: str, coding: DataFrame, probes: int, metric: str | None = None) -> Column:
    """Array of each row's top-``probes`` joint cell ids, as a native
    expression — the set-at-a-time version of ``rank_cells``.

    Scores all k^n joint cells with the reference's sum-of-per-codebook-
    distances rule (coder.py:171-186), sorts (score, joint) structs —
    array_sort's lexicographic struct order gives the deterministic
    joint-id tiebreak — and keeps the first ``probes``. The k·n centroid
    literals ship with the plan; per-codebook distance arrays are
    let-bound via a nested transform so each of the n·k centroid
    distances is evaluated once per row, not once per joint cell.
    """
    cents, coding_metric, k, n = coding_to_numpy(coding)
    return _probe_cells_from_cents(column, cents, k, n, probes, metric or coding_metric)


# The joint-cell scoring expression enumerates all k^n cells IN THE
# EXPRESSION TREE. At the reference config (k=8, n=2 → 64 cells) this is
# ideal: the whole scorer is one codegen'd expression, zero shuffle. At
# production PQ configs (256^8 cells) it would explode the plan — gate
# it hard and point callers at the join alternative.
_MAX_ENUMERATED_CELLS = 4096


def _probe_cells_from_cents(
    column: str, cents, k: int, n: int, probes: int, metric: str
) -> Column:
    from fenix_spark.functions.texthash import let

    if k**n > _MAX_ENUMERATED_CELLS:
        raise ValueError(
            f"probe_cells_expr enumerates all k^n = {k**n:,} joint cells "
            f"in the expression tree (bound: {_MAX_ENUMERATED_CELLS:,}). "
            "For large codebooks score cells via a broadcast join against "
            "the centroid table instead: explode queries to (query, "
            "codebook) rows, broadcast-join the k centroids per codebook, "
            "aggregate per-codebook argmin scores, then window-top-probes "
            "per query — same result, plan size O(k*n) not O(k^n)."
        )
    sub_dim = cents.shape[2]

    dists = F.array(
        *[
            distance(metric, sub_vector(column, j, sub_dim), query_literal(cents[j, c]))
            for j in range(n)
            for c in range(k)
        ]
    )  # flat [j * k + c]

    def top_probes(d: Column) -> Column:
        scored = F.array(
            *[
                F.struct(
                    sum(
                        F.element_at(d, j * k + _digit(joint, j, k, n) + 1)
                        for j in range(n)
                    ).alias("score"),
                    F.lit(joint).cast("bigint").alias("joint"),
                )
                for joint in range(k**n)
            ]
        )
        return F.transform(
            F.slice(F.array_sort(scored), 1, probes), lambda s: s["joint"]
        )

    return let(dists, top_probes)


def _digit(joint: int, j: int, k: int, n: int) -> int:
    """Base-k digit j (codebook 0 most significant) of a joint cell id."""
    return (joint // k ** (n - 1 - j)) % k


def probe_cells_join(
    queries: DataFrame,
    coding: DataFrame,
    column: str,
    probes: int,
    metric: str | None = None,
    query_id: str = "vec_id",
) -> DataFrame:
    """Top-``probes`` joint cells per query via a BROADCAST JOIN against
    the centroid table — the large-codebook path ``probe_cells_expr``'s
    bound points at. Plan size is O(n); nothing anywhere is O(k^n).

    Returns (query_id, __qvec double-array, __PROBES__ array<bigint>),
    result-identical to ``probe_cells_expr`` (same (score, joint)
    ordering, same left-fold float addition order).

    Shape: explode each query into its n sub-vectors, broadcast-join
    the k·n centroid rows on codebook id, compute per-(query, codebook)
    distance to each of the k cells, keep a per-codebook SHORTLIST of
    the best min(k, probes) cells, then fold the n shortlists into
    joint cells with beam pruning to ``probes`` at every step.

    The shortlist + beam pruning are EXACT, not approximate: if a
    prefix is pruned at stage j, each of the ``probes`` kept prefixes
    extends (with the victim's own suffix digits) to a joint cell that
    strictly precedes the victim's in (score, joint) order — so the
    victim cannot reach the final top-``probes``. Per-query work is
    O(n·k + n·probes·min(k, probes)); the two aggregations shuffle only
    (query_id, shortlist) rows, never cells × queries.
    """
    cents_np, coding_metric, k, n = coding_to_numpy(coding)
    metric = metric or coding_metric
    sub_dim = cents_np.shape[2]
    cents = coding.select(
        F.col("codebook").alias("__j"),
        F.col("cell").alias("__cell"),
        F.col("centroid").alias("__cent"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        vec_double(column).alias("__qvec"),
        F.posexplode(
            F.array(*[sub_vector(column, j, sub_dim) for j in range(n)])
        ).alias("__j", "__sub"),
    )
    d = distance(metric, F.col("__sub"), F.col("__cent"))
    shortlists = (
        q.join(F.broadcast(cents), "__j")
        .select("query_id", "__qvec", "__j", d.alias("__d"), "__cell")
        .groupBy("query_id", "__j")
        .agg(
            F.first("__qvec").alias("__qvec"),
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__d").alias("d"), F.col("__cell").alias("cell")))
                ),
                1,
                min(k, probes),
            ).alias("__short"),
        )
    )
    books = shortlists.groupBy("query_id").agg(
        F.first("__qvec").alias("__qvec"),
        F.array_sort(
            F.collect_list(F.struct(F.col("__j").alias("j"), F.col("__short").alias("short")))
        ).alias("__books"),
    )
    init = F.array(
        F.struct(F.lit(0.0).alias("score"), F.lit(0).cast("bigint").alias("joint"))
    )
    combos = F.aggregate(
        F.col("__books"),
        init,
        lambda acc, b: F.slice(
            F.array_sort(
                F.flatten(
                    F.transform(
                        acc,
                        lambda a: F.transform(
                            b["short"],
                            lambda s: F.struct(
                                (a["score"] + s["d"]).alias("score"),
                                (a["joint"] * F.lit(k) + s["cell"].cast("bigint")).alias(
                                    "joint"
                                ),
                            ),
                        ),
                    )
                )
            ),
            1,
            probes,
        ),
    )
    return books.select(
        "query_id",
        "__qvec",
        F.transform(combos, lambda c: c["joint"]).alias(PROBE_COL),
    )


def batch_probe_search(
    queries: DataFrame,
    indexed: DataFrame,
    coding: DataFrame,
    column: str,
    metric: str | None = None,
    k: int = 10,
    probes: int = 16,
    query_id: str = "vec_id",
    right_id: str = "vec_id",
    round_to: int | None = None,
) -> DataFrame:
    """Batch IVF search = the fenix-flavored similarity JOIN (SURVEY.md
    §2.3): a whole DataFrame of queries against the indexed table in
    one plan, no driver round-trip per query.

    Plan: each query row derives its top-``probes`` cells natively
    (``probe_cells_expr``) and explodes to (query, cell) rows; these
    EQUI-JOIN the indexed table on ``__CODED_ID__`` — cell identity, a
    key join, not a crossJoin — then exact distances + a per-query
    window top-k. The query side broadcasts when small (Spark picks
    this up from sizes/AQE); two large sides shuffle on the cell id,
    which IVF keeps low-cardinality and balanced. At 100 TB the probe
    join touches probes/k^n of the index, mirroring single-query
    partition pruning (ref index.py:119-126) set-at-a-time.
    """
    cents, coding_metric, kk, n = coding_to_numpy(coding)
    metric = metric or coding_metric
    if kk**n > _MAX_ENUMERATED_CELLS:
        # large codebook: broadcast-join scorer, plan size O(n)
        q = probe_cells_join(queries, coding, column, probes, metric, query_id).select(
            "query_id", "__qvec", F.explode(PROBE_COL).alias("__probe")
        )
    else:
        # small codebook: pure projection, no aggregation shuffle
        q = queries.select(
            F.col(query_id).alias("query_id"),
            vec_double(column).alias("__qvec"),
            F.explode(
                _probe_cells_from_cents(column, cents, kk, n, probes, metric)
            ).alias("__probe"),
        )
    cand = q.join(indexed, q["__probe"] == indexed[CODE_COL])
    d = distance(metric, vec_double(column), F.col("__qvec"))
    if round_to is not None:
        # + 0.0 canonicalizes IEEE -0.0 → +0.0 for oracle-stable hashing
        d = F.round(d, round_to) + F.lit(0.0)
    cand = cand.select(
        "query_id", F.col(right_id).alias("right_id"), d.alias(DISTANCE_COL)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col(DISTANCE_COL).asc(), F.col("right_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
