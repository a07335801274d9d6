"""Greedy k-center coreset selection — diverse subset curation.

Gonzalez's farthest-point traversal ("Clustering to minimize the
maximum intercluster distance", TCS 38, 1985 — public): repeatedly
pick the point FARTHEST from everything picked so far. The selected
set is a 2-approximation to the optimal k-center cover (no polynomial
algorithm beats 2−ε unless P=NP), which makes it the principled
"pick k maximally-diverse examples" primitive — the complement of
semantic dedup (operators/semdedup.py removes redundancy wholesale;
this SELECTS a bounded diverse subset, e.g. seed sets for active
learning / eval-slice construction, cf. Sener & Savarese, ICLR 2018).

Scale shape: the algorithm is k sequential rounds, each one distributed
scan that (a) folds the new center's distance into a running min-
distance column (a native zip_with/aggregate expression — no UDF, no
shuffle) and (b) takes a single max(struct(dist, id, vec)) aggregate
(map-side partial, one row to the driver). Driver state is just the
k chosen centers. Lineage is truncated every ``_TRUNC_EVERY`` rounds
via checkpoint.truncate_lineage so the expression tree and replay cost
stay bounded at large k. Total cost O(n·k) distance evaluations — the
same as one k-means iteration per center, with no materialized n×k
matrix anywhere.

Determinism: the first center is the row with the smallest
``hash60(id)`` (a pure function of the id set — layout/retry stable);
later ties on distance break by the LARGEST id (max-struct order).
The whole trajectory is a pure function of (id set, vectors, k).

The reference has no subset-selection surface at all (its sampling is
torch's in-memory permutation, src/fenix/io/batch/batch.py:16-46);
this is an extension for the training-data curation tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fenix_spark.checkpoint import truncate_lineage
from fenix_spark.functions.metrics import distance, query_literal, vec_double
from fenix_spark.functions.texthash import hash60

_TRUNC_EVERY = 8


def kcenter_select(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    metric: str = "l2",
    seed_id: str | None = None,
) -> tuple[DataFrame, float]:
    """Select k maximally-diverse rows by farthest-point traversal.

    Returns ``(centers, radius)``: ``centers`` has columns
    ``(id_col, center_order, center_dist)`` where ``center_order`` is
    the pick index (0-based) and ``center_dist`` the distance from the
    pick to its nearest EARLIER center (the coverage radius of the
    previous prefix; NULL for the first pick — ``center_dist`` is
    non-increasing, pinned in tests). ``radius`` is the final cover
    radius: max over all rows of the distance to the nearest center,
    i.e. every input row is within ``radius`` of some selected row —
    at most 2× the optimal k-center radius (Gonzalez 1985).

    ``seed_id`` overrides the deterministic hash-min first pick.
    Stops early (returning fewer rows) when the dataset has fewer than
    k distinct points."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = df.sparkSession
    base = (
        df.select(
            F.col(id_col).cast("string").alias("__id"),
            vec_double(vec_col).alias("__vec"),
        )
        .where(F.col("__vec").isNotNull())
        .dropDuplicates(["__id"])
    )

    if seed_id is not None:
        first = base.where(F.col("__id") == seed_id).head()
        if first is None:
            raise ValueError(f"seed_id {seed_id!r} not found")
    else:
        first = base.withColumn("__h", hash60(F.col("__id"))).orderBy(
            "__h", "__id"
        ).head()
        if first is None:
            raise ValueError("kcenter_select: empty input")

    picks = [(first["__id"], None)]  # (id, dist-at-pick)
    cur = base.withColumn(
        "__d", distance(metric, F.col("__vec"), query_literal(first["__vec"]))
    )
    while len(picks) < k:
        far = cur.agg(
            F.max(F.struct("__d", "__id", "__vec")).alias("m")
        ).head()["m"]
        if far is None or far["__d"] <= 0.0:
            break  # fewer than k distinct points — cover is already exact
        picks.append((far["__id"], float(far["__d"])))
        cur = cur.withColumn(
            "__d",
            F.least(
                F.col("__d"),
                distance(metric, F.col("__vec"), query_literal(far["__vec"])),
            ),
        )
        if len(picks) % _TRUNC_EVERY == 0:
            cur = truncate_lineage(cur)

    radius_row = cur.agg(F.max("__d").alias("r")).head()
    radius = float(radius_row["r"]) if radius_row["r"] is not None else 0.0
    centers = spark.createDataFrame(
        [(pid, i, d) for i, (pid, d) in enumerate(picks)],
        f"{id_col} string, center_order int, center_dist double",
    )
    return centers, radius


def assign_to_centers(
    df: DataFrame,
    centers: DataFrame,
    id_col: str,
    vec_col: str,
    metric: str = "l2",
) -> DataFrame:
    """Label every row with its nearest selected center (the k-center
    clustering induced by the cover): one broadcast join of the
    ≤ k-row center table against the data, min_by aggregate per row id
    — vectors shuffle only as the broadcast side, the data is scanned
    once."""
    cvec = "__cvec"
    cid = "__cid"
    cents = centers.alias("c")
    data = df.alias("d")
    joined = data.crossJoin(
        F.broadcast(
            cents.select(
                F.col(id_col).alias(cid), vec_double(vec_col).alias(cvec)
            )
        )
    )
    d = distance(metric, vec_double(f"d.{vec_col}"), F.col(cvec))
    return (
        joined.withColumn("__dist", d)
        .groupBy(f"d.{id_col}")
        .agg(
            F.min_by(F.col(cid), F.struct("__dist", cid)).alias("center_id"),
            F.min("__dist").alias("center_dist"),
        )
    )
