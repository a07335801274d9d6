"""SemDeDup — semantic deduplication via cluster-scoped embedding
similarity (Abbas et al., 2023, arXiv:2303.09540).

The LLM-pipeline complement to the lexical family in
``operators/dedup.py``: MinHash catches near-identical *text*; SemDeDup
catches semantically redundant documents whose wording differs, by
comparing EMBEDDINGS — but only within k-means clusters, never across
the whole corpus.

Scale shape (the reason the paper's recipe works at 100 TB):

1. k-means assigns every row a cluster (``assign_code_expr`` — a
   native argmin expression over broadcast centroid literals; the
   codebook ships with the plan, assignment is scan-local).
2. Pairwise cosine runs ONLY within a cluster: a self-equi-join on the
   cluster id. The shuffle is keyed by cluster, and each task's pair
   work is |cluster|² — bounded by choosing k so clusters stay small
   (the paper uses k ≈ n/1000). No global GEMM, no |n|² anywhere.
3. Pairs above the threshold form duplicate groups via the existing
   min-label-propagation ``connected_components`` (16-byte label
   shuffles, no vectors).
4. Keep policy: per duplicate group, keep the member with the LOWEST
   cosine similarity to its cluster centroid (the paper's
   "keep hard examples" policy), ties broken by lowest id.

Zero-norm vectors have undefined cosine: they never enter the pair
join and always survive (keep = true), loudly documented rather than
silently NaN-dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.metrics import dot, norm, query_literal, vec_double
from fenix_spark.operators.coder import coding_to_numpy
from fenix_spark.operators.components import connected_components
from fenix_spark.operators.index import assign_code_expr
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy


def _unit(vec: Column) -> Column:
    """Unit-normalized copy of an array<double> vector (null for
    zero-norm inputs so downstream cosine is never NaN)."""
    n = norm(vec)
    return F.when(n > 0, F.transform(vec, lambda x: x / n))


def cluster_assignments(
    df: DataFrame, vec_col: str, id_col: str, coding: DataFrame
) -> DataFrame:
    """(id, cell, unit, cent_sim): cluster id, unit vector, and cosine
    similarity to the row's own cluster centroid.

    ``cent_sim`` comes from a broadcast join against the tiny centroid
    table (k rows), not a k-way CASE — the plan stays one scan + one
    broadcast hash join at any corpus size.
    """
    cents, _metric, k, n = coding_to_numpy(coding)
    spark = df.sparkSession
    if k**n > 65536:
        raise ValueError(
            f"coding has {k}^{n} joint cells — too many to materialize as "
            "a centroid table; SemDeDup wants a flat clustering "
            "(num_codebooks=1, k ~ n_rows/target_cluster_size)"
        )
    # joint-cell centroid table: concatenation of per-codebook centroids
    cent_rows = []
    for joint in range(k**n):
        parts: list[float] = []
        rem = joint
        for j in range(n):
            digit = (rem // (k ** (n - 1 - j))) % k
            parts.extend(float(x) for x in cents[j, digit])
        cent_rows.append((joint, parts))
    cent_df = spark.createDataFrame(cent_rows, "cell bigint, centroid array<double>")

    v = vec_double(F.col(vec_col))
    rows = df.select(
        F.col(id_col).alias("id"),
        assign_code_expr(vec_col, coding).alias("cell"),
        _unit(v).alias("unit"),
    )
    return (
        rows.join(F.broadcast(cent_df), "cell")
        .select(
            "id",
            "cell",
            "unit",
            F.coalesce(
                dot(F.col("unit"), _unit(F.col("centroid"))), F.lit(-1.0)
            ).alias("cent_sim"),
        )
    )


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    coding: DataFrame,
    threshold: float = 0.95,
) -> DataFrame:
    """(id_l, id_r, cos_sim) — within-cluster pairs with cosine
    similarity ≥ ``threshold`` (id_l < id_r; cos_sim rounded to 6dp and
    the threshold applied to the ROUNDED value, matching the repo-wide
    oracle-stable acceptance rule)."""
    asg = cluster_assignments(df, vec_col, id_col, coding).transform(_ckpt_lazy)
    return _pairs_from_assignments(asg, threshold)


def _pairs_from_assignments(asg: DataFrame, threshold: float) -> DataFrame:
    asg = asg.where(F.col("unit").isNotNull())
    l = asg.select(
        F.col("id").alias("id_l"), F.col("cell"), F.col("unit").alias("u_l")
    )
    r = asg.select(
        F.col("id").alias("id_r"), F.col("cell"), F.col("unit").alias("u_r")
    )
    return (
        l.join(r, "cell")
        .where(F.col("id_l") < F.col("id_r"))
        .withColumn("cos_sim", F.round(dot(F.col("u_l"), F.col("u_r")), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("id_l", "id_r", "cos_sim")
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    coding: DataFrame,
    threshold: float = 0.95,
) -> DataFrame:
    """(id, cell, cent_sim, keep) for every input row.

    keep = true for rows in no duplicate group, and for exactly one
    member per group: the lowest-centroid-similarity member (paper's
    keep-hard policy), ties broken by lowest id. Exactly-one-survivor
    per group and survivor-choice determinism are pinned by tests.
    """
    asg = cluster_assignments(df, vec_col, id_col, coding).transform(_ckpt_lazy)
    pairs = _pairs_from_assignments(asg, threshold)
    comp = connected_components(pairs, "id_l", "id_r")

    member = comp.join(asg, comp["node"] == asg["id"]).select(
        "component", "id", "cent_sim"
    )
    w_best = (
        member.groupBy("component")
        .agg(
            F.min(F.struct(F.col("cent_sim"), F.col("id"))).alias("best")
        )
        .select("component", F.col("best.id").alias("keep_id"))
    )
    decisions = member.join(w_best, "component").select(
        "id", (F.col("id") == F.col("keep_id")).alias("keep")
    )
    return (
        asg.join(decisions, "id", "left")
        .select(
            "id",
            "cell",
            (F.round("cent_sim", 6) + F.lit(0.0)).alias("cent_sim"),
            F.coalesce(F.col("keep"), F.lit(True)).alias("keep"),
        )
    )
