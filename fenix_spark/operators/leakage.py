"""Leakage-safe dataset splitting: near-duplicate groups never
straddle a train/eval boundary.

A plain per-row hash split (sampling.hash_split) leaks whenever two
near-duplicate documents hash to different splits — the eval copy then
scores memorization, not generalization. The production fix (used by
every serious LLM data pipeline) is to split by DUPLICATE GROUP:

1. near-dup pairs (any of operators/dedup.py's families, or
   operators/semdedup.py) → connected components;
2. every row's split key = its component id (its own id if unpaired);
3. hash-split the KEY, so all members of a group inherit one split.

Scale shape: the component labeling is the existing min-label
propagation (16-byte shuffles); the inherit step is one left join of
(id, component) onto the corpus — ids only, text rides along pruned.
The audit is one extra aggregation over the labeled pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fenix_spark.operators.components import connected_components
from fenix_spark.operators.sampling import hash_split


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: Sequence[float],
    names: Sequence[str],
    left: str = "id_l",
    right: str = "id_r",
    salt: str = "",
) -> DataFrame:
    """``df`` + (``split_key``, ``split``): the hash split of the
    duplicate-component id (the row's own id when it appears in no
    pair). Deterministic for a fixed pair set; all members of a
    component always share a split."""
    comp = connected_components(pairs, left, right)
    keyed = df.join(comp, df[id_col] == comp["node"], "left").select(
        df["*"], F.coalesce(F.col("component"), df[id_col]).alias("split_key")
    )
    return (
        hash_split(keyed, "split_key", weights, names, salt)
    )


def split_leakage_report(
    split_df: DataFrame, pairs: DataFrame, id_col: str, left: str = "id_l", right: str = "id_r"
) -> DataFrame:
    """(split_l, split_r, n_pairs) over every near-dup pair — the audit
    that proves (or disproves) leak-freedom: off-diagonal rows are
    cross-split duplicate pairs. Run it on ANY split assignment; for
    ``leakage_safe_split`` output it must be diagonal (tested)."""
    s = split_df.select(F.col(id_col).alias("__id"), F.col("split"))
    return (
        pairs.join(s.withColumnRenamed("split", "split_l"), pairs[left] == s["__id"])
        .drop("__id")
        .join(s.withColumnRenamed("split", "split_r"), pairs[right] == s["__id"])
        .groupBy("split_l", "split_r")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
