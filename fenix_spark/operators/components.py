"""Connected components + canonical keep-list — the step that turns
near-dup PAIRS (operators/dedup.py) into dedup DECISIONS.

A verified pair list (a≈b, b≈c) is not yet a dedup policy: keeping
"the first of each pair" double-drops chains. The standard production
shape is: candidate pairs → verified pairs → CONNECTED COMPONENTS →
keep one canonical row per component. The reference has no analog
(its dedup story ends at exact row identity).

Algorithm: distributed min-label propagation. Every node starts
labeled with itself; each round every node takes the min label in its
closed neighborhood; converged when no label changes. Each round is
one equi-join + one groupBy — all-shuffle-on-id, no driver data. For
near-dup graphs components are small and chain-shaped (diameter d ⇒
⌈log₂ d⌉+1..d rounds; text-dup clusters almost always converge in
2-4). The iteration count is capped and the cap is an ERROR, not a
silent truncation — a partially-converged labeling would silently
under-dedup.

Scale notes: labels are (id, label) longs — 16 bytes/row shuffled per
round, never documents. Each round ``localCheckpoint``s (lineage would
otherwise deepen by two joins per round and re-execute everything on
every action). Convergence is detected with ``sum(label)``: labels
only ever decrease, so the sum is strictly monotone until fixpoint —
one cheap agg per round, no join-based diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy


def connected_components(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the MIN node id in the component (deterministic,
    engine-portable)."""
    edges = (
        pairs.select(F.col(left).alias("src"), F.col(right).alias("dst"))
        .union(pairs.select(F.col(right).alias("src"), F.col(left).alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .transform(_ckpt_lazy)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .transform(_ckpt_lazy)
    )
    prev_sum = labels.agg(F.sum("component")).head()[0]
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .transform(_ckpt_lazy)
        )
        cur_sum = labels.agg(F.sum("component")).head()[0]
        if cur_sum == prev_sum:  # labels only decrease → fixpoint
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the cap; raise max_iter (near-dup "
        "graphs converging this slowly usually mean the pair threshold "
        "is too loose)"
    )


def dedup_keep_list(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    left: str = "id_a",
    right: str = "id_b",
    prefer_col: str | None = None,
) -> DataFrame:
    """Rows of ``df`` that SURVIVE pair-based dedup: one canonical
    member of every duplicate component, plus every row in no pair at
    all.

    The canonical member is the minimum-id row (deterministic,
    engine-portable) — unless ``prefer_col`` names a column, in which
    case each component keeps its HIGHEST-``prefer_col`` row (min id
    among ties; null prefer values lose to any non-null). That is the
    production policy: when a quality score exists, dedup should keep
    the best copy, not the oldest id.

    The joins are on ids (+ one prefer value); document payloads ride
    along untouched (column-pruned until the final projection)."""
    comp = connected_components(pairs, left, right)
    if prefer_col is None:
        drop = comp.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("__drop_id")
        )
    else:
        scored = comp.join(
            df.select(
                F.col(id_col).alias("node"),
                F.col(prefer_col).alias("__pref"),
            ),
            "node",
        )
        # per-component winner: max prefer, min id on ties — one
        # max_by aggregate over (component)-keyed summary rows (nulls
        # sort last via the is-null flag in the ordering struct)
        winners = scored.groupBy("component").agg(
            F.max_by(
                F.col("node"),
                F.struct(
                    F.col("__pref").isNotNull().alias("has"),
                    F.col("__pref").alias("pref"),
                    (-F.col("node")).alias("neg_id"),
                ),
            ).alias("__keep_id")
        )
        drop = (
            comp.join(winners, "component")
            .where(F.col("node") != F.col("__keep_id"))
            .select(F.col("node").alias("__drop_id"))
        )
    return df.join(
        drop, df[id_col] == drop["__drop_id"], "left_anti"
    )
