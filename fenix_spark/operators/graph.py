"""Distributed PageRank over an edge DataFrame — link-based importance
for dedup-cluster canonicalization, domain authority weighting, and
citation-graph curation (Page et al. 1999; the Pregel formulation).

Scale shape (the same contract as ``operators/components.py``):

- State per iteration is ONE (node, rank) frame — 16 bytes a row.
  Contributions are an equi-join of edges against ranks on ``src``
  followed by a sum keyed by ``dst``: the two shuffles per round move
  (id, double) pairs, never payloads. Both frames are hash-partitioned
  on the SAME key column so AQE reuses the layout across rounds.
- ``localCheckpoint`` after every round truncates lineage — without
  it round t's plan contains all t−1 predecessors and analysis time
  grows quadratically (the components lesson).
- Dangling mass (nodes with no out-edges) is redistributed uniformly
  each round via one scalar aggregate — the standard correction that
  keeps ranks a probability distribution (Σ = 1, tested).
- Convergence is the L1 delta between successive rank vectors — one
  more scalar aggregate per round; non-convergence at ``max_iter``
  RAISES (the repo's no-silent-truncation rule). The delta contracts
  by ~``damping`` per round, so required rounds ≈ ln(tol)/ln(damping)
  — at the classic 0.85 that is ~85 rounds for 1e-6; budget max_iter
  accordingly (default 120).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 120,
) -> DataFrame:
    """(node, rank) for every node in the graph, Σ rank = 1.

    ``edges`` are directed (duplicate edges count once; self-loops
    dropped — both standard). Undirected graphs: pass each edge both
    ways before calling."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .transform(_ckpt_lazy)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(_ckpt_lazy)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (node, deg) with deg null for dangling nodes — one static frame
    nd = nodes.join(out_deg, nodes["node"] == out_deg["src"], "left").select(
        "node", "deg"
    ).transform(_ckpt_lazy)

    if max_iter < 1:
        raise ValueError(f"max_iter must be ≥ 1 (got {max_iter})")
    ranks = nd.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        # localCheckpoint: the dangling aggregate AND the contribs plan
        # both consume this join — without materialization each round
        # pays the ranks⋈deg shuffle twice
        with_deg = ranks.join(nd.select("node", "deg"), "node").transform(_ckpt_lazy)
        dangling = (
            with_deg.where(F.col("deg").isNull()).agg(F.sum("rank")).head()[0]
            or 0.0
        )
        contribs = (
            e.join(with_deg.where(F.col("deg").isNotNull()), e["src"] == with_deg["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base + damping * dangling / n)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .transform(_ckpt_lazy)
        )
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "prev"), "node")
            .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))))
            .head()[0]
        )
        ranks = new_ranks
        if delta < tol:
            return ranks
    raise RuntimeError(
        f"pagerank did not converge in {max_iter} rounds (last L1 delta "
        f"{delta:.2e} ≥ tol {tol:.0e}); raise max_iter or loosen tol"
    )
