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
        # dangling mass as a 1-row broadcast INSIDE the round's plan
        # (same arithmetic as the old driver-side collect — r14, guide
        # §5: the convergence delta is now the round's ONLY driver
        # action, so each round is one job instead of two)
        dangling_row = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        contribs = (
            e.join(with_deg.where(F.col("deg").isNotNull()), e["src"] == with_deg["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling_row))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.col("__dang") / F.lit(float(n))
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


def _undirected_simple(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(a, b) with a < b, self-loops dropped, duplicates and reversed
    duplicates collapsed — the canonical simple undirected edge set."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, triangles) — the number of triangles through every node
    of the UNDIRECTED simple graph (direction, duplicate edges and
    self-loops are all ignored; the global triangle count is
    ``sum(triangles) / 3``).

    Degree-ordered node-iterator (Schank & Wagner SEA'05; the
    MapReduce formulation is Suri & Vassilvitskii WWW'11): orient
    every edge from the endpoint of lower (degree, id) toward higher,
    enumerate length-2 paths ("wedges") ONLY at their lowest-rank
    vertex, and close each wedge with one equi-join back against the
    oriented edge set. Every triangle is emitted exactly once — at its
    minimum-rank corner.

    Scale shape: the orientation bounds per-node wedge fan-out by the
    node's OUT-degree in the oriented graph, which is O(√m) for every
    node regardless of raw degree — a 10M-follower hub generates ZERO
    wedges because all its edges point inward (its neighbors have
    lower degree, so the hub is every edge's higher-rank endpoint).
    Total wedge rows are O(m^{3/2}) worst case instead of Σ deg² —
    the difference between feasible and not on a power-law graph.
    Every shuffle carries ids + one degree long per row, never
    payloads; the closing probe is a 2-column equi-join that AQE can
    plan as broadcast when the wedge side is small.

    Degree attachment (r14, guide §2.4/§5): the symmetric adjacency
    (x, y) holds node v as ``x`` in exactly deg(v) rows AND as ``y``
    in exactly deg(v) rows, so two window counts — partitioned by
    ``x``, then by ``y`` — put BOTH endpoint degrees on every
    directed row in two keyed shuffles of (id, id) pairs. That
    replaces the r13 shape's separate degree aggregation plus two
    degree-attach joins, and collapses the build's THREE sequential
    lineage-truncated materializations (und → deg → oriented) into
    ONE: the whole scan → self-join → distinct → windows → orient
    pipeline now materializes exactly once, at ``oriented``.

    Trade-off (documented, r14): a window partitioned by a node key
    buffers that node's deg(v) rows in one task, so an extreme hub on
    a power-law graph serializes there (the groupBy-degree + two-join
    shape in git history is the skew-safe alternative; partial
    aggregation spreads the hub). Interleaved A/B at sf0.1 (capped-
    degree suite graph): windows 1.82–1.90 s vs joins 2.14–2.19 s,
    stages 16 → 13.
    """
    from pyspark.sql import Window

    # symmetric simple adjacency: each undirected edge as BOTH directed
    # rows, self-loops out, duplicates (and reversed duplicates)
    # collapsed by one distinct over the directed pair
    adj = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("x"), F.col(dst).alias("y")),
                    F.struct(F.col(dst).alias("x"), F.col(src).alias("y")),
                )
            ).alias("e")
        )
        .select("e.x", "e.y")
        .where(F.col("x") != F.col("y"))
        .distinct()
    )
    adj = adj.withColumn(
        "deg_x", F.count(F.lit(1)).over(Window.partitionBy("x"))
    ).withColumn("deg_y", F.count(F.lit(1)).over(Window.partitionBy("y")))
    # Orient low-rank → high-rank under the total order (deg, id):
    # keep the one direction whose source is the lower-rank endpoint.
    x_below_y = (F.col("deg_x") < F.col("deg_y")) | (
        (F.col("deg_x") == F.col("deg_y")) & (F.col("x") < F.col("y"))
    )
    oriented = (
        adj.where(x_below_y)
        .select(
            F.col("x").alias("lo"),
            F.col("y").alias("hi"),
            F.col("deg_y").alias("hi_deg"),
        )
        .transform(_ckpt_lazy)
    )
    e1 = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("hi_deg").alias("v_deg")
    )
    e2 = oriented.select(
        F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("hi_deg").alias("w_deg")
    )
    # Wedge (u, v, w) with rank(v) < rank(w): both arms leave u, so u is
    # the wedge's minimum-rank vertex; the v<w rank filter halves the
    # self-join and fixes the closing edge's orientation (v → w).
    v_below_w = (F.col("v_deg") < F.col("w_deg")) | (
        (F.col("v_deg") == F.col("w_deg")) & (F.col("v") < F.col("w"))
    )
    wedges = e1.join(e2, "u").where(v_below_w).select("u", "v", "w")
    closing = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tri = wedges.join(closing, ["v", "w"])  # one row per triangle
    corner_counts = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    # node universe (zero-triangle nodes included): every node with an
    # edge appears in the oriented frame as lo or hi of that edge
    nodes = (
        oriented.select(F.explode(F.array("lo", "hi")).alias("node")).distinct()
    )
    return (
        nodes.join(corner_counts, "node", "left")
        .select("node", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, degree, triangles, coefficient) — the local clustering
    coefficient 2·T_v / (deg_v·(deg_v−1)) (Watts & Strogatz 1998),
    0.0 for degree < 2. One id-keyed join of the triangle frame
    against the degree frame on top of :func:`triangle_count`."""
    und = _undirected_simple(edges, src, dst)
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_count(edges, src, dst)
    return deg.join(tri, "node").select(
        "node",
        "degree",
        "triangles",
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("coefficient"),
    )


def core_numbers(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 100
) -> DataFrame:
    """(node, core) — every node's coreness (the largest k such that
    the node survives in the k-core) of the undirected simple graph.

    Iterated neighborhood h-index (Lü, Zhou, Zhang, Stanley, Nature
    Physics 2016; the distributed formulation is Montresor, De
    Pellegrini & Miorandi, IEEE TPDS 2013): every node starts at its
    degree and repeatedly replaces its estimate with the h-index of
    its neighbors' estimates — the largest h such that at least h
    neighbors currently estimate ≥ h. Estimates only ever decrease
    and the fixpoint is exactly the core number.

    Scale shape: state is ONE (node, est) frame of longs; each round
    is one id-keyed equi-join (adjacency ⋈ estimates) plus one
    windowed aggregate — the h-index of a sorted descending list
    x₁ ≥ x₂ ≥ … is max_i min(i, x_i), so it needs a per-node sort of
    NEIGHBOR ESTIMATES only (longs, never payloads). Convergence is
    detected with sum(est): estimates are monotone non-increasing, so
    an unchanged sum is a fixpoint — one scalar agg per round, no
    join-based diff. Rounds needed are bounded by the graph's
    degeneracy ordering depth; real graphs converge in O(10).
    """
    from pyspark.sql import Window

    und = _undirected_simple(edges, src, dst)
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .union(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .transform(_ckpt_lazy)
    )
    est = (
        adj.groupBy("node")
        .agg(F.count(F.lit(1)).alias("est"))
        .transform(_ckpt_lazy)
    )
    prev_sum = est.agg(F.sum("est")).head()[0]
    if prev_sum is None:
        return est.withColumnRenamed("est", "core")
    nbr_est = est.select(F.col("node").alias("nbr"), F.col("est").alias("nbr_est"))
    w = Window.partitionBy("node").orderBy(F.desc("nbr_est"), F.asc("nbr"))
    for _ in range(max_iter):
        est = (
            adj.join(nbr_est, "nbr")
            .withColumn("rn", F.row_number().over(w))
            .groupBy("node")
            .agg(F.max(F.least(F.col("rn"), F.col("nbr_est"))).alias("est"))
            .transform(_ckpt_lazy)
        )
        cur_sum = est.agg(F.sum("est")).head()[0]
        if cur_sum == prev_sum:  # monotone non-increasing → fixpoint
            return est.withColumnRenamed("est", "core")
        prev_sum = cur_sum
        nbr_est = est.select(
            F.col("node").alias("nbr"), F.col("est").alias("nbr_est")
        )
    raise RuntimeError(
        f"core_numbers did not converge in {max_iter} rounds; raise max_iter"
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 30,
) -> DataFrame:
    """(node, dist) — directed hop distance from the nearest node of
    ``sources`` (a one-column frame), for every node within
    ``max_depth`` hops. The crawl-depth / link-distance primitive:
    distance from the seed list is a standard crawl-quality signal
    (pages far from any seed are disproportionately spam), and
    unreachable-from-seeds is a discovery gap report.

    Pregel-style frontier expansion: round t joins the CURRENT
    FRONTIER (nodes first reached at distance t) against the edge
    list and anti-joins the visited set — every round shuffles
    (id, id) pairs proportional to the frontier's out-edges, never
    payloads and never the whole graph's state. Terminates when the
    frontier empties (diameter reached) or at ``max_depth``; hitting
    the cap is NOT an error — BFS to depth d is a complete answer for
    "everything within d hops" (nodes beyond it are simply absent),
    unlike the iterative fixpoints above where truncation would be a
    wrong answer.

    Undirected graphs: pass each edge both ways (same convention as
    :func:`pagerank`).
    """
    if max_depth < 0:
        raise ValueError(f"max_depth must be ≥ 0 (got {max_depth})")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .transform(_ckpt_lazy)
    )
    [src_col] = sources.columns
    visited = (
        sources.select(F.col(src_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .transform(_ckpt_lazy)
    )
    frontier = visited.select("node")
    for depth in range(1, max_depth + 1):
        reached = (
            e.join(frontier, e["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        fresh = reached.join(visited.select("node"), "node", "left_anti").transform(
            _ckpt_lazy
        )
        if not fresh.head(1):
            return visited
        visited = visited.unionByName(
            fresh.withColumn("dist", F.lit(depth))
        ).transform(_ckpt_lazy)
        frontier = fresh.select("node")
    return visited


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, community) — density-based community detection by label
    propagation (Raghavan, Albert & Kumara, Phys. Rev. E 2007) over
    the undirected simple graph, made DETERMINISTIC and
    oscillation-free:

    - update rule: adopt the most frequent label in the CLOSED
      neighborhood (neighbors + the node's own current label — the
      self-inclusive LPA variant), ties broken by the smallest label
      (no RNG anywhere). Self-inclusion is what damps the label-swap
      oscillation synchronous neighbor-only LPA exhibits on bipartite
      structures;
    - schedule: two half-sweeps by node-id parity against a frozen
      snapshot each — deterministic and fully data-parallel within a
      phase, and the staggering lets information cross a frontier in
      one sweep instead of two;
    - termination: a full sweep with zero label changes. Hitting
      ``max_iter`` RAISES — a half-converged labeling silently
      under-merges communities (the components contract).

    Communities are denser-than-their-surroundings groups — unlike
    :func:`connected_components` (reachability = one label per
    component), LPA splits a sparse bridge between two cliques.

    Scale shape: per phase, one id-keyed equi-join (adjacency ⋈
    labels) + one (node, label) count aggregate + one max_by per node
    — shuffle rows are (id, label) longs, state is ONE (node, label)
    frame, lineage truncated per phase. Label ids are node ids, so the
    output is engine-portable and join-stable."""
    und = _undirected_simple(edges, src, dst)
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .union(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .transform(_ckpt_lazy)
    )
    labels = (
        adj.select("node").distinct().withColumn("community", F.col("node"))
    ).transform(_ckpt_lazy)
    for _ in range(max_iter):
        changed_total = 0
        for parity in (0, 1):
            nbr_lab = labels.select(
                F.col("node").alias("nbr"), F.col("community").alias("nlab")
            )
            votes = (
                adj.where(F.col("node") % 2 == parity)
                .join(nbr_lab, "nbr")
                .select("node", "nlab")
                .unionByName(
                    labels.where(F.col("node") % 2 == parity).select(
                        "node", F.col("community").alias("nlab")
                    )
                )
            )
            best = (
                votes.groupBy("node", "nlab")
                .agg(F.count(F.lit(1)).alias("c"))
                .groupBy("node")
                .agg(
                    F.max_by(
                        F.col("nlab"),
                        F.struct(
                            F.col("c").alias("c"),
                            (-F.col("nlab")).alias("neg"),
                        ),
                    ).alias("new_lab")
                )
            )
            updated = (
                labels.join(best, "node", "left")
                .select(
                    "node",
                    F.coalesce("new_lab", "community").alias("community"),
                    (
                        F.col("new_lab").isNotNull()
                        & (F.col("new_lab") != F.col("community"))
                    ).alias("__chg"),
                )
                .transform(_ckpt_lazy)
            )
            changed = updated.where(F.col("__chg")).count()
            labels = updated.drop("__chg")
            changed_total += changed
        if changed_total == 0:
            return labels
    raise RuntimeError(
        f"label_propagation did not converge in {max_iter} sweeps; "
        "raise max_iter"
    )


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 120,
) -> DataFrame:
    """(node, rank) — PageRank with the teleport mass restarted ONLY
    into ``sources`` (a one-column seed frame) instead of uniformly:
    ranks measure proximity/authority RELATIVE to the seeds (Page et
    al. 1999 §6; the standard seed-expansion tool — "given these known
    good domains, which pages does the link graph vouch for?").
    Σ rank = 1 as in the global variant; nodes unreachable from every
    seed converge to rank 0.

    Same scale shape as :func:`pagerank` — (node, rank) state, two
    id-keyed shuffles per round, scalar dangling/delta aggregates —
    with the restart vector a broadcast-joined membership flag
    (seeds are a tiny frame by definition). Dangling mass restarts
    into the seeds too, keeping the distribution proper."""
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
    [seed_col] = sources.columns
    seeds = sources.select(F.col(seed_col).alias("node")).distinct()
    n_seeds = seeds.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank needs at least one seed")
    tagged = nodes.join(
        F.broadcast(seeds.withColumn("__seed", F.lit(True))), "node", "left"
    ).select("node", F.coalesce("__seed", F.lit(False)).alias("is_seed"))
    if tagged.where(F.col("is_seed")).count() != n_seeds:
        raise ValueError("every seed must appear in the edge set")
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nd = (
        tagged.join(out_deg, tagged["node"] == out_deg["src"], "left")
        .select("node", "is_seed", "deg")
        .transform(_ckpt_lazy)
    )
    if max_iter < 1:
        raise ValueError(f"max_iter must be ≥ 1 (got {max_iter})")
    # start from the restart distribution itself
    ranks = nd.select(
        "node",
        F.when(F.col("is_seed"), 1.0 / n_seeds).otherwise(0.0).alias("rank"),
    )
    for _ in range(max_iter):
        with_deg = ranks.join(
            nd.select("node", "is_seed", "deg"), "node"
        ).transform(_ckpt_lazy)
        dangling = (
            with_deg.where(F.col("deg").isNull()).agg(F.sum("rank")).head()[0]
            or 0.0
        )
        contribs = (
            e.join(
                with_deg.where(F.col("deg").isNotNull()),
                e["src"] == with_deg["node"],
            )
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        restart = (1.0 - damping) + damping * dangling
        new_ranks = (
            nd.select("node", "is_seed")
            .join(contribs, nd["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.when(F.col("is_seed"), restart / n_seeds).otherwise(0.0)
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
        f"personalized_pagerank did not converge in {max_iter} rounds "
        f"(last L1 delta {delta:.2e} ≥ tol {tol:.0e})"
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    tol: float = 1e-8,
    max_iter: int = 100,
) -> DataFrame:
    """(node, hub, authority) — Kleinberg's HITS (JACM 1999): mutually
    reinforcing hub scores (points at good authorities) and authority
    scores (pointed at by good hubs), each L2-normalized per round
    (the power iteration on AᵀA / AAᵀ). PageRank ranks by global
    random-surfer mass; HITS separates "good directory" from "good
    destination" — the curation use is seed-list expansion and
    link-farm diagnosis (farms show high hub / low authority).

    Same scale skeleton as :func:`pagerank`: state is ONE (node, hub,
    authority) frame, each round is two id-keyed equi-join+aggregate
    passes (authority from in-edges' hubs, hubs from out-edges' new
    authorities), two scalar norm aggregates, lineage truncated per
    round. Convergence is the L1 delta of both vectors;
    non-convergence raises."""
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
        return nodes.withColumn("hub", F.lit(0.0)).withColumn(
            "authority", F.lit(0.0)
        )
    if max_iter < 1:
        raise ValueError(f"max_iter must be ≥ 1 (got {max_iter})")
    init = 1.0 / (n**0.5)
    state = nodes.select(
        "node", F.lit(init).alias("hub"), F.lit(init).alias("authority")
    )
    for _ in range(max_iter):
        # Both L2 norms ride the round's plan as 1-row broadcasts (same
        # doubles as the old driver-side collects; zero-norm guarded
        # exactly like the old ``or 1.0`` — r14, guide §5): the
        # convergence delta is the round's ONLY driver action, so each
        # round is one job instead of three.
        # authority(v) = Σ hub(u) over in-edges (u → v), then L2-norm
        auth_raw = (
            e.join(
                state.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        a = nodes.join(auth_raw, "node", "left").select(
            "node", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")
        )
        a_norm_row = a.agg(F.sqrt(F.sum(F.col("a_raw") ** 2)).alias("__an")).select(
            F.when(F.col("__an") == 0.0, F.lit(1.0)).otherwise(F.col("__an")).alias("__an")
        )
        a = (
            a.crossJoin(F.broadcast(a_norm_row))
            .select("node", (F.col("a_raw") / F.col("__an")).alias("authority"))
            .transform(_ckpt_lazy)
        )
        # hub(u) = Σ authority(v) over out-edges, from the NEW authorities
        hub_raw = (
            e.join(a.select(F.col("node").alias("dst"), "authority"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("h_raw"))
        )
        h = nodes.join(hub_raw, "node", "left").select(
            "node", F.coalesce("h_raw", F.lit(0.0)).alias("h_raw")
        )
        h_norm_row = h.agg(F.sqrt(F.sum(F.col("h_raw") ** 2)).alias("__hn")).select(
            F.when(F.col("__hn") == 0.0, F.lit(1.0)).otherwise(F.col("__hn")).alias("__hn")
        )
        h = (
            h.crossJoin(F.broadcast(h_norm_row))
            .select("node", (F.col("h_raw") / F.col("__hn")).alias("hub"))
            .transform(_ckpt_lazy)
        )
        new_state = h.join(a, "node").transform(_ckpt_lazy)
        delta = (
            new_state.join(
                state.select(
                    "node",
                    F.col("hub").alias("ph"),
                    F.col("authority").alias("pa"),
                ),
                "node",
            )
            .agg(
                F.sum(
                    F.abs(F.col("hub") - F.col("ph"))
                    + F.abs(F.col("authority") - F.col("pa"))
                )
            )
            .head()[0]
        )
        state = new_state
        if delta < tol:
            return state
    raise RuntimeError(
        f"hits did not converge in {max_iter} rounds (last L1 delta "
        f"{delta:.2e} ≥ tol {tol:.0e})"
    )
