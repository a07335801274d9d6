"""PageRank tests: numpy power-iteration parity (with dangling
redistribution), distribution invariant, structure sanity, and the
loud non-convergence contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.graph import pagerank


def _numpy_pagerank(n, edge_list, damping=0.6, iters=300):
    m = np.zeros((n, n))
    deg = np.zeros(n)
    for s, d in edge_list:
        m[d, s] = 1.0
        deg[s] += 1
    for s in range(n):
        if deg[s]:
            m[:, s] /= deg[s]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (m @ r + dangling / n)
    return r


@pytest.fixture(scope="module")
def star_graph(spark):
    # hub 0 pointed at by 1..5; 0 points at 1; 5 is reachable-only
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    return spark.createDataFrame(edges, "src bigint, dst bigint"), edges


def test_matches_numpy_power_iteration(spark, star_graph):
    df, edges = star_graph
    got = {r.node: r.rank for r in pagerank(df, damping=0.6, tol=1e-9).collect()}
    want = _numpy_pagerank(6, edges)
    assert set(got) == set(range(6))
    for i in range(6):
        assert abs(got[i] - want[i]) < 1e-8


def test_ranks_sum_to_one_with_dangling(spark):
    # 2 is dangling (no out-edges): mass must be redistributed
    df = spark.createDataFrame([(0, 1), (1, 2)], "src bigint, dst bigint")
    rows = pagerank(df, damping=0.6, tol=1e-10).collect()
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-9


def test_hub_outranks_spokes(spark, star_graph):
    df, _ = star_graph
    got = {r.node: r.rank for r in pagerank(df, damping=0.6).collect()}
    assert got[0] == max(got.values())
    # node 1 receives from the hub → beats the other spokes
    assert got[1] > got[2]


def test_nonconvergence_raises(spark, star_graph):
    df, _ = star_graph
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(df, tol=1e-15, max_iter=2)


# ---------------------------------------------------------------------------
# triangle_count / clustering_coefficient / core_numbers


from itertools import combinations

from fenix_spark.operators.graph import (
    clustering_coefficient,
    core_numbers,
    triangle_count,
)


def _random_edges(n, p, seed):
    rng = np.random.default_rng(seed)
    return [(a, b) for a, b in combinations(range(n), 2) if rng.random() < p]


def _adj(n, edge_list):
    nbrs = {i: set() for i in range(n)}
    for a, b in edge_list:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    return {k: v for k, v in nbrs.items() if v}


def _brute_triangles(nbrs):
    t = {v: 0 for v in nbrs}
    for v in nbrs:
        for a, b in combinations(sorted(nbrs[v]), 2):
            if b in nbrs.get(a, ()):
                t[v] += 1
    return t


def _brute_cores(nbrs):
    """Textbook peeling: repeatedly remove min-degree nodes."""
    nbrs = {v: set(ns) for v, ns in nbrs.items()}
    core = {}
    k = 0
    while nbrs:
        v = min(nbrs, key=lambda x: (len(nbrs[x]), x))
        k = max(k, len(nbrs[v]))
        core[v] = k
        for u in nbrs.pop(v):
            nbrs[u].discard(v)
            if not nbrs[u]:
                core[u] = max(k, 0) if u in core else k
                nbrs.pop(u, None)
    return core


def test_triangle_count_matches_brute_force(spark):
    edges = _random_edges(40, 0.15, seed=7)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    want = _brute_triangles(_adj(40, edges))
    assert got == want


def test_triangle_count_planted_clique_and_path(spark):
    # K6: every vertex in C(5,2)=10 triangles, 20 total; path: zero
    clique = list(combinations(range(6), 2))
    path = [(10 + i, 11 + i) for i in range(5)]
    df = spark.createDataFrame(clique + path, "src bigint, dst bigint")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert all(got[v] == 10 for v in range(6))
    assert all(got[v] == 0 for v in range(10, 16))
    assert sum(got.values()) % 3 == 0 and sum(got.values()) // 3 == 20


def test_triangle_count_ignores_direction_dups_and_loops(spark):
    messy = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 2), (0, 1)]
    df = spark.createDataFrame(messy, "src bigint, dst bigint")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_clustering_coefficient_matches_brute(spark):
    edges = _random_edges(30, 0.2, seed=11)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    nbrs = _adj(30, edges)
    tri = _brute_triangles(nbrs)
    for r in clustering_coefficient(df).collect():
        d = len(nbrs[r.node])
        assert r.degree == d
        want = 2.0 * tri[r.node] / (d * (d - 1)) if d >= 2 else 0.0
        assert abs(r.coefficient - want) < 1e-12
        assert 0.0 <= r.coefficient <= 1.0


def test_core_numbers_matches_brute_peeling(spark):
    edges = _random_edges(35, 0.15, seed=23)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.core for r in core_numbers(df).collect()}
    assert got == _brute_cores(_adj(35, edges))


def test_core_numbers_planted_structures(spark):
    # K5 (coreness 4) bridged to a path (coreness 1) and a 4-cycle (2)
    clique = list(combinations(range(5), 2))
    path = [(4, 10), (10, 11), (11, 12)]
    cycle = [(20, 21), (21, 22), (22, 23), (23, 20)]
    df = spark.createDataFrame(clique + path + cycle, "src bigint, dst bigint")
    got = {r.node: r.core for r in core_numbers(df).collect()}
    assert all(got[v] == 4 for v in range(5))
    assert got[10] == got[11] == got[12] == 1
    assert all(got[v] == 2 for v in (20, 21, 22, 23))


def test_triangle_hub_generates_no_wedges(spark):
    # A star's hub is every edge's higher-rank endpoint: the oriented
    # self-join must stay empty (the degree-ordering scale guarantee),
    # and the result is still correct.
    star = [(0, i) for i in range(1, 50)]
    df = spark.createDataFrame(star, "src bigint, dst bigint")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert set(got.values()) == {0}


def test_bfs_distances_matches_brute(spark):
    from collections import deque

    from fenix_spark.operators.graph import bfs_distances

    edges = _random_edges(40, 0.08, seed=31)
    # directed: use pairs as generated (a < b) PLUS some reversed
    directed = edges + [(b, a) for a, b in edges[::3]]
    df = spark.createDataFrame(directed, "src bigint, dst bigint")
    srcs = spark.createDataFrame([(0,), (7,)], "node bigint")
    got = {r.node: r.dist for r in bfs_distances(df, srcs).collect()}

    adj = {}
    for a, b in directed:
        if a != b:
            adj.setdefault(a, set()).add(b)
    want, dq = {0: 0, 7: 0}, deque([0, 7])
    while dq:
        u = dq.popleft()
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    assert got == want


def test_bfs_depth_cap_is_a_complete_prefix(spark):
    from fenix_spark.operators.graph import bfs_distances

    chain = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(chain, "src bigint, dst bigint")
    srcs = spark.createDataFrame([(0,)], "node bigint")
    got = {r.node: r.dist for r in bfs_distances(df, srcs, max_depth=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # nothing beyond, nothing wrong
    full = {r.node: r.dist for r in bfs_distances(df, srcs).collect()}
    assert full == {i: i for i in range(11)}


def test_bfs_directionality_and_unreachable(spark):
    from fenix_spark.operators.graph import bfs_distances

    df = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 5)], "src bigint, dst bigint"
    )
    srcs = spark.createDataFrame([(1,)], "node bigint")
    got = {r.node: r.dist for r in bfs_distances(df, srcs).collect()}
    # 3 points INTO 2 but is not reachable from 1; 4/5 disconnected
    assert got == {1: 0, 2: 1}


def test_label_propagation_splits_bridged_cliques(spark):
    from fenix_spark.operators.graph import label_propagation

    # two K6 cliques joined by ONE bridge edge: connected_components
    # sees one blob; LPA must find two communities
    c1 = list(combinations(range(6), 2))
    c2 = list(combinations(range(10, 16), 2))
    bridge = [(5, 10)]
    df = spark.createDataFrame(c1 + c2 + bridge, "src bigint, dst bigint")
    got = {r.node: r.community for r in label_propagation(df).collect()}
    left = {got[v] for v in range(6)}
    right = {got[v] for v in range(10, 16)}
    assert len(left) == 1 and len(right) == 1 and left != right

    from fenix_spark.operators.graph import bfs_distances  # noqa: F401
    from fenix_spark.operators.components import connected_components

    comp = {
        r.node: r.component
        for r in connected_components(
            df.withColumnRenamed("src", "id_a").withColumnRenamed("dst", "id_b"),
        ).collect()
    }
    assert len(set(comp.values())) == 1  # the contrast that motivates LPA


def test_label_propagation_deterministic_and_bipartite_safe(spark):
    from fenix_spark.operators.graph import label_propagation

    # complete bipartite K3,3 — the classic synchronous-LPA oscillator
    edges = [(i, 10 + j) for i in range(3) for j in range(3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = sorted(map(tuple, label_propagation(df).collect()))
    b = sorted(map(tuple, label_propagation(df.repartition(7)).collect()))
    assert a == b  # terminated (no oscillation) and layout-independent
    # one community: K3,3 is a single dense blob
    assert len({c for _, c in a}) == 1


def test_personalized_pagerank_matches_numpy(spark):
    from fenix_spark.operators.graph import personalized_pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    seeds = spark.createDataFrame([(0,), (3,)], "node bigint")
    got = {
        r.node: r.rank
        for r in personalized_pagerank(df, seeds, damping=0.6, tol=1e-10).collect()
    }

    n = 6
    m = np.zeros((n, n))
    deg = np.zeros(n)
    for s, d in edges:
        m[d, s] = 1.0
        deg[s] += 1
    for s in range(n):
        if deg[s]:
            m[:, s] /= deg[s]
    restart = np.zeros(n)
    restart[[0, 3]] = 0.5
    r = restart.copy()
    for _ in range(500):
        dangling = r[deg == 0].sum()
        r = (1 - 0.6) * restart + 0.6 * (m @ r + dangling * restart)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-8
    # node 5 has no inbound path from any seed → rank 0
    assert got[5] == pytest.approx(0.0, abs=1e-12)


def test_personalized_pagerank_validation(spark):
    from fenix_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="at least one seed"):
        personalized_pagerank(df, df.select("src").where(F.lit(False)))
    with pytest.raises(ValueError, match="appear in the edge set"):
        personalized_pagerank(
            df, spark.createDataFrame([(99,)], "node bigint")
        )


def test_hits_matches_numpy_power_iteration(spark):
    from fenix_spark.operators.graph import hits

    edges = [(0, 3), (0, 4), (1, 3), (1, 4), (2, 4), (3, 0), (4, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: (r.hub, r.authority) for r in hits(df, tol=1e-12).collect()}

    n = 6  # node 5 absent; nodes 0..4 used
    A = np.zeros((5, 5))
    for s, d in edges:
        A[s, d] = 1.0
    h = np.full(5, 1 / np.sqrt(5))
    a = h.copy()
    for _ in range(2000):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    for i in range(5):
        assert got[i][0] == pytest.approx(h[i], abs=1e-6)
        assert got[i][1] == pytest.approx(a[i], abs=1e-6)
    # structure: 0 and 1 are the strong hubs; 4 the top authority
    assert got[0][0] > got[2][0] and got[4][1] >= got[3][1]


def test_hits_link_farm_signature(spark):
    from fenix_spark.operators.graph import hits

    # a farm: many pages all pointing at each other's ONE target, plus
    # an organic core; farm pages score as hubs, not authorities
    organic = [(0, 1), (1, 2), (2, 0), (0, 2)]
    farm = [(100 + i, 999) for i in range(10)]
    df = spark.createDataFrame(organic + farm, "src bigint, dst bigint")
    got = {r.node: (r.hub, r.authority) for r in hits(df).collect()}
    for i in range(10):
        hub, auth = got[100 + i]
        assert auth == pytest.approx(0.0, abs=1e-9)  # nobody links farms
        assert hub > 0


def test_triangle_counts_duckdb_mirror_staged(spark):
    """Rotation #9 staging bar (mirror-first, the discipline that made
    #7/#8 clean): suite._triangle_counts vs its DuckDB oracle SQL must
    be ROW-IDENTICAL on the driver corpora BEFORE promotion. Run at
    sf0.001 and sf0.01 — the oracle gate's own scale."""
    import duckdb

    from fenix_spark import suite

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = [
            (r["part"], r["triangles"])
            for r in suite._triangle_counts(spark, sf_dir).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{sf_dir}/lineitem.parquet')"
        )
        want = con.execute(suite._TRIANGLE_COUNTS_SQL).fetchall()
        con.close()
        assert len(got) == 30, sf_dir
        assert got == [(p, t) for p, t in want], sf_dir
