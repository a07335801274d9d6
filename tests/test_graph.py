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
