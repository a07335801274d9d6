"""Connected components / keep-list (operators/components.py) vs a
plain union-find model, plus the dedup-pipeline integration."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fenix_spark.operators.components import connected_components, dedup_keep_list


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per node
    roots = {}
    for x in list(parent):
        roots[x] = find(x)
    # path-compress fully: min id in each set
    comp_min = {}
    for x, r in roots.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[r] for x, r in roots.items()}


def test_chain_and_clique(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21), (21, 22), (20, 22)],
        "id_a bigint, id_b bigint",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=1, max_size=60
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_components_match_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == _union_find(edges)


def test_nonconvergence_raises(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)], "id_a bigint, id_b bigint")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=1)


def test_dedup_keep_list_end_to_end(spark, documents):
    """Integration: minhash near-dup pairs → one survivor (min doc_id)
    per duplicate cluster, all unpaired docs untouched."""
    from fenix_spark.operators.dedup import minhash_neardup_pairs

    pairs = minhash_neardup_pairs(documents, "text", "doc_id", threshold=0.7)
    kept = dedup_keep_list(documents, pairs, "doc_id", left="id_l", right="id_r")
    comp = {
        r["node"]: r["component"]
        for r in connected_components(pairs, left="id_l", right="id_r").collect()
    }
    paired = set(comp)
    survivors = {min(n for n, c2 in comp.items() if c2 == c) for c in set(comp.values())}
    all_ids = {r["doc_id"] for r in documents.select("doc_id").collect()}
    want = (all_ids - paired) | survivors
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == want


def test_keep_list_prefer_col_keeps_best_copy(spark):
    rows = [
        (1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5),   # component {1,2,3}: 2 wins (max q, min id on tie)
        (10, None), (11, 0.1),                    # {10,11}: null loses → 11
        (20, 0.7),                                # unpaired: survives
        (30, None), (31, None),                   # all-null component → min id 30
    ]
    df = spark.createDataFrame(rows, "id bigint, q double")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (30, 31)], "id_a bigint, id_b bigint"
    )
    kept = sorted(
        r.id for r in dedup_keep_list(df, pairs, "id", prefer_col="q").collect()
    )
    assert kept == [2, 4, 11, 20, 30]
    # default policy unchanged: min id per component
    kept_min = sorted(r.id for r in dedup_keep_list(df, pairs, "id").collect())
    assert kept_min == [1, 4, 10, 20, 30]
