"""SemDeDup tests: the full pipeline (cluster → within-cluster cosine
pairs → components → keep-hard policy) is checked against an
independent numpy reimplementation, plus policy/edge-case invariants.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.coder import CodingConfig, train_coding
from fenix_spark.operators.semdedup import (
    cluster_assignments,
    semantic_dedup,
    semantic_dedup_pairs,
)

DIM = 4
THRESH = 0.95


def _mk_vectors(rng: np.ndarray) -> list[tuple[int, list[float]]]:
    """Two well-separated clusters; inside each, a few near-duplicate
    families (tiny perturbations of a base direction) plus singletons."""
    rows = []
    rid = 0
    for base in (np.array([10.0, 0.0, 0.0, 0.0]), np.array([0.0, 10.0, 5.0, 0.0])):
        for fam in range(3):
            fam_dir = base + rng.normal(0, 0.5, DIM)
            for _ in range(3):  # near-dup family of 3
                v = fam_dir + rng.normal(0, 0.005, DIM)
                rows.append((rid, [float(x) for x in v]))
                rid += 1
        for _ in range(4):  # singletons, well apart
            v = base + rng.normal(0, 2.0, DIM)
            rows.append((rid, [float(x) for x in v]))
            rid += 1
    return rows


@pytest.fixture(scope="module")
def semdata(spark):
    rng = np.random.default_rng(123)
    rows = _mk_vectors(rng)
    df = spark.createDataFrame(rows, "id bigint, vec array<float>").repartition(5)
    coding = train_coding(
        df, "vec", CodingConfig(metric="l2", codebook_size=2, num_codebooks=1), dim=DIM
    )
    return df, coding, rows


def _numpy_model(rows, cents, thresh):
    """Independent reimplementation: assignment, pairs, union-find
    components, keep-hard policy."""
    ids = [i for i, _ in rows]
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    cell = {
        i: int(np.argmin([np.linalg.norm(v - c) for c in cents]))
        for i, v in vecs.items()
    }
    unit = {i: v / np.linalg.norm(v) for i, v in vecs.items() if np.linalg.norm(v) > 0}
    pairs = []
    for a in ids:
        for b in ids:
            if a < b and cell[a] == cell[b] and a in unit and b in unit:
                cs = round(float(unit[a] @ unit[b]), 6)
                if cs >= thresh:
                    pairs.append((a, b, cs))
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, list[int]] = {}
    for i in ids:
        if any(i in (a, b) for a, b, _ in pairs):
            groups.setdefault(find(i), []).append(i)
    cent_sim = {}
    for i in ids:
        c = cents[cell[i]]
        cn = np.linalg.norm(c)
        cent_sim[i] = float(unit[i] @ (c / cn)) if i in unit and cn > 0 else -1.0
    keep = {i: True for i in ids}
    for members in groups.values():
        best = min(members, key=lambda i: (cent_sim[i], i))
        for i in members:
            keep[i] = i == best
    return cell, pairs, keep


def _cents(coding):
    rows = coding.orderBy("cell").collect()
    return [np.asarray(r["centroid"], dtype=np.float64) for r in rows]


def test_pairs_match_numpy(spark, semdata):
    df, coding, rows = semdata
    cents = _cents(coding)
    _, want_pairs, _ = _numpy_model(rows, cents, THRESH)
    got = {
        (r.id_l, r.id_r): r.cos_sim
        for r in semantic_dedup_pairs(df, "vec", "id", coding, THRESH).collect()
    }
    assert got == {(a, b): cs for a, b, cs in want_pairs}


def test_keep_policy_matches_numpy(spark, semdata):
    df, coding, rows = semdata
    cents = _cents(coding)
    cell, _, want_keep = _numpy_model(rows, cents, THRESH)
    out = semantic_dedup(df, "vec", "id", coding, THRESH).collect()
    assert len(out) == len(rows)
    got_keep = {r.id: r.keep for r in out}
    assert got_keep == want_keep
    got_cell = {r.id: r.cell for r in out}
    assert got_cell == cell
    # at least one family must actually have been deduplicated
    assert sum(not k for k in got_keep.values()) >= 4


def test_exactly_one_survivor_per_group(spark, semdata):
    df, coding, _ = semdata
    pairs = semantic_dedup_pairs(df, "vec", "id", coding, THRESH)
    from fenix_spark.operators.components import connected_components

    comp = {r.node: r.component for r in connected_components(pairs, "id_l", "id_r").collect()}
    keep = {r.id: r.keep for r in semantic_dedup(df, "vec", "id", coding, THRESH).collect()}
    by_group: dict[int, list[bool]] = {}
    for node, c in comp.items():
        by_group.setdefault(c, []).append(keep[node])
    assert by_group and all(sum(flags) == 1 for flags in by_group.values())


def test_zero_vector_survives_and_pairs_exclude_it(spark, semdata):
    _, coding, _ = semdata
    df = spark.createDataFrame(
        [(0, [0.0] * DIM), (1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 1e-4, 0.0, 0.0])],
        "id bigint, vec array<float>",
    )
    pairs = semantic_dedup_pairs(df, "vec", "id", coding, THRESH).collect()
    assert all(0 not in (r.id_l, r.id_r) for r in pairs)
    out = {r.id: r for r in semantic_dedup(df, "vec", "id", coding, THRESH).collect()}
    assert out[0].keep is True and out[0].cent_sim == -1.0
    # ids 1 and 2 are near-identical: exactly one survives
    assert {out[1].keep, out[2].keep} == {True, False}


def test_determinism_under_repartition(spark, semdata):
    df, coding, _ = semdata
    a = sorted(
        (r.id, r.keep)
        for r in semantic_dedup(df.repartition(1), "vec", "id", coding, THRESH).collect()
    )
    b = sorted(
        (r.id, r.keep)
        for r in semantic_dedup(df.repartition(7), "vec", "id", coding, THRESH).collect()
    )
    assert a == b


def test_assignments_centroid_sim_range(spark, semdata):
    df, coding, _ = semdata
    rows = cluster_assignments(df, "vec", "id", coding).collect()
    assert all(-1.0 - 1e-9 <= r.cent_sim <= 1.0 + 1e-9 for r in rows)
    assert all(r.unit is not None for r in rows)
    norms = [float(np.linalg.norm(np.asarray(r.unit))) for r in rows]
    assert all(abs(n - 1.0) < 1e-9 for n in norms)


def test_plan_has_no_cartesian_and_single_cluster_join(spark, semdata):
    """The pair join must be an equi-join on cell — never a cartesian
    product (the whole point of cluster-scoping)."""
    df, coding, _ = semdata
    plan = semantic_dedup_pairs(df, "vec", "id", coding, THRESH)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
