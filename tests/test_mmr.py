"""MMR diversity rerank (operators/hybrid.mmr_rerank)."""

from __future__ import annotations

import numpy as np
import pytest

from fenix_spark.operators.hybrid import mmr_rerank


def _py_mmr(rows, k, lam):
    """Pure-python mirror: rows = (id, vec, score)."""
    rows = sorted(rows, key=lambda r: (-r[2], r[0]))
    V = np.stack([np.asarray(r[1], dtype=float) for r in rows])
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    U = V / norms[:, None]
    rel = np.array([r[2] for r in rows], dtype=float)
    n = len(rows)
    picked, max_sim = [], np.full(n, -np.inf)
    remaining = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        marg = lam * rel - (1 - lam) * max_sim if picked else lam * rel
        marg = np.where(remaining, marg, -np.inf)
        best = int(np.argmax(marg))
        picked.append(rows[best][0])
        remaining[best] = False
        max_sim = np.maximum(max_sim, U @ U[best])
    return picked


def test_hand_computed_case(spark):
    """Three near-identical high scorers + one distinct lower scorer:
    pure top-3 returns the redundant trio; MMR at λ=0.5 slots the
    distinct doc in."""
    e1 = [1.0, 0.0]
    rows = [
        ("q", "a", e1, 1.00),
        ("q", "b", e1, 0.99),  # duplicate direction of a
        ("q", "c", e1, 0.98),  # duplicate direction of a
        ("q", "d", [0.0, 1.0], 0.60),  # orthogonal, lower score
    ]
    df = spark.createDataFrame(
        rows, "grp string, id string, vec array<double>, score double"
    )
    got = [
        r["id"]
        for r in mmr_rerank(df, ["grp"], "id", "vec", "score", k=3, lam=0.5)
        .orderBy("mmr_rank")
        .collect()
    ]
    # pick 1: a (top score). pick 2: d (b/c have sim 1.0 → marginal
    # 0.495-0.5 = -0.005; d has 0.3-0 = 0.3). pick 3: b (next score).
    assert got == ["a", "d", "b"]


def test_lambda_one_is_score_order(spark):
    rng = np.random.default_rng(3)
    rows = [
        ("q", f"d{i}", rng.normal(size=8).tolist(), float(rng.uniform()))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "grp string, id string, vec array<double>, score double"
    )
    got = [
        r["id"]
        for r in mmr_rerank(df, ["grp"], "id", "vec", "score", k=10, lam=1.0)
        .orderBy("mmr_rank")
        .collect()
    ]
    exp = [r[1] for r in sorted(rows, key=lambda r: (-r[3], r[1]))][:10]
    assert got == exp


def test_matches_python_mirror_per_group(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g in range(3):
        for i in range(60):
            rows.append(
                (
                    f"g{g}",
                    f"d{i:02d}",
                    rng.normal(size=16).tolist(),
                    float(rng.uniform()),
                )
            )
    df = spark.createDataFrame(
        rows, "grp string, id string, vec array<double>, score double"
    ).repartition(8)
    got = {}
    for r in (
        mmr_rerank(df, ["grp"], "id", "vec", "score", k=12, lam=0.6)
        .orderBy("grp", "mmr_rank")
        .collect()
    ):
        got.setdefault(r["grp"], []).append(r["id"])
    for g in ("g0", "g1", "g2"):
        sub = [(i, v, s) for gg, i, v, s in rows if gg == g]
        assert got[g] == _py_mmr(sub, 12, 0.6), g


def test_oversize_group_raises_and_bounds_hold(spark):
    rows = [("q", f"d{i}", [1.0, 0.0], 1.0) for i in range(30)]
    df = spark.createDataFrame(
        rows, "grp string, id string, vec array<double>, score double"
    )
    with pytest.raises(Exception, match="max_candidates"):
        mmr_rerank(
            df, ["grp"], "id", "vec", "score", k=5, max_candidates=10
        ).collect()
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, ["grp"], "id", "vec", "score", k=5, lam=1.5)


def test_diversity_improves_cluster_coverage(spark):
    """5 topic clusters in the candidate pool; plain top-10 covers 1
    topic (scores correlate with topic), MMR covers most."""
    rng = np.random.default_rng(11)
    anchors = [np.eye(8)[i] * 5 for i in range(5)]
    rows = []
    for ci, a in enumerate(anchors):
        for j in range(10):
            v = a + rng.normal(scale=0.2, size=8)
            score = 1.0 - 0.1 * ci - 0.001 * j  # topic 0 dominates scores
            rows.append(("q", f"c{ci}d{j}", v.tolist(), score))
    df = spark.createDataFrame(
        rows, "grp string, id string, vec array<double>, score double"
    )
    plain = [r[1] for r in sorted(rows, key=lambda r: -r[3])][:10]
    got = [
        r["id"]
        for r in mmr_rerank(df, ["grp"], "id", "vec", "score", k=10, lam=0.3)
        .orderBy("mmr_rank")
        .collect()
    ]
    plain_topics = {i[1] for i in plain}
    mmr_topics = {i[1] for i in got}
    assert len(plain_topics) == 1
    assert len(mmr_topics) >= 4
