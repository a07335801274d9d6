"""ANN probe auto-tuning (operators/autotune.py). Proof bar: the
measured curve is weakly monotone in probes (more cells scanned can
only help each query), probing all cells is exact by construction,
and the returned point is the schedule's minimal target-meeting one —
cross-checked against an independently computed full curve."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.autotune import recall_at_k, tune_probes
from fenix_spark.operators.coder import CodingConfig, train_coding
from fenix_spark.operators.index import batch_probe_search


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coding = train_coding(
        emb,
        "embedding",
        CodingConfig(metric="l2", codebook_size=8, num_codebooks=2, seed=3),
    )
    from fenix_spark.operators.index import build_index

    path = str(tmp_path_factory.mktemp("at") / "idx")
    build_index(emb, "embedding", coding, path)
    return coding, spark.read.parquet(path)


def test_curve_monotone_and_exact_at_all_cells(spark, setup):
    coding, indexed = setup
    out = tune_probes(
        indexed, coding, "embedding", target_recall=1.0, k=5, n_queries=24
    )
    probes = [p for p, _ in out["curve"]]
    recalls = [r for _, r in out["curve"]]
    assert probes == sorted(probes)
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:])), out
    assert out["n_cells"] == 64
    assert out["curve"][-1] == (64, 1.0)  # full probe = exact
    assert out["probes"] == 64 and out["recall"] == 1.0


def test_returns_minimal_schedule_point_meeting_target(spark, setup):
    coding, indexed = setup
    target = 0.8
    out = tune_probes(
        indexed, coding, "embedding", target_recall=target, k=5, n_queries=24
    )
    # the returned point meets the target...
    assert out["recall"] >= target
    # ...and every earlier schedule point measured below it
    for p, r in out["curve"][:-1]:
        assert r < target, out
        assert p < out["probes"]
    # sanity: a low target needs far fewer than all cells on this data
    assert out["probes"] < out["n_cells"]


def test_recall_at_k_agrees_with_manual_intersection(spark, setup):
    coding, indexed = setup
    queries = indexed.where(F.col("vec_id") < 8)
    exact = batch_probe_search(
        queries, indexed, coding, "embedding", k=5, probes=64
    ).select("query_id", F.col("right_id").alias("vec_id"))
    approx = batch_probe_search(
        queries, indexed, coding, "embedding", k=5, probes=2
    ).select("query_id", F.col("right_id").alias("vec_id"))
    got = recall_at_k(approx, exact)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    found = {}
    for r in approx.collect():
        found.setdefault(r["query_id"], set()).add(r["vec_id"])
    manual = sum(
        len(truth[q] & found.get(q, set())) / len(truth[q]) for q in truth
    ) / len(truth)
    assert got == pytest.approx(manual, rel=1e-12)


def test_bad_target_raises(spark, setup):
    coding, indexed = setup
    with pytest.raises(ValueError, match="target_recall"):
        tune_probes(indexed, coding, "embedding", target_recall=0.0)


@pytest.fixture(scope="module")
def pq_setup(spark, tmp_path_factory):
    from fenix_spark.operators.index import build_ivfpq_index

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coarse = train_coding(
        emb,
        "embedding",
        CodingConfig(metric="l2", codebook_size=8, num_codebooks=1, seed=3),
    )
    fine = train_coding(
        emb,
        "embedding",
        CodingConfig(metric="l2", codebook_size=16, num_codebooks=2, seed=5),
    )
    path = str(tmp_path_factory.mktemp("atpq") / "idx")
    build_ivfpq_index(emb, "embedding", coarse, fine, path)
    n = emb.count()
    return coarse, fine, spark.read.parquet(path), n


def test_ivfpq_frontier_monotone_in_rerank(spark, pq_setup):
    """At fixed probes, recall is non-decreasing across the rerank grid
    (None = ADC top-k first): a true-top-k member can only be displaced
    from the exact-top-k of a larger shortlist by another true-top-k
    member. The provable invariant, measured."""
    from fenix_spark.operators.autotune import tune_ivfpq

    coarse, fine, indexed, _n = pq_setup
    out = tune_ivfpq(
        indexed, coarse, fine, "embedding",
        # 1.0 is unreachable at rerank 40 on this deliberately-coarse
        # 16^2 coding (measured ceiling 0.48) → the full frontier runs
        target_recall=1.0,
        k=5, n_queries=10, max_rerank=40,
    )
    by_probes: dict = {}
    for probes, rer, rec in out["frontier"]:
        by_probes.setdefault(probes, []).append(rec)
    for probes, recs in by_probes.items():
        assert all(
            b >= a - 1e-9 for a, b in zip(recs, recs[1:])
        ), (probes, recs)
    assert out["met"] is False  # honest flag for the unreachable ask


def test_ivfpq_full_probes_full_rerank_is_exact(spark, pq_setup):
    """probes = all cells and rerank = corpus size reduce to the exact
    search: recall must be exactly 1.0 — and tune_ivfpq must therefore
    always meet any target when allowed that deep."""
    from fenix_spark.operators.autotune import tune_ivfpq

    coarse, fine, indexed, n = pq_setup
    out = tune_ivfpq(
        indexed, coarse, fine, "embedding",
        target_recall=1.0, k=5, n_queries=8, max_rerank=n,
    )
    assert out["met"] is True
    assert out["recall"] == 1.0
    # the frontier's deepest point is exact by construction
    deepest = [r for p, d, r in out["frontier"] if p == out["n_cells"] and d == n]
    assert deepest == [1.0] if deepest else out["recall"] == 1.0


def test_ivfpq_rerank_at_k_equals_adc_set(spark, pq_setup):
    """rerank=k re-scores the SAME id set ADC picked — the result set
    is identical, only internal order differs (both outputs are then
    presented distance-sorted)."""
    from fenix_spark.operators.index import ivfpq_search

    coarse, fine, indexed, _n = pq_setup
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.orderBy("vec_id").first()
    adc = {
        r["vec_id"]
        for r in ivfpq_search(
            indexed, coarse, fine, "embedding", list(q["embedding"]),
            k=7, probes=4, rerank=None,
        ).collect()
    }
    rr = {
        r["vec_id"]
        for r in ivfpq_search(
            indexed, coarse, fine, "embedding", list(q["embedding"]),
            k=7, probes=4, rerank=7,
        ).collect()
    }
    assert adc == rr


def test_ivfpq_chosen_config_is_cheapest_on_frontier(spark, pq_setup):
    """The returned (probes, rerank) is the first frontier point (probes
    ascending, then rerank grid order) meeting the target."""
    from fenix_spark.operators.autotune import tune_ivfpq

    coarse, fine, indexed, _n = pq_setup
    # calibrated to the measured frontier of this seeded setup: the
    # (1, 40) point reaches 0.48, everything cheaper stays below 0.45
    target = 0.45
    out = tune_ivfpq(
        indexed, coarse, fine, "embedding",
        target_recall=target, k=5, n_queries=10, max_rerank=40,
    )
    assert out["met"] and out["recall"] >= target
    for probes, rer, rec in out["frontier"]:
        if (probes, rer) == (out["probes"], out["rerank"]):
            break
        assert rec < target, (probes, rer, rec)


def test_tune_ivfpq_residual_search_hook(spark, tmp_path_factory):
    """The search= hook tunes the RESIDUAL IVF-PQ variant with the
    same frontier machinery: monotone in rerank, exact at full
    probes + corpus-deep rerank."""
    from fenix_spark.operators.autotune import tune_ivfpq
    from fenix_spark.operators.index import (
        build_ivfpq_residual_index,
        ivfpq_residual_search,
        train_residual_coding,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coarse = train_coding(
        emb, "embedding",
        CodingConfig(metric="l2", codebook_size=4, num_codebooks=1, seed=3),
    )
    fine = train_residual_coding(
        emb, "embedding", coarse,
        CodingConfig(metric="l2", codebook_size=16, num_codebooks=2, seed=5),
    )
    path = str(tmp_path_factory.mktemp("atres") / "idx")
    build_ivfpq_residual_index(emb, "embedding", coarse, fine, path)
    indexed = spark.read.parquet(path)
    n = emb.count()
    out = tune_ivfpq(
        indexed, coarse, fine, "embedding",
        target_recall=1.0, k=5, n_queries=6, max_rerank=n,
        search=ivfpq_residual_search,
    )
    assert out["met"] is True and out["recall"] == 1.0
    by_probes = {}
    for probes, _rer, rec in out["frontier"]:
        by_probes.setdefault(probes, []).append(rec)
    for recs in by_probes.values():
        assert all(b >= a - 1e-9 for a, b in zip(recs, recs[1:]))
