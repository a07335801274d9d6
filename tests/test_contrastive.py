"""Contrastive-mining tests: planted similarity tiers classify into
the right buckets, per-anchor caps, threshold validation, easy
negatives are a derangement, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.contrastive import (
    easy_negative_pairs,
    mine_contrastive_pairs,
)

BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


@pytest.fixture(scope="module")
def tiers(spark):
    rows = [
        (0, BASE),
        # near-dup of 0: 10/11 shared tokens → J = 10/11 ≈ 0.909
        (1, BASE + " kilo"),
        # mid-overlap with 0: 5 shared + 5 new over union 15 → J = 1/3... make it ~0.54:
        # 7 shared + 3 new each side → J = 7/13 ≈ 0.538
        (2, "alpha bravo charlie delta echo foxtrot golf xray yankee zulu"),
        # unrelated
        (3, "one two three four five six seven eight nine ten"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_tiers_classify(spark, tiers):
    pairs = mine_contrastive_pairs(
        tiers, "text", "doc_id", pos_threshold=0.85, neg_low=0.35, neg_high=0.7
    )
    got = {(r.id_a, r.id_b): (r.label, r.jaccard) for r in pairs.collect()}
    assert got[(0, 1)][0] == "positive" and got[(0, 1)][1] == round(10 / 11, 6)
    assert (0, 2) in got and got[(0, 2)][0] == "hard_negative"
    assert abs(got[(0, 2)][1] - round(7 / 13, 6)) < 1e-9
    # unrelated doc appears in no pair
    assert not any(3 in k for k in got)


def test_per_anchor_cap(spark):
    # one anchor with many near-identical partners
    rows = [(0, BASE)] + [(i, BASE + f" extra{i}") for i in range(1, 15)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = mine_contrastive_pairs(
        df, "text", "doc_id", pos_threshold=0.85, max_pairs_per_doc=5
    )
    per_anchor = (
        pairs.groupBy("id_a", "label").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(r.n <= 5 for r in per_anchor)


def test_threshold_validation(spark, tiers):
    with pytest.raises(ValueError, match="thresholds"):
        mine_contrastive_pairs(tiers, "text", "doc_id", neg_low=0.8, neg_high=0.5)


def test_easy_negatives_are_a_derangement(spark):
    # buckets=2 on 50 ids: both buckets hold many members, so every id
    # is in a cycle — per-bucket bijection gives full coverage
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id bigint")
    pairs = easy_negative_pairs(df, "doc_id", salt="s", buckets=2).collect()
    assert len(pairs) == 50
    anchors = [r.id_a for r in pairs]
    partners = [r.id_b for r in pairs]
    assert sorted(anchors) == list(range(50))
    assert sorted(partners) == list(range(50))  # per-bucket cycles: a bijection
    assert all(r.id_a != r.id_b for r in pairs)
    # deterministic
    again = easy_negative_pairs(df.repartition(7), "doc_id", salt="s", buckets=2).collect()
    assert sorted((r.id_a, r.id_b) for r in again) == sorted(
        (r.id_a, r.id_b) for r in pairs
    )
    # the window partitions by the bucket column (parallel, not global)
    plan = easy_negative_pairs(df, "doc_id", buckets=2)._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan
