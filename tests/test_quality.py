"""Quality-classifier tests: corpus separation, score sanity, Pareto
keep-rule semantics and determinism, end-to-end filter behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.quality import (
    pareto_keep,
    quality_filter,
    quality_scores,
    train_quality_classifier,
)


@pytest.fixture(scope="module")
def qm_and_corpora(spark):
    pos_rows = [
        (i, f"the spark engine optimizes distributed query plans test {i}")
        for i in range(40)
    ]
    neg_rows = [
        (100 + i, f"buy cheap pills now click here winner prize {i}")
        for i in range(40)
    ]
    pos = spark.createDataFrame(pos_rows, "doc_id bigint, text string")
    neg = spark.createDataFrame(neg_rows, "doc_id bigint, text string")
    qm = train_quality_classifier(
        pos, neg, "text", "doc_id", num_features=1 << 12, max_iter=30
    )
    return qm, pos, neg


def test_classifier_separates_corpora(spark, qm_and_corpora):
    qm, pos, neg = qm_and_corpora
    probe = spark.createDataFrame(
        [
            (1, "distributed query plans in the spark engine"),
            (2, "click here cheap prize winner now"),
        ],
        "doc_id bigint, text string",
    )
    s = {r.id: r.quality for r in quality_scores(probe, "text", "doc_id", qm).collect()}
    assert s[1] > 0.8 and s[2] < 0.2


def test_scores_are_probabilities(spark, qm_and_corpora):
    qm, pos, neg = qm_and_corpora
    both = pos.unionByName(neg)
    rows = quality_scores(both, "text", "doc_id", qm).collect()
    assert len(rows) == 80
    assert all(0.0 <= r.quality <= 1.0 for r in rows)


def test_pareto_keep_monotone_and_deterministic(spark):
    # same ids, higher quality → keep set only grows
    df = spark.range(2000).select(F.col("id"))
    lo = df.select(pareto_keep(F.lit(0.05), F.col("id"), salt="s").alias("k"))
    hi = df.select(pareto_keep(F.lit(0.95), F.col("id"), salt="s").alias("k"))
    n_lo = lo.where("k").count()
    n_hi = hi.where("k").count()
    assert n_hi > n_lo
    # keep iff pareto > 1−q: P = (2−q)^-α. q=0.95 → 1.05^-9 ≈ 0.645;
    # q=0.05 → 1.95^-9 ≈ 0.0025
    assert abs(n_hi / 2000 - 0.645) < 0.05
    assert n_lo / 2000 < 0.02
    # determinism: exact same keep decisions under repartition
    a = sorted(r.id for r in df.where(pareto_keep(F.lit(0.5), F.col("id"), salt="s")).collect())
    b = sorted(
        r.id
        for r in df.repartition(13)
        .where(pareto_keep(F.lit(0.5), F.col("id"), salt="s"))
        .collect()
    )
    assert a == b


def test_quality_filter_keeps_mostly_positive(spark, qm_and_corpora):
    qm, pos, neg = qm_and_corpora
    both = pos.unionByName(neg)
    kept = quality_filter(both, "text", "doc_id", qm, salt="t")
    ids = [r.doc_id for r in kept.collect()]
    n_pos = sum(1 for i in ids if i < 100)
    n_neg = len(ids) - n_pos
    # score≈1 → keep prob ≈ (1+ε)^-9 (near 1); score≈0 → ≈ 2^-9
    assert n_pos >= 25
    assert n_neg <= 10
    assert "quality" in kept.columns
