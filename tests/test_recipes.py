"""Recipe-pipeline tests: the standard curation order end-to-end on a
corpus with planted duplicates / near-dups / junk / contamination /
PII, with per-stage audit accounting verified against the planted
ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.recipes import (
    exact_dedup_stage,
    near_dedup_stage,
    run_pipeline,
    sample_stage,
    standard_curation,
)


@pytest.fixture(scope="module")
def planted(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    # 10 clean docs
    for i in range(10):
        rows.append((i, f"{base} variant {i} with unique content token{i}"))
    # exact duplicates of doc 0 (different ids)
    rows += [(100, rows[0][1]), (101, rows[0][1])]
    # near-duplicate of doc 1: same token SET (an existing token is
    # repeated), different text — exact dedup misses it (different
    # hash), minhash catches it deterministically (identical shingle
    # sets group before banding, J=1.0 regardless of band draws)
    rows.append((102, rows[1][1] + " again"))
    # contaminated doc (contains the eval passage verbatim)
    eval_text = "benchmark question about the capital of atlantis answered here"
    rows.append((103, f"prefix text {eval_text} suffix text"))
    # PII doc
    rows.append((104, f"{base} contact me at alice@example.com please token104"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    evals = spark.createDataFrame([(0, eval_text)], "qid bigint, text string")
    return docs, evals


def test_standard_curation_end_to_end(spark, planted):
    docs, evals = planted
    stages = standard_curation(
        "text", "doc_id", neardup_threshold=0.9, eval_df=evals, scrub=True
    )
    out, reports = run_pipeline(docs, stages, audit=True)
    by_name = {r.name: r for r in reports}

    # 15 in → exact dedup removes the 2 exact copies
    assert by_name["exact_dedup"].rows_in == 15
    assert by_name["exact_dedup"].dropped == 2
    # near dedup removes the one near-copy
    assert by_name["near_dedup"].dropped == 1
    # decontamination removes the planted contaminated doc
    assert by_name["decontaminate"].dropped == 1
    # scrub rewrites, never drops
    assert by_name["scrub_pii"].dropped == 0

    final = {r.doc_id: r.text for r in out.collect()}
    assert 100 not in final and 101 not in final  # exact dups gone
    assert 102 not in final  # near dup gone
    assert 103 not in final  # contaminated gone
    assert 104 in final and "alice@example.com" not in final[104]  # scrubbed


def test_unaudited_run_matches_audited(spark, planted):
    docs, evals = planted
    stages = standard_curation("text", "doc_id", neardup_threshold=0.9, eval_df=evals)
    audited, _ = run_pipeline(docs, stages, audit=True)
    lazy, reports = run_pipeline(docs, stages, audit=False)
    assert reports == []
    a = sorted((r.doc_id, r.text) for r in audited.collect())
    b = sorted((r.doc_id, r.text) for r in lazy.collect())
    assert a == b


def test_custom_stage_composition(spark, planted):
    docs, _ = planted
    stages = [
        exact_dedup_stage("text", "doc_id"),
        sample_stage("doc_id", 0.5, salt="s"),
    ]
    out, reports = run_pipeline(docs, stages)
    assert [r.name for r in reports] == ["exact_dedup", "sample"]
    assert reports[1].rows_out <= reports[1].rows_in


def test_extended_stages_compose(spark, planted):
    from fenix_spark.operators.dsir import fit_importance_model
    from fenix_spark.recipes import (
        compression_stage,
        dsir_stage,
        min_length_stage,
        paragraph_dedup_stage,
    )

    docs, _ = planted
    # add a repetitive doc and a shared-paragraph pair
    para = "this exact paragraph repeats across documents in the corpus today"
    extra = spark.createDataFrame(
        [
            (300, "junk " * 200),
            (301, f"unique intro alpha\n\n{para}"),
            (302, f"unique intro beta\n\n{para}"),
        ],
        "doc_id bigint, text string",
    )
    corpus = docs.unionByName(extra)
    model = fit_importance_model(
        docs.limit(5), corpus, "text", "doc_id", buckets=499
    )
    stages = [
        paragraph_dedup_stage("text", "doc_id"),
        compression_stage("text", "doc_id", min_ratio=0.15),
        min_length_stage("text", min_chars=5),
        dsir_stage("text", "doc_id", model, k=8, salt="r"),
    ]
    out, reports = run_pipeline(corpus, stages, audit=True)
    by_name = {r.name: r for r in reports}
    assert by_name["paragraph_dedup"].dropped == 0  # rewrites, not drops
    assert by_name["compression"].dropped >= 1  # the junk doc dies
    assert by_name["dsir_select"].rows_out == 8
    final = {r.doc_id: r.text for r in out.collect()}
    # the shared paragraph survives in at most one of 301/302
    n_para = sum(1 for t in final.values() if para in t)
    assert n_para <= 1


def test_pipeline_drift_watch_and_gate(spark):
    """The audit drift monitor: a row-dropping stage that preserves
    the survivors' distribution scores ~0 PSI; a stage that RESHAPES
    the watched column scores high and the max_psi gate names it."""
    import numpy as np

    from fenix_spark.recipes import run_pipeline

    rng = np.random.default_rng(9)
    rows = [
        (i, float(np.clip(rng.normal(500, 120), 1, 999)))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens double")
    watch = ("n_tokens", 0.0, 1000.0, 64)

    drop_half = ("drop_half", lambda d: d.where("doc_id % 2 = 0"))
    squash = ("squash", lambda d: d.withColumn(
        "n_tokens", F.col("n_tokens") / 4 + 10
    ))

    out, reports = run_pipeline(df, [drop_half], watch=watch)
    assert out.count() == 2000
    r = {x.name: x for x in reports}
    assert r["drop_half"].psi is not None and r["drop_half"].psi < 0.05

    _, reports = run_pipeline(df, [drop_half, squash], watch=watch)
    r = {x.name: x for x in reports}
    assert r["squash"].psi > 0.25 > r["drop_half"].psi

    with pytest.raises(ValueError, match="'squash'.*PSI"):
        run_pipeline(df, [drop_half, squash], watch=watch, max_psi=0.25)

    # no watch → reports carry None psi and nothing extra runs
    _, reports = run_pipeline(df, [drop_half])
    assert all(x.psi is None for x in reports)


def test_unicode_stage_collapses_variants_before_dedup(spark):
    """The ordering argument made executable: mojibake/decomposed/
    zero-width variants of one document survive exact dedup as FOUR
    rows without the unicode stage, and collapse to ONE with it."""
    from fenix_spark.recipes import exact_dedup_stage, run_pipeline, unicode_stage

    base = "café content here"
    variants = [
        (1, base),
        (2, "café content here"),          # decomposed
        (3, "cafÃ© content here"),     # mojibake
        (4, "café con​tent here"),     # zero-width split
    ]
    df = spark.createDataFrame(variants, "doc_id int, text string")
    without, _ = run_pipeline(df, [exact_dedup_stage("text", "doc_id")])
    assert without.count() == 4
    cleaned, reports = run_pipeline(
        df, [unicode_stage("text"), exact_dedup_stage("text", "doc_id")]
    )
    assert cleaned.count() == 1
    assert cleaned.first()["text"] == base
    assert [r.name for r in reports] == ["unicode", "exact_dedup"]


def test_repetition_stage_drops_spam_keeps_prose(spark):
    from fenix_spark.recipes import repetition_stage, run_pipeline

    rows = [
        (1, ("free coins click here " * 50).strip()),
        (2, "A perfectly ordinary paragraph about harbors, nets, and "
            "the slow business of morning markets by the sea."),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out, reports = run_pipeline(df, [repetition_stage("text")])
    assert [r.doc_id for r in out.collect()] == [2]
    [rep] = reports
    assert rep.name == "repetition_filter"
    assert (rep.rows_in, rep.rows_out) == (2, 1)
    # stage is self-cleaning: no signal columns leak downstream
    assert out.columns == ["doc_id", "text"]
