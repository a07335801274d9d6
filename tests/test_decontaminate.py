"""Benchmark decontamination (operators/decontaminate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fenix_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
    doc_gram_hashes,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely unrelated text about spark physical plans here"),
    (3, "quick brown fox jumps over the lazy dog again and again"),
    (4, "short doc"),
]
BENCH = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "benchmark only content that matches nothing else at all"),
]


def _frames(spark):
    c = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    b = spark.createDataFrame(BENCH, "doc_id bigint, text string")
    return c, b


def test_contamination_flags_overlapping_docs(spark):
    c, b = _frames(spark)
    rep = {r["doc_id"]: r for r in contamination_report(c, b, n=5).collect()}
    assert set(rep) == {1, 3}  # doc 2 shares nothing; doc 4 is sub-gram
    # doc 1 contains the full benchmark sentence → many 5-gram hits
    assert rep[1]["n_hits"] >= 5
    assert 0.0 < rep[3]["hit_frac"] <= 1.0
    assert rep[3]["n_hits"] <= rep[3]["n_grams"]


def test_decontaminate_drops_flagged_keeps_rest(spark):
    c, b = _frames(spark)
    kept = sorted(r["doc_id"] for r in decontaminate(c, b, n=5).collect())
    assert kept == [2, 4]
    # fraction threshold: doc 1 contains the benchmark sentence
    # verbatim (5/6 grams hit = 0.833), doc 3 only overlaps its tail
    # (4/7 = 0.571) — a 0.7 cut drops 1 and keeps 3
    kept_frac = sorted(
        r["doc_id"] for r in decontaminate(c, b, n=5, min_hit_frac=0.7).collect()
    )
    assert 3 in kept_frac and 1 not in kept_frac


def test_gram_hashes_match_python_reference(spark):
    """hash values must equal the texthash convention (md5-prefix),
    pinned against a hand-computed gram."""
    import hashlib

    df = spark.createDataFrame([(7, "a b c d e f")], "doc_id bigint, text string")
    got = {r["gram"] for r in doc_gram_hashes(df, n=5).collect()}
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    exp = {h60("a b c d e"), h60("b c d e f")}
    assert got == exp


def test_short_doc_whole_text_gram(spark):
    """Docs shorter than n collapse to one whole-document gram — an
    exact-duplicate of a short benchmark doc is still caught."""
    c = spark.createDataFrame([(1, "tiny secret answer")], "doc_id bigint, text string")
    b = spark.createDataFrame([(9, "tiny secret answer")], "doc_id bigint, text string")
    rep = contamination_report(c, b, n=13).collect()
    assert len(rep) == 1 and rep[0]["n_hits"] == 1


def test_broadcast_plan_no_gram_shuffle(spark):
    """The benchmark side must broadcast: the executed plan contains a
    BroadcastHashJoin on the gram and NO shuffle of corpus gram rows
    (the only exchange is the per-doc hit aggregation)."""
    c, b = _frames(spark)
    plan = (
        contamination_report(c, b, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
