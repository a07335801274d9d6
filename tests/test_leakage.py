"""Leakage-safe split tests: group cohesion, the audit report's
diagonality, contrast with the naive per-row split, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.leakage import leakage_safe_split, split_leakage_report
from fenix_spark.operators.sampling import hash_split

WEIGHTS = (0.8, 0.1, 0.1)
NAMES = ("train", "val", "test")


@pytest.fixture(scope="module")
def corpus_with_dups(spark, documents):
    """Real docs + synthetic near-dup pairs chaining ids (i, i+1) for
    every i divisible by 7 — includes chains crossing two pairs."""
    docs = documents.limit(400).select("doc_id", "text")
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    pairs = [
        (a, b)
        for a, b in zip(sorted(ids), sorted(ids)[1:])
        if a % 7 == 0 or (a - 1) % 7 == 0  # chains of 3: (7k, 7k+1, 7k+2)
    ]
    pairs_df = spark.createDataFrame(pairs, "id_l bigint, id_r bigint")
    return docs, pairs_df


def test_groups_never_straddle_splits(spark, corpus_with_dups):
    docs, pairs = corpus_with_dups
    out = leakage_safe_split(docs, pairs, "doc_id", WEIGHTS, NAMES)
    rows = out.select("doc_id", "split_key", "split").collect()
    assert len(rows) == docs.count()
    by_key: dict[int, set[str]] = {}
    for r in rows:
        by_key.setdefault(r.split_key, set()).add(r.split)
    assert all(len(s) == 1 for s in by_key.values())
    # every pair shares a split
    split_of = {r.doc_id: r.split for r in rows}
    for p in pairs.collect():
        assert split_of[p.id_l] == split_of[p.id_r]


def test_report_is_diagonal_for_safe_split(spark, corpus_with_dups):
    docs, pairs = corpus_with_dups
    out = leakage_safe_split(docs, pairs, "doc_id", WEIGHTS, NAMES)
    rep = split_leakage_report(out, pairs, "doc_id").collect()
    assert rep and all(r.split_l == r.split_r for r in rep)
    assert sum(r.n_pairs for r in rep) == pairs.count()


def test_naive_split_actually_leaks(spark, corpus_with_dups):
    """The control: per-row hash split must show off-diagonal pairs on
    this corpus (otherwise the safe variant is vacuous here)."""
    docs, pairs = corpus_with_dups
    naive = hash_split(docs, "doc_id", WEIGHTS, NAMES)
    rep = split_leakage_report(naive, pairs, "doc_id").collect()
    assert any(r.split_l != r.split_r for r in rep)


def test_split_proportions_roughly_hold(spark, corpus_with_dups):
    docs, pairs = corpus_with_dups
    out = leakage_safe_split(docs, pairs, "doc_id", WEIGHTS, NAMES)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert counts.get("train", 0) / n > 0.6
    assert 0 < counts.get("val", 0) / n < 0.25
    assert 0 < counts.get("test", 0) / n < 0.25


def test_determinism_and_unpaired_rows_keep_own_id(spark, corpus_with_dups):
    docs, pairs = corpus_with_dups
    a = sorted(
        (r.doc_id, r.split_key, r.split)
        for r in leakage_safe_split(docs.repartition(3), pairs, "doc_id", WEIGHTS, NAMES).collect()
    )
    b = sorted(
        (r.doc_id, r.split_key, r.split)
        for r in leakage_safe_split(docs.repartition(11), pairs, "doc_id", WEIGHTS, NAMES).collect()
    )
    assert a == b
    paired = {p.id_l for p in pairs.collect()} | {p.id_r for p in pairs.collect()}
    for doc_id, key, _ in a:
        if doc_id not in paired:
            assert key == doc_id
