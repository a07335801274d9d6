"""Trigram substring-search tests: exact parity with the brute-force
contains() scan on real docs, gram-extraction units, and contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.trigram import (
    build_trigram_index,
    char_trigrams,
    substring_search,
)


def test_char_trigrams_unit(spark):
    df = spark.createDataFrame([("Hello",), ("ab",), ("",), ("aaaa",)], "s string")
    got = {r.s: sorted(r.g) for r in df.select("s", char_trigrams(F.col("s")).alias("g")).collect()}
    assert got["Hello"] == ["ell", "hel", "llo"]  # lowercased
    assert got["ab"] == [] and got[""] == []
    assert got["aaaa"] == ["aaa"]  # distinct


@pytest.fixture(scope="module")
def corpus(spark, documents):
    docs = documents.limit(400).select("doc_id", "text")
    return docs, build_trigram_index(docs, "text", "doc_id").localCheckpoint(eager=False)


@pytest.mark.parametrize(
    "needle", ["the", "data", "SPARK", "qui ck", "batch str", "zzzqqq"]
)
def test_matches_bruteforce_contains(spark, corpus, needle):
    docs, idx = corpus
    got = {r.doc_id for r in substring_search(docs, idx, needle, "text", "doc_id").collect()}
    want = {
        r.doc_id
        for r in docs.where(
            F.contains(F.lower(F.col("text")), F.lit(needle.lower()))
        ).collect()
    }
    assert got == want


def test_short_needle_is_refused(spark, corpus):
    docs, idx = corpus
    with pytest.raises(ValueError, match="3 characters"):
        substring_search(docs, idx, "ab", "text", "doc_id")


def test_result_carries_full_rows(spark, corpus):
    docs, idx = corpus
    out = substring_search(docs, idx, "the", "text", "doc_id")
    assert out.columns == docs.columns
    assert out.count() > 0


def test_plan_broadcasts_needle_not_corpus(spark, corpus):
    docs, idx = corpus
    plan = (
        substring_search(docs, idx, "data", "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
