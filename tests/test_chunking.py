"""Document chunking (functions/chunking.py)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fenix_spark.functions.chunking import chunk_docs, chunk_spans


def test_exact_cover_no_overlap(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id bigint, text string")
    rows = chunk_docs(df, size=4, overlap=0).orderBy("chunk_no").collect()
    assert [r["chunk"] for r in rows] == ["abcd", "efgh", "ij"]
    assert [r["start"] for r in rows] == [1, 5, 9]
    assert "".join(r["chunk"] for r in rows) == "abcdefghij"


def test_overlap_carries_context(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id bigint, text string")
    rows = chunk_docs(df, size=4, overlap=2).orderBy("chunk_no").collect()
    chunks = [r["chunk"] for r in rows]
    assert chunks[0] == "abcd" and chunks[1] == "cdef"
    for a, b in zip(chunks, chunks[1:]):
        assert a[-2:] == b[:2]  # shared context


def test_short_and_empty_docs_survive(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "")], "doc_id bigint, text string")
    rows = chunk_docs(df, size=10, overlap=3).collect()
    got = {r["doc_id"]: r["chunk"] for r in rows}
    assert got == {1: "ab", 2: ""}


def test_validation(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_spans(F.lit("x"), size=4, overlap=4)
    with pytest.raises(ValueError, match="size"):
        chunk_spans(F.lit("x"), size=0)


def test_plan_is_scan_local(spark, documents):
    out = chunk_docs(documents, size=128, overlap=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


@given(
    text=st.text(alphabet="abc \n", max_size=200),
    size=st.integers(2, 40),
    overlap=st.integers(0, 20),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_chunks_reconstruct_text(spark, text, size, overlap):
    """For any (text, size, overlap<size): dropping each chunk's first
    `overlap` chars (except chunk 0) and concatenating reproduces the
    document exactly — no char lost, none duplicated."""
    overlap = min(overlap, size - 1)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = chunk_docs(df, size=size, overlap=overlap).orderBy("chunk_no").collect()
    rebuilt = "".join(
        r["chunk"] if r["chunk_no"] == 0 else r["chunk"][overlap:] for r in rows
    )
    assert rebuilt == text
