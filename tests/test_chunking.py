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


def test_doc_chunks_duckdb_mirror_staged(spark):
    """Rotation #11 staging bar (mirror-first): suite._doc_chunks vs
    its DuckDB oracle SQL must be ROW-IDENTICAL on the driver corpora
    BEFORE promotion — run at sf0.001 and sf0.01, the oracle gate's
    own scales. The chunking family (RAG fixed-window split with
    overlap) has no oracle row yet; this stages its first. Every
    value — including the full chunk text — is an exact string, so a
    single off-by-one in either engine's window arithmetic or any
    substring-semantics divergence (code points vs bytes) fails the
    comparison outright."""
    import duckdb

    from fenix_spark import suite

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = [
            (r["doc_id"], r["chunk_no"], r["start"], r["chunk"], r["n_chars"])
            for r in suite._doc_chunks(spark, sf_dir).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        want = [tuple(r) for r in con.execute(suite._DOC_CHUNKS_SQL).fetchall()]
        con.close()
        assert len(got) > 0, sf_dir
        assert got == want, sf_dir
