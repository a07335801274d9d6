"""Paragraph-dedup tests: planted shared paragraphs, canonical-first
semantics, reconstruction fidelity, boilerplate capping, and a DuckDB
mirror of the hash stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.paragraphs import (
    dedup_paragraphs,
    doc_overlap_pairs,
    paragraph_hashes,
)

P_SHARED = "this shared passage appears in several documents verbatim today"
P_BOILER = "copyright two thousand twenty four all rights reserved worldwide"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, f"unique intro zero\n\n{P_SHARED}\n\nunique outro zero"),
        (1, f"unique intro one\n\n{P_SHARED}\n\nunique outro one"),
        (2, f"{P_SHARED}\n\nunique body two"),
        (3, "totally unrelated document three with its own paragraph text"),
    ]
    # boilerplate paragraph in EVERY doc
    rows = [(i, t + f"\n\n{P_BOILER}") for i, t in rows]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_paragraph_hashes_positions_and_min_chars(spark):
    df = spark.createDataFrame(
        [(7, "first paragraph is long enough\n\nok\n\nthird one also long enough")],
        "doc_id bigint, text string",
    )
    rows = paragraph_hashes(df, "text", "doc_id", min_chars=20).collect()
    assert [r.pos for r in rows] == [0, 2]  # "ok" dropped, positions kept


def test_dedup_paragraphs_keeps_first_occurrence(spark, corpus):
    out = {r.id: r for r in dedup_paragraphs(corpus, "text", "doc_id").collect()}
    # doc 0 owns the shared paragraph and the boilerplate (lowest id)
    assert P_SHARED in out[0].text and P_BOILER in out[0].text
    # docs 1/2 lose the shared paragraph but keep their unique ones
    assert P_SHARED not in out[1].text and "unique outro one" in out[1].text
    assert P_SHARED not in out[2].text and "unique body two" in out[2].text
    # everyone but doc 0 loses the boilerplate
    assert all(P_BOILER not in out[i].text for i in (1, 2, 3))
    assert out[1].dropped_paragraphs == 2  # shared + boilerplate
    assert out[3].dropped_paragraphs == 1  # boilerplate only
    # paragraph order inside a doc is preserved
    assert out[1].text.index("unique intro one") < out[1].text.index("unique outro one")


def test_doc_overlap_pairs_and_boilerplate_cap(spark, corpus):
    # cap at 3: the shared paragraph (3 docs) counts, boilerplate (4) not
    pairs = {
        (r.id_a, r.id_b): r.shared_paragraphs
        for r in doc_overlap_pairs(
            corpus, "text", "doc_id", min_shared=1, max_group=3
        ).collect()
    }
    assert pairs == {(0, 1): 1, (0, 2): 1, (1, 2): 1}
    # without the cap, boilerplate links every pair including doc 3
    loose = {
        (r.id_a, r.id_b)
        for r in doc_overlap_pairs(
            corpus, "text", "doc_id", min_shared=1, max_group=100
        ).collect()
    }
    assert (0, 3) in loose and (2, 3) in loose


def test_total_paragraph_conservation(spark, corpus):
    """Every informative paragraph occurrence is kept exactly once
    across the corpus: Σ kept == distinct hashes."""
    out = dedup_paragraphs(corpus, "text", "doc_id")
    kept = out.agg(F.sum("kept_paragraphs")).first()[0]
    distinct = (
        paragraph_hashes(corpus, "text", "doc_id")
        .select("phash")
        .distinct()
        .count()
    )
    assert kept == distinct


def test_duckdb_mirror_hash_stream(spark, documents):
    import duckdb

    docs = documents.limit(100).select("doc_id", "text")
    got = {
        (r.id, r.pos): r.phash
        for r in paragraph_hashes(docs, "text", "doc_id", min_chars=20).collect()
    }
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    from fenix_spark.functions.texthash import duck_hash60

    norm = "trim(regexp_replace(lower(p.para), '\\s+', ' ', 'g'))"
    want = {
        (i, pos): h
        for i, pos, h in con.execute(f"""
            WITH split AS (
                SELECT doc_id, regexp_split_to_array(text, '\\n{{2,}}') AS arr
                FROM docs
            ),
            p AS (
                SELECT doc_id, u.s.pos AS pos, u.s.para AS para
                FROM split, UNNEST(list_transform(
                    generate_series(1, len(arr)),
                    i -> {{'pos': i - 1, 'para': arr[i]}})) u(s)
            )
            SELECT doc_id, pos, {duck_hash60(norm)} AS phash
            FROM p WHERE length({norm}) >= 20
        """).fetchall()
    }
    assert got == want
