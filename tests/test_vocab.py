"""Vocabulary coverage: hand-computed rates, DataFrame-vocab parity,
empty-doc semantics, the top-missing ordering contract, a DuckDB
mirror on real documents, and the fix-the-vocab closure property."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.vocab import oov_report, oov_top_missing

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "quantum flux capacitor"),
    (3, ""),
    (4, "the the the zzz"),
]
VOCAB = ["the", "cat", "sat", "on", "mat", "zzz"]


def test_oov_report_hand_computed(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {r.doc_id: r for r in oov_report(df, "text", "doc_id", VOCAB).collect()}
    assert (got[1].n_tokens, got[1].n_oov) == (6, 0) and got[1].oov_rate == 0.0
    assert (got[2].n_tokens, got[2].n_oov) == (3, 3) and got[2].oov_rate == 1.0
    assert (got[3].n_tokens, got[3].n_oov, got[3].oov_rate) == (0, 0, 0.0)
    assert (got[4].n_tokens, got[4].n_oov) == (4, 0)


def test_vocab_as_dataframe_matches_list(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    vdf = spark.createDataFrame([(v,) for v in VOCAB], "term string")
    a = sorted(map(tuple, oov_report(df, "text", "doc_id", VOCAB).collect()))
    b = sorted(map(tuple, oov_report(df, "text", "doc_id", vdf).collect()))
    assert a == b


def test_top_missing_ordering_and_closure(spark):
    rows = [(i, "alpha beta beta gamma") for i in range(10)] + [
        (100, "delta " * 30)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    vocab = ["alpha"]
    top = oov_top_missing(df, "text", vocab, k=3).collect()
    assert [(r.term, r.n, r.n_docs) for r in top] == [
        ("delta", 30, 1),
        ("beta", 20, 10),
        ("gamma", 10, 10),
    ]
    # closure: adding the top term back removes exactly its mass
    before = oov_report(df, "text", "doc_id", vocab)
    after = oov_report(df, "text", "doc_id", vocab + ["delta"])
    d = (
        before.agg(F.sum("n_oov")).head()[0]
        - after.agg(F.sum("n_oov")).head()[0]
    )
    assert d == 30


def test_oov_duckdb_mirror_on_documents(spark, sf_dir):
    from fenix_spark.functions.texthash import duck_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # vocab = the corpus's own 200 most frequent tokens
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    vocab = [
        r[0]
        for r in con.execute(
            f"""
            SELECT t FROM (
              SELECT unnest({duck_tokens('text')}) AS t FROM documents
            ) GROUP BY t ORDER BY count(*) DESC, t LIMIT 200
            """
        ).fetchall()
    ]
    got = sorted(
        (r.doc_id, r.n_tokens, r.n_oov, round(r.oov_rate, 9))
        for r in oov_report(docs, "text", "doc_id", vocab).collect()
    )
    placeholders = ",".join("?" * len(vocab))
    want = sorted(
        (r[0], r[1], r[2], round(r[3], 9))
        for r in con.execute(
            f"""
            WITH toks AS (
              SELECT doc_id, unnest({duck_tokens('text')}) AS t FROM documents
            ),
            per AS (
              SELECT doc_id, count(*) AS n_tokens,
                     sum(CASE WHEN t IN ({placeholders}) THEN 0 ELSE 1 END) AS n_oov
              FROM toks GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(p.n_tokens, 0)::BIGINT,
                   coalesce(p.n_oov, 0)::BIGINT,
                   CASE WHEN coalesce(p.n_tokens, 0) > 0
                        THEN p.n_oov / p.n_tokens ELSE 0.0 END
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN per p USING (doc_id)
            """,
            vocab,
        ).fetchall()
    )
    assert got == want
    # the corpus's own top-200 words must cover most of it
    rates = [r[3] for r in got if r[1] > 0]
    assert sum(rates) / len(rates) < 0.6


def test_vocab_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    with pytest.raises(ValueError):
        oov_report(df, "text", "doc_id", [])
    with pytest.raises(ValueError):
        oov_top_missing(df, "text", VOCAB, k=0)


def test_oov_coverage_duckdb_mirror_staged(spark):
    """Rotation #12 staging bar (mirror-first): suite._oov_coverage vs
    its DuckDB oracle SQL must be ROW-IDENTICAL on the driver corpora
    BEFORE promotion — run at sf0.001 and sf0.01, the oracle gate's
    own scales. The vocab family (per-document OOV coverage against a
    deterministically self-derived top-1000 vocab) has no oracle row
    yet; this stages its first. A tie-break divergence in either
    engine's top-1000 vocab selection changes n_oov corpus-wide, so
    the row gates both the tokenizer mirror and the vocab-derivation
    determinism."""
    from fenix_spark import suite

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = [
            (r["doc_id"], r["n_tokens"], r["n_oov"], r["oov_rate"])
            for r in suite._oov_coverage(spark, sf_dir).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        want = [tuple(r) for r in con.execute(suite._oov_coverage_sql()).fetchall()]
        con.close()
        assert len(got) > 0, sf_dir
        assert got == want, sf_dir
