"""Bigram-LM perplexity tests: hand-computed closed form, an
in-process DuckDB mirror of the full train+score pipeline (the same
engine-independence bar as the suite's oracle rows), and edge cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fenix_spark.functions.ngram_lm import (
    doc_token_pairs,
    perplexity,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def tiny(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id bigint, text string"
    )
    return docs, train_bigram_lm(docs, "text", "doc_id", alpha=0.5)


def test_hand_computed_perplexity(spark, tiny):
    docs, lm = tiny
    # pairs: doc0: (a,b),(b,a),(a,b); doc1: (a,b),(b,c)
    # c1: a=3, b=2 ; c12: (a,b)=3, (b,a)=1, (b,c)=1 ; V={a,b,c}=3
    assert lm.vocab_size == 3
    a = 0.5
    p_ab = (3 + a) / (3 + a * 3)
    p_ba = (1 + a) / (2 + a * 3)
    p_bc = (1 + a) / (2 + a * 3)
    h0 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    h1 = -(math.log(p_ab) + math.log(p_bc)) / 2
    got = {r.id: r for r in perplexity(docs, "text", "doc_id", lm).collect()}
    assert got[0].n_bigrams == 3 and got[1].n_bigrams == 2
    assert abs(got[0].cross_entropy - round(h0, 6)) < 1e-9
    assert abs(got[1].cross_entropy - round(h1, 6)) < 1e-9
    assert abs(got[0].ppl - round(math.exp(h0), 6)) < 1e-9
    assert abs(got[1].ppl - round(math.exp(h1), 6)) < 1e-9


def test_unseen_bigrams_get_smoothed_mass(spark, tiny):
    _, lm = tiny
    probe = spark.createDataFrame([(9, "c a")], "doc_id bigint, text string")
    # (c,a) unseen; c never appears as context → c1=0
    want_h = -math.log(0.5 / (0.5 * 3))
    got = perplexity(probe, "text", "doc_id", lm).head()
    assert got.n_bigrams == 1
    assert abs(got.cross_entropy - round(want_h, 6)) < 1e-9


def test_short_docs_are_null_not_scored(spark, tiny):
    _, lm = tiny
    probe = spark.createDataFrame(
        [(1, ""), (2, "hello"), (3, "  !!  ")], "doc_id bigint, text string"
    )
    rows = {r.id: r for r in perplexity(probe, "text", "doc_id", lm).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r.n_bigrams == 0 and r.cross_entropy is None and r.ppl is None


def test_duckdb_mirror_full_pipeline(spark, documents):
    """Train AND score on the same 200 docs in both engines; scores
    must agree to the 6dp output rounding."""
    import duckdb

    docs = documents.limit(200).select("doc_id", "text")
    lm = train_bigram_lm(docs, "text", "doc_id", alpha=0.5)
    got = {
        r.id: (r.n_bigrams, r.cross_entropy, r.ppl)
        for r in perplexity(docs, "text", "doc_id", lm).collect()
    }

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    from fenix_spark.functions.texthash import duck_tokens

    want = con.execute(f"""
        WITH t AS (
            SELECT doc_id, {duck_tokens('text')} AS tk FROM docs
        ),
        pairs AS (
            SELECT doc_id, u.p.w1 AS w1, u.p.w2 AS w2
            FROM t, UNNEST(CASE WHEN len(tk) >= 2 THEN
                list_transform(generate_series(1, len(tk) - 1),
                               i -> {{'w1': tk[i], 'w2': tk[i+1]}})
                ELSE [] END) u(p)
        ),
        uni AS (SELECT w1, count(*)::DOUBLE AS c1 FROM pairs GROUP BY w1),
        bi  AS (SELECT w1, w2, count(*)::DOUBLE AS c12 FROM pairs GROUP BY w1, w2),
        v   AS (SELECT count(DISTINCT w)::DOUBLE AS vs FROM
                  (SELECT w1 AS w FROM pairs UNION SELECT w2 FROM pairs)),
        scored AS (
            SELECT p.doc_id,
                   count(*) AS n_bigrams,
                   -avg(ln((coalesce(b.c12, 0) + 0.5) /
                           (coalesce(u.c1, 0) + 0.5 * (SELECT vs FROM v)))) AS h
            FROM pairs p
            LEFT JOIN bi b USING (w1, w2)
            LEFT JOIN uni u USING (w1)
            GROUP BY p.doc_id
        )
        SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams,
               round(s.h, 6) AS h, round(exp(s.h), 6) AS ppl
        FROM docs d LEFT JOIN scored s USING (doc_id)
    """).fetchall()
    assert len(want) == len(got)
    for doc_id, nb, h, ppl in want:
        g = got[doc_id]
        assert g[0] == nb
        if h is None:
            assert g[1] is None and g[2] is None
        else:
            assert abs(g[1] - h) <= 1e-6 and abs(g[2] - ppl) <= 1e-6


def test_broadcast_and_shuffle_join_agree(spark, tiny):
    docs, lm = tiny
    a = sorted(map(tuple, perplexity(docs, "text", "doc_id", lm, broadcast_model=True).collect()))
    b = sorted(map(tuple, perplexity(docs, "text", "doc_id", lm, broadcast_model=False).collect()))
    assert a == b


def test_in_domain_beats_gibberish(spark, documents):
    docs = documents.limit(300).select("doc_id", "text")
    lm = train_bigram_lm(docs, "text", "doc_id")
    probe = spark.createDataFrame(
        [(1, docs.head().text), (2, "zqx vbn wkj qqq zzz pxv mnb zkq rrw jjx")],
        "doc_id bigint, text string",
    )
    rows = {r.id: r.ppl for r in perplexity(probe, "text", "doc_id", lm).collect()}
    assert rows[1] < rows[2]


def test_pair_stream_matches_tokens(spark, tiny):
    docs, _ = tiny
    rows = doc_token_pairs(docs, "text", "doc_id").collect()
    got = sorted((r.id, r.w1, r.w2) for r in rows)
    assert got == [
        (0, "a", "b"),
        (0, "a", "b"),
        (0, "b", "a"),
        (1, "a", "b"),
        (1, "b", "c"),
    ]
