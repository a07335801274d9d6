"""BM25 tests: exact scores vs a pure-Python reference implementation
and a DuckDB mirror of the full build+score pipeline, plus ranking and
plan-shape invariants."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.bm25 import bm25_search, build_bm25_index

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat sleeps all day"),
    (2, "a lazy dog and a lazy cat share a home"),
    (3, "quantum computing exploits superposition and entanglement"),
    (4, "the dog chased the fox across the quick river"),
    (5, ""),
]


def _tokenize(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_bm25(corpus, query, k1=1.2, b=0.75):
    docs = {i: _tokenize(t) for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(d) for d in docs.values()) / n
    df: dict[str, int] = {}
    for d in docs.values():
        for t in set(d):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for i, d in docs.items():
        s = 0.0
        for t in set(_tokenize(query)):
            tf = d.count(t)
            if tf == 0 or t not in df:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
        if s > 0:
            scores[i] = round(s, 6)
    return scores


@pytest.fixture(scope="module")
def bm25(spark):
    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string").repartition(3)
    return df, build_bm25_index(df, "text", "doc_id")


def test_scores_match_python_reference(spark, bm25):
    df, idx = bm25
    for query in ("quick fox", "lazy dog", "quantum dog", "the"):
        want = _py_bm25(CORPUS, query)
        got = {
            r.doc_id: r.score
            for r in bm25_search(spark, idx, query, k=10).collect()
        }
        assert set(got) == set(want), query
        for i in want:
            assert abs(got[i] - want[i]) < 1e-9, (query, i)


def test_index_statistics(spark, bm25):
    _, idx = bm25
    assert idx.n_docs == len(CORPUS)  # empty doc counted (Lucene maxDoc)
    want_avgdl = sum(len(_tokenize(t)) for _, t in CORPUS) / len(CORPUS)
    assert abs(idx.avgdl - want_avgdl) < 1e-12
    dfreq = {r.term: r.df for r in idx.doc_freq.collect()}
    assert dfreq["dog"] == 3 and dfreq["quantum"] == 1


def test_unseen_query_returns_empty(spark, bm25):
    _, idx = bm25
    assert bm25_search(spark, idx, "xylophone zeppelin").count() == 0


def test_top_k_and_tiebreak(spark, bm25):
    _, idx = bm25
    rows = bm25_search(spark, idx, "lazy dog quick", k=2).collect()
    assert len(rows) == 2
    all_rows = bm25_search(spark, idx, "lazy dog quick", k=10).collect()
    ordered = [(r.score, r.doc_id) for r in all_rows]
    assert ordered == sorted(ordered, key=lambda p: (-p[0], p[1]))
    assert rows == all_rows[:2]


def test_duckdb_mirror(spark, documents):
    """Build + score over 300 real docs in both engines."""
    import duckdb

    docs = documents.limit(300).select("doc_id", "text")
    idx = build_bm25_index(docs, "text", "doc_id")
    query = "the data model with one two three"
    got = {
        r.doc_id: r.score for r in bm25_search(spark, idx, query, k=1000).collect()
    }

    from fenix_spark.functions.texthash import duck_tokens

    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    qterms = sorted({t for t in re.split(r"[^a-z0-9]+", query.lower()) if t})
    qlist = ", ".join(f"'{t}'" for t in qterms)
    want = dict(
        con.execute(f"""
        WITH t AS (SELECT doc_id, {duck_tokens('text')} AS tk FROM docs),
        p AS (
            SELECT doc_id, u.term, count(*)::DOUBLE AS tf
            FROM t, unnest(tk) u(term) GROUP BY doc_id, u.term
        ),
        dl AS (SELECT doc_id, sum(tf) AS dl FROM p GROUP BY doc_id),
        dfq AS (SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY term),
        consts AS (SELECT (SELECT count(*) FROM docs)::DOUBLE AS n,
                          (SELECT coalesce(sum(dl), 0) FROM dl) /
                          (SELECT count(*) FROM docs)::DOUBLE AS avgdl)
        SELECT p.doc_id,
               round(sum(ln((c.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                         * p.tf * 2.2 /
                         (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl))), 6)
                   AS score
        FROM p
        JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN consts c
        WHERE p.term IN ({qlist})
        GROUP BY p.doc_id
        """).fetchall()
    )
    assert got.keys() == want.keys()
    for i in want:
        assert abs(got[i] - want[i]) <= 1e-6


def test_query_plan_prunes_before_broadcast(spark, bm25):
    """The scoring plan must not broadcast or shuffle the full postings
    — query terms are broadcast and postings stream past them."""
    _, idx = bm25
    plan = (
        bm25_search(spark, idx, "quick fox")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
