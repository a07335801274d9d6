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


# ----------------------------------------------------------- BM25F


def test_bm25f_single_field_reduces_to_bm25(spark, documents):
    from fenix_spark.operators.bm25 import (
        bm25_search,
        bm25f_search,
        build_bm25_index,
        build_bm25f_index,
    )

    docs = documents.limit(300)
    q = "model data training"
    k1, b = 1.2, 0.75
    idx1 = build_bm25_index(docs, "text", "doc_id")
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_search(spark, idx1, q, k=15, k1=k1, b=b).collect()
    }
    fields = {"text": (1.0, b)}
    idxf = build_bm25f_index(docs, fields, "doc_id")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25f_search(spark, idxf, fields, q, k=15, k1=k1).collect()
    }
    assert set(got) == set(base)
    for d in base:
        assert got[d] == pytest.approx(base[d], abs=2e-6), d


def test_bm25f_title_weight_changes_ranking(spark):
    from fenix_spark.operators.bm25 import bm25f_search, build_bm25f_index

    rows = [
        # d1: query term in TITLE only; d2: in body only (longer field)
        ("d1", "quantum computing", "an unrelated essay about farming " * 3),
        ("d2", "farm report", "quantum " + "filler words here " * 5),
        ("d3", "cooking pasta", "boil water add salt " * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id string, title string, body string")
    fields_flat = {"title": (1.0, 0.75), "body": (1.0, 0.75)}
    fields_title = {"title": (5.0, 0.75), "body": (1.0, 0.75)}
    idx = build_bm25f_index(df, fields_flat, "doc_id")
    boosted = [
        r["doc_id"]
        for r in bm25f_search(
            spark, idx, fields_title, "quantum", k=3
        ).collect()
    ]
    assert boosted[0] == "d1"  # title hit dominates under the boost
    assert set(boosted) == {"d1", "d2"}  # d3 never matches


def test_bm25f_python_mirror(spark):
    """Full pipeline parity with a pure-Python BM25F over a small
    two-field corpus (document-level df, per-field length norms)."""
    import math
    import re

    from fenix_spark.operators.bm25 import bm25f_search, build_bm25f_index

    rows = [
        ("a", "alpha beta", "gamma delta alpha"),
        ("b", "beta beta gamma", "alpha epsilon"),
        ("c", "zeta eta", "theta iota kappa alpha alpha"),
        ("d", "alpha", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, t string, bdy string")
    fields = {"t": (2.0, 0.4), "bdy": (1.0, 0.8)}
    k1 = 1.2
    query = "alpha gamma"

    def toks(s):
        return [x for x in re.split("[^a-z0-9]+", s.lower()) if x]

    n = len(rows)
    field_tf = {}
    dl = {}
    for did, t, bdy in rows:
        for fname, text in (("t", t), ("bdy", bdy)):
            ts = toks(text)
            dl[(did, fname)] = len(ts)
            for tok in ts:
                field_tf[(did, fname, tok)] = (
                    field_tf.get((did, fname, tok), 0) + 1
                )
    avg = {
        f: sum(dl[(d, f)] for d, *_ in rows) / n for f in ("t", "bdy")
    }
    df_count = {}
    for did, t, bdy in rows:
        for tok in set(toks(t)) | set(toks(bdy)):
            df_count[tok] = df_count.get(tok, 0) + 1
    exp = {}
    for did, *_ in rows:
        s = 0.0
        for tok in set(query.split()):
            tfw = 0.0
            for fname, (w, b) in fields.items():
                tf = field_tf.get((did, fname, tok), 0)
                if tf:
                    tfw += w * tf / (1 - b + b * dl[(did, fname)] / avg[fname])
            if tfw > 0:
                dfc = df_count.get(tok, 0)
                idf = math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
                s += idf * tfw * (k1 + 1) / (tfw + k1)
        if s > 0:
            exp[did] = round(s, 6)
    idx = build_bm25f_index(df, fields, "doc_id")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25f_search(spark, idx, fields, query, k=10, k1=k1).collect()
    }
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], abs=2e-6), d


# ---------------------------------------------------------------------------
# tfidf_top_terms / group_distinctive_terms


import math

import duckdb
import pytest

from fenix_spark.operators.bm25 import group_distinctive_terms, tfidf_top_terms


def test_tfidf_hand_computed(spark):
    docs = [
        (1, "cat cat dog"),
        (2, "dog fish"),
        (3, "cat fish fish fish"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.term): (r.tf, r.tfidf, r.rank)
        for r in tfidf_top_terms(df, "text", "doc_id", k=2).collect()
    }
    # N=3; df: cat 2, dog 2, fish 2 → idf = ln(4/3)+1 for all
    idf = math.log(4 / 3) + 1
    assert got[(1, "cat")] == (2, pytest.approx(2 * idf), 1)
    assert got[(1, "dog")] == (1, pytest.approx(idf), 2)
    assert got[(3, "fish")][2] == 1
    assert (2, "dog") in got and (2, "fish") in got
    # doc 2's tie (both tf=1, same idf) breaks by term asc: dog first
    assert got[(2, "dog")][2] == 1 and got[(2, "fish")][2] == 2


def test_tfidf_duckdb_mirror_on_documents(spark, sf_dir):
    from fenix_spark.functions.texthash import duck_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r.doc_id, r.rank, r.term, round(r.tfidf, 9))
        for r in tfidf_top_terms(docs, "text", "doc_id", k=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2], round(r[3], 9))
        for r in con.execute(
            f"""
            WITH toks AS (
              SELECT doc_id, unnest({duck_tokens('text')}) AS term FROM documents
            ),
            postings AS (
              SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
            ),
            dfreq AS (
              SELECT term, count(*) AS df FROM postings GROUP BY 1
            ),
            n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM postings),
            scored AS (
              SELECT p.doc_id, p.term, p.tf,
                     p.tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0) AS tfidf
              FROM postings p, dfreq d, n
              WHERE p.term = d.term
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
              FROM scored
            )
            SELECT doc_id, rank, term, tfidf FROM ranked WHERE rank <= 3
            """
        ).fetchall()
    )
    assert got == want


def _py_log_odds(group_counts, alpha):
    """Monroe et al. 2008 mirror over {group: {term: count}}."""
    corpus = {}
    for terms in group_counts.values():
        for t, c in terms.items():
            corpus[t] = corpus.get(t, 0) + c
    n_all = sum(corpus.values())
    out = {}
    for g, terms in group_counts.items():
        n_g = sum(terms.values())
        n_r = n_all - n_g
        for t, y_g in terms.items():
            a_t = alpha * corpus[t]
            a_tot = alpha * n_all
            y_r = corpus[t] - y_g
            delta = math.log((y_g + a_t) / (n_g + a_tot - y_g - a_t)) - math.log(
                (y_r + a_t) / (n_r + a_tot - y_r - a_t)
            )
            var = 1.0 / (y_g + a_t) + 1.0 / (y_r + a_t)
            out[(g, t)] = delta / math.sqrt(var)
    return out


def test_group_distinctive_terms_matches_python_mirror(spark):
    docs = [
        ("physics", "quantum field quantum energy the the"),
        ("physics", "energy quantum the particle"),
        ("cooking", "salt pepper the energy the salt"),
        ("cooking", "salt butter the pan"),
    ]
    df = spark.createDataFrame(docs, "src string, text string")
    got = group_distinctive_terms(df, "text", "src", k=100, alpha=0.05)
    counts = {}
    for g, text in docs:
        for t in text.split():
            counts.setdefault(g, {}).setdefault(t, 0)
            counts[g][t] += 1
    want = _py_log_odds(counts, 0.05)
    rows = got.collect()
    assert {(r.group, r.term) for r in rows} == set(want)
    for r in rows:
        assert abs(r.zscore - want[(r.group, r.term)]) < 1e-9


def test_group_distinctive_surfaces_planted_vocabulary(spark):
    rows = []
    for i in range(30):
        rows.append(("a", f"common filler words quantum flux number{i}"))
        rows.append(("b", f"common filler words recipe sauce number{i}"))
    df = spark.createDataFrame(rows, "src string, text string")
    got = group_distinctive_terms(df, "text", "src", k=2).collect()
    top = {r.group: [] for r in got}
    for r in sorted(got, key=lambda r: (r.group, r.rank)):
        top[r.group].append(r.term)
    assert set(top["a"]) == {"quantum", "flux"}
    assert set(top["b"]) == {"recipe", "sauce"}
    # shared vocabulary must not outrank the planted terms
    assert "common" not in top["a"] + top["b"]
