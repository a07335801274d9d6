"""Hybrid retrieval tests: RRF formula exactness, missing-rank
handling, order independence, and end-to-end BM25+vector fusion where
the hybrid beats each single ranker on a planted query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.hybrid import hybrid_search, rrf_fuse


def test_rrf_formula_exact(spark):
    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id bigint, score double")
    b = spark.createDataFrame([(3, 0.1), (1, 0.5)], "doc_id bigint, distance double")
    got = {r.id: (r.rrf_score, r.n_rankers) for r in rrf_fuse([a, b], k=10).collect()}
    # a ranks: 1→1, 2→2, 3→3 (score desc); b ranks: 3→1, 1→2 (distance asc)
    assert got[1] == (round(1 / 61 + 1 / 62, 6), 2)
    assert got[3] == (round(1 / 63 + 1 / 61, 6), 2)
    assert got[2] == (round(1 / 62, 6), 1)


def test_rrf_consensus_beats_single_top(spark):
    # doc 10 is #1 for ranker a only; doc 7 is #2 for BOTH
    a = spark.createDataFrame([(10, 9.0), (7, 8.0), (1, 7.0)], "doc_id bigint, score double")
    b = spark.createDataFrame([(2, 9.0), (7, 8.0), (3, 7.0)], "doc_id bigint, score double")
    top = rrf_fuse([a, b], k=1).first()
    assert top.id == 7  # 2/(60+2) > 1/(60+1)


def test_rrf_ignores_physical_row_order(spark):
    a = spark.createDataFrame([(1, 9.0), (2, 5.0)], "doc_id bigint, score double")
    shuffled = a.orderBy(F.rand(7))
    x = [(r.id, r.rrf_score) for r in rrf_fuse([a], k=5).collect()]
    y = [(r.id, r.rrf_score) for r in rrf_fuse([shuffled], k=5).collect()]
    assert x == y


def test_hybrid_end_to_end(spark):
    """Planted corpus: doc 0 matches the query lexically AND
    semantically; doc 1 only lexically; doc 2 only semantically.
    Hybrid must rank doc 0 first."""
    from fenix_spark.operators.bm25 import build_bm25_index
    from fenix_spark.operators.embed import hashed_doc_embeddings

    rows = [
        (0, "spark shuffle partition tuning guide"),
        (1, "spark shuffle partition crash report"),
        (2, "tuning guide for distributed engines"),
    ] + [(10 + i, f"unrelated filler document {i} bananas") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    emb = hashed_doc_embeddings(docs, "text", "doc_id").withColumnRenamed("id", "doc_id")
    docs_emb = docs.join(emb, "doc_id").localCheckpoint(eager=False)
    idx = build_bm25_index(docs, "text", "doc_id")

    q_text = "spark shuffle partition tuning guide"
    q_vec = (
        hashed_doc_embeddings(
            spark.createDataFrame([(99, q_text)], "doc_id bigint, text string"),
            "text",
            "doc_id",
        ).first().embedding
    )
    top = hybrid_search(
        spark, docs_emb, idx, q_text, q_vec, k=3, candidates_per_ranker=10
    ).collect()
    assert top[0].id == 0
    assert top[0].n_rankers == 2


def test_rrf_explicit_ascending_overrides_heuristic(spark):
    # a column named "score" that is actually a DISTANCE: the
    # heuristic would rank it descending; explicit ascending fixes it
    a = spark.createDataFrame([(1, 0.1), (2, 9.0)], "doc_id bigint, score double")
    heur = rrf_fuse([a], k=1).first()
    expl = rrf_fuse([a], k=1, ascending=[True]).first()
    assert heur.id == 2 and expl.id == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ascending"):
        rrf_fuse([a, a], ascending=[True])
