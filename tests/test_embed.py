"""Hashed-embedding tests: construction semantics, similarity signal
(near-dups close, unrelated docs far), DuckDB mirror, determinism,
and integration with the existing vector surface."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.embed import hashed_doc_embeddings, hashed_embedding


def test_unit_norm_and_zero_doc(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, ""), (2, "  !! ")],
        "doc_id bigint, text string",
    )
    rows = {r.id: r.embedding for r in hashed_doc_embeddings(df, "text", "doc_id", 32).collect()}
    assert abs(math.sqrt(sum(x * x for x in rows[0])) - 1.0) < 1e-9
    assert rows[1] == [0.0] * 32 and rows[2] == [0.0] * 32


def test_similarity_signal(spark):
    base = "spark catalyst optimizer rewrites logical plans into physical plans"
    df = spark.createDataFrame(
        [
            (0, base),
            (1, base + " quickly"),  # near-dup
            (2, "bananas chocolate recipe sugar flour butter oven baking tray"),
        ],
        "doc_id bigint, text string",
    )
    v = {r.id: r.embedding for r in hashed_doc_embeddings(df, "text", "doc_id", 60).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(v[0], v[1]) > 0.9
    assert cos(v[0], v[2]) < 0.5


def test_deterministic_across_partitioning(spark):
    df = spark.createDataFrame(
        [(i, f"doc number {i} shared vocabulary tokens") for i in range(50)],
        "doc_id bigint, text string",
    )
    a = {r.id: r.embedding for r in hashed_doc_embeddings(df, "text", "doc_id").collect()}
    b = {
        r.id: r.embedding
        for r in hashed_doc_embeddings(df.repartition(7), "text", "doc_id").collect()
    }
    assert a == b


def test_dim_cap_is_loud():
    with pytest.raises(ValueError, match="dim ≤ 60"):
        hashed_embedding(F.lit("x"), dim=61)


def test_duckdb_mirror(spark, documents):
    import duckdb

    DIM = 16
    docs = documents.limit(40).select("doc_id", "text")
    got = {
        r.id: r.embedding
        for r in hashed_doc_embeddings(docs, "text", "doc_id", DIM).collect()
    }
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    from fenix_spark.functions.texthash import duck_hash60, duck_tokens

    comps = ", ".join(
        f"list_sum(list_transform(hs, h -> ((h >> {b}) & 1) * 2 - 1))::DOUBLE"
        for b in range(DIM)
    )
    want = {
        i: v
        for i, v in con.execute(f"""
            WITH t AS (SELECT doc_id, {duck_tokens('text')} AS tk FROM docs),
            h AS (SELECT doc_id,
                         list_transform(tk, x -> {duck_hash60('x')}) AS hs
                  FROM t),
            raw AS (SELECT doc_id, [{comps}] AS v FROM h),
            n AS (SELECT doc_id,
                         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm, v
                  FROM raw)
            SELECT doc_id,
                   CASE WHEN nrm > 0
                        THEN list_transform(v, x -> x / nrm) ELSE v END
            FROM n
        """).fetchall()
    }
    assert set(got) == set(want)
    for i in got:
        for a, b in zip(got[i], want[i]):
            assert abs(a - b) < 1e-12


def test_feeds_knn_surface(spark, documents):
    from fenix_spark.operators.search import knn

    docs = documents.limit(200).select("doc_id", "text")
    emb = hashed_doc_embeddings(docs, "text", "doc_id").localCheckpoint(eager=False)
    q = emb.orderBy("id").first()
    hits = knn(emb, "embedding", q.embedding, metric="cosine", k=3, id_col="id").collect()
    assert hits[0].id == q.id  # self is its own nearest neighbor
