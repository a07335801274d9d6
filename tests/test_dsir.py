"""DSIR importance-resampling tests: hand-checkable synthetic corpora,
a full fit+score DuckDB mirror (engine-independence bar), deterministic
Gumbel top-k selection, and plan-shape checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.dsir import (
    doc_gram_buckets,
    dsir_select,
    fit_importance_model,
    gram_occurrences,
    importance_weights,
)


@pytest.fixture(scope="module")
def corpora(spark):
    # target: "spark sql"-flavored text; raw: half target-like, half noise
    target = spark.createDataFrame(
        [
            (0, "spark sql query engine"),
            (1, "query engine spark sql"),
            (2, "sql engine for spark"),
        ],
        "doc_id bigint, text string",
    )
    raw = spark.createDataFrame(
        [
            (10, "spark sql engine"),
            (11, "query engine sql spark"),
            (12, "banana banana smoothie recipe"),
            (13, "weather umbrella rain boots"),
            (14, "spark query sql"),
            (15, "chocolate cake flour sugar"),
        ],
        "doc_id bigint, text string",
    )
    return target, raw


def test_gram_occurrences_counts_and_short_docs(spark):
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "solo"), (2, ""), (3, "x y")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: sorted(r.g)
        for r in df.select(
            "doc_id", gram_occurrences(F.col("text"), 2).alias("g")
        ).collect()
    }
    # occurrences, not distinct: "a" appears twice in doc 0
    assert got[0] == ["a", "a", "a b", "b", "b a"]
    # <2 tokens → unigrams only, no whole-doc bigram fallback
    assert got[1] == ["solo"]
    assert got[2] == []
    assert got[3] == ["x", "x y", "y"]


def test_target_like_docs_outweigh_noise(spark, corpora):
    target, raw = corpora
    model = fit_importance_model(target, raw, "text", "doc_id", buckets=997)
    w = {r.id: r.log_weight for r in importance_weights(raw, "text", "doc_id", model).collect()}
    target_like = [w[10], w[11], w[14]]
    noise = [w[12], w[13], w[15]]
    assert min(target_like) > max(noise)


def test_duckdb_mirror_fit_and_score(spark, documents):
    """Fit on 80 docs / score 150 overlapping docs in both engines;
    log weights must agree to the 6dp output rounding."""
    import duckdb

    B, ALPHA = 1009, 0.5
    docs = documents.limit(150).select("doc_id", "text")
    target = documents.limit(80).select("doc_id", "text")
    model = fit_importance_model(target, docs, "text", "doc_id", buckets=B, alpha=ALPHA)
    got = {
        r.id: (r.n_grams, r.log_weight)
        for r in importance_weights(docs, "text", "doc_id", model).collect()
    }

    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    con.register("tgt", target.toPandas())
    from fenix_spark.functions.texthash import duck_hash60, duck_tokens

    def grams_cte(src: str, name: str) -> str:
        # unigrams ++ bigrams (no short-doc fallback), then bucket
        return f"""
        {name}_t AS (SELECT doc_id, {duck_tokens('text')} AS tk FROM {src}),
        {name} AS (
            SELECT doc_id, {duck_hash60('g')} % {B} AS b
            FROM (
                SELECT doc_id, u.g AS g FROM {name}_t,
                UNNEST(list_concat(tk,
                    CASE WHEN len(tk) >= 2 THEN
                        list_transform(generate_series(1, len(tk) - 1),
                                       i -> tk[i] || ' ' || tk[i+1])
                    ELSE [] END)) u(g)
            )
        )"""

    want = con.execute(f"""
        WITH {grams_cte('tgt', 'tg')}, {grams_cte('docs', 'rg')},
        tc AS (SELECT b, count(*)::DOUBLE AS ct FROM tg GROUP BY b),
        rc AS (SELECT b, count(*)::DOUBLE AS cr FROM rg GROUP BY b),
        ratio AS (
            SELECT d.b,
                   ln((coalesce(tc.ct, 0) + {ALPHA}) /
                      ((SELECT count(*) FROM tg)::DOUBLE + {ALPHA} * {B}))
                 - ln((coalesce(rc.cr, 0) + {ALPHA}) /
                      ((SELECT count(*) FROM rg)::DOUBLE + {ALPHA} * {B})) AS lr
            FROM (SELECT range AS b FROM range({B})) d
            LEFT JOIN tc ON tc.b = d.b LEFT JOIN rc ON rc.b = d.b
        ),
        scored AS (
            SELECT g.doc_id, count(*) AS n_grams, sum(r.lr) AS lw
            FROM rg g JOIN ratio r USING (b) GROUP BY g.doc_id
        )
        SELECT d.doc_id, coalesce(s.n_grams, 0) AS n_grams,
               round(coalesce(s.lw, 0.0), 6) AS lw
        FROM docs d LEFT JOIN scored s USING (doc_id)
    """).fetchall()
    assert len(want) == len(got)
    for doc_id, ng, lw in want:
        g = got[doc_id]
        assert g[0] == ng
        assert abs(g[1] - lw) <= 1e-6


def test_selection_deterministic_under_repartition(spark, corpora):
    target, raw = corpora
    model = fit_importance_model(target, raw, "text", "doc_id", buckets=997)
    a = [r.id for r in dsir_select(raw, "text", "doc_id", model, k=3, salt="s").collect()]
    b = [
        r.id
        for r in dsir_select(
            raw.repartition(7), "text", "doc_id", model, k=3, salt="s"
        ).collect()
    ]
    assert a == b and len(a) == 3


def test_extreme_weight_always_selected(spark):
    # one doc is a verbatim slice of the target; it must win any k=1 draw
    target = spark.createDataFrame(
        [(0, "alpha beta gamma delta " * 5)], "doc_id bigint, text string"
    )
    raw_rows = [(100, "alpha beta gamma delta " * 5)] + [
        (200 + i, f"unrelated noise token{i} filler junk") for i in range(20)
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id bigint, text string")
    model = fit_importance_model(target, raw, "text", "doc_id", buckets=997)
    for salt in ("a", "b", "c"):
        sel = dsir_select(raw, "text", "doc_id", model, k=1, salt=salt).collect()
        assert [r.id for r in sel] == [100]


def test_gumbel_key_distribution_sanity(spark):
    # mean of Gumbel(0,1) is Euler-Mascheroni ≈ 0.5772; check the
    # hash-derived draws land near it (law of large numbers, n=4000)
    from fenix_spark.operators.dsir import gumbel_key

    n = 4000
    df = spark.range(n).select(gumbel_key(F.col("id"), "t").alias("g"))
    m = df.agg(F.avg("g")).first()[0]
    assert abs(m - 0.5772) < 0.05


def test_scoring_plan_is_broadcast_join_single_agg(spark, corpora):
    target, raw = corpora
    model = fit_importance_model(target, raw, "text", "doc_id", buckets=997)
    plan = importance_weights(raw, "text", "doc_id", model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus-sized agg must partial-aggregate map-side
    assert plan.count("HashAggregate") >= 2
