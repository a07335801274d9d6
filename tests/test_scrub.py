"""PII scrub + repetition rules (functions/scrub.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fenix_spark.functions.scrub import (
    dup_line_frac,
    pii_counts,
    redact_pii,
    repetition_flags,
    top_ngram_frac,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).first()["v"]


def test_redact_all_families(spark):
    text = (
        "mail bob.smith+x@example.co.uk or call 415-555-1234, "
        "server 192.168.0.1, ssn 123-45-6789, card 4111 1111 1111 1111."
    )
    out = _one(spark, text, redact_pii(F.col("text")))
    for tag in ("[EMAIL]", "[PHONE]", "[IPV4]", "[SSN]", "[CARD]"):
        assert tag in out, out
    for leak in ("example.co.uk", "415", "192.168", "6789", "4111"):
        assert leak not in out, out


def test_counts_and_precision(spark):
    clean = "a normal sentence with version 1.2.3 and year 2024 in it"
    counts = _one(spark, clean, pii_counts(F.col("text")))
    assert all(v == 0 for v in counts.asDict().values()), counts
    assert _one(spark, clean, redact_pii(F.col("text"))) == clean
    two = _one(spark, "a@b.io c@d.io 10.0.0.1", pii_counts(F.col("text")))
    assert two["email"] == 2 and two["ipv4"] == 1


def test_dup_line_frac(spark):
    text = "same line\nsame line\nsame line\nunique\n\n  \n"
    assert abs(_one(spark, text, dup_line_frac(F.col("text"))) - 0.5) < 1e-9
    assert _one(spark, "one line only", dup_line_frac(F.col("text"))) == 0.0


def test_top_ngram_frac(spark):
    # "the cat" appears 3x in 8 tokens → 3*2/8 = 0.75
    text = "the cat the cat the cat sat down"
    assert abs(_one(spark, text, top_ngram_frac(F.col("text"), 2)) - 0.75) < 1e-9
    varied = "alpha beta gamma delta epsilon zeta"
    assert _one(spark, varied, top_ngram_frac(F.col("text"), 2)) <= 2 / 6 + 1e-9


def test_repetition_flags_on_documents(spark, documents):
    out = repetition_flags(documents.limit(200))
    rows = out.select("doc_id", "dup_line_frac", "top_ngram_frac", "repetition_keep").collect()
    assert len(rows) == 200
    for r in rows:
        assert 0.0 <= r["dup_line_frac"] <= 1.0
        assert 0.0 <= r["top_ngram_frac"] <= 1.0
    # plan must stay expression-only (no Python eval)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_compression_ratio_separates_repetitive_from_prose(spark):
    from fenix_spark.functions.scrub import compression_ratios

    rows = [
        (0, "spam spam spam spam " * 50),
        (1, "The quarterly report outlines revenue growth across distinct "
            "regions, with particular strength in renewables and logistics, "
            "while cautioning that currency headwinds may compress margins."),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.id: r for r in compression_ratios(df, "text", "doc_id").collect()}
    assert got[0].ratio < 0.1          # highly repetitive
    assert got[1].ratio > 0.5          # prose
    assert got[2].ratio is None and got[2].raw_len == 0
    # exact zlib parity with the driver
    import zlib

    b = rows[1][1].encode()
    assert got[1].zlib_len == len(zlib.compress(b, 6))


def test_top_ngram_frac_matches_brute_force(spark):
    """The sorted-run modal count must equal the brute-force modal
    count on arbitrary token streams (the O(g log g) rewrite is
    result-identical to the O(g^2) definition)."""
    import collections
    import random

    rng = random.Random(9)
    texts = [
        " ".join(rng.choice("a b c dd e".split()) for _ in range(rng.randint(0, 40)))
        for _ in range(30)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r.f
        for r in df.select(
            F.round(top_ngram_frac(F.col("text"), 2), 9).alias("f")
        ).collect()
    ]
    for t, g in zip(texts, got):
        toks = t.split()
        if len(toks) < 2:
            assert g == 0.0
            continue
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        top = max(collections.Counter(grams).values())
        assert abs(g - min(1.0, top * 2 / len(toks))) < 1e-9


def test_repetition_metrics_duckdb_mirror(spark):
    """Row-identical DuckDB mirror of the Gopher repetition metrics
    over the REAL documents corpus — the staging bar for a future
    oracle-suite row (the epoch_sample precedent: the mirror goes
    green in the operator's own test file BEFORE promotion). One
    definition (scrub.duckdb_repetition_sql) would be shared by both."""
    import duckdb

    from fenix_spark.functions.scrub import (
        dup_line_frac,
        duckdb_repetition_sql,
        top_ngram_frac,
    )

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (r["dup_line_frac"], r["top_ngram_frac"])
        for r in docs.select(
            "doc_id",
            F.round(dup_line_frac(F.col("text")), 6).alias("dup_line_frac"),
            F.round(top_ngram_frac(F.col("text"), 2), 6).alias("top_ngram_frac"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = {
        d: (dlf, tnf)
        for d, dlf, tnf in con.execute(duckdb_repetition_sql("documents")).fetchall()
    }
    assert len(got) == len(want) == 500
    mismatches = {
        d: (got[d], want[d]) for d in got if got[d] != want[d]
    }
    assert not mismatches, dict(list(mismatches.items())[:5])
    # the metrics carry real signal on this corpus (not a trivial
    # all-zeros mirror)
    assert any(v[1] > 0 for v in got.values())
