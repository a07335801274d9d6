"""Datacard tests: scalar correctness on a corpus with known
composition, dup-rate estimation, language distribution shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.datacard import datacard


def test_datacard_known_corpus(spark):
    rows = [(i, f"alpha beta gamma delta epsilon{i}") for i in range(8)]
    rows += [(100 + i, f"the quick brown fox{i} jumps") for i in range(2)]
    # one exact duplicate pair (ids 200/201 share content)
    rows += [(200, "duplicated content here exactly"), (201, "duplicated content here exactly")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    card, lang = datacard(df, "text", "doc_id")
    assert card["n_docs"] == 12
    assert card["total_tokens"] == 8 * 5 + 2 * 5 + 2 * 4
    assert abs(card["avg_tokens"] - card["total_tokens"] / 12) < 1e-9
    # 11 distinct contents of 12 docs → dup rate ≈ 1/12 (HLL carries
    # small-cardinality wobble → generous tolerance)
    assert abs(card["exact_dup_rate_est"] - 1 / 12) < 0.1
    assert card["tokens_p50"] == 5.0

    dist = lang.collect()
    assert abs(sum(r.doc_frac for r in dist) - 1.0) < 1e-9
    assert dist[0].n_docs >= dist[-1].n_docs


def test_datacard_on_documents(spark, documents):
    card, lang = datacard(documents, "text", "doc_id")
    assert card["n_docs"] == documents.count()
    assert card["total_tokens"] > 0
    assert 0.0 <= card["exact_dup_rate_est"] < 1.0
    assert lang.count() >= 1


def test_datacard_metadata_dependence_section(spark, documents):
    from fenix_spark.operators.datacard import datacard
    from pyspark.sql import functions as F

    # lang_copy is a pure renaming of lang: it must show up redundant
    df = documents.withColumn("lang_copy", F.upper("lang"))
    card, _ = datacard(
        df, "text", "doc_id", metadata_cols=("lang", "source", "lang_copy")
    )
    ent = card["metadata_entropy"]
    assert set(ent) == {"lang", "source", "lang_copy"}
    assert ent["lang"] == pytest.approx(ent["lang_copy"])
    assert all(v >= 0 for v in ent.values())
    pairs = card["redundant_metadata_pairs"]
    assert ("lang", "lang_copy", pytest.approx(1.0)) in [
        (a, b, n) for a, b, n in pairs
    ]
    assert all(n >= 0.9 for _, _, n in pairs)
    # without metadata_cols the card is unchanged (backwards compat)
    card2, _ = datacard(documents, "text", "doc_id")
    assert "metadata_entropy" not in card2
