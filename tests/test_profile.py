"""One-pass profiling (operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fenix_spark.operators.profile import profile


def test_profile_documents(documents):
    stats = {r["column"]: r for r in profile(documents).collect()}
    assert set(stats) == set(documents.columns)
    n = documents.count()
    for r in stats.values():
        assert r["n_rows"] == n
    langs = stats["lang"]
    n_langs = documents.select("lang").distinct().count()
    assert abs(langs["approx_distinct"] - n_langs) <= max(1, int(0.1 * n_langs))
    assert langs["n_nulls"] == 0
    ids = stats["doc_id"]
    assert int(ids["min_repr"]) == documents.agg(F.min("doc_id")).head()[0]
    assert int(ids["max_repr"]) == documents.agg(F.max("doc_id")).head()[0]


def test_profile_single_scan_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, None, [1.0]), (2, "x", None), (None, "y", [2.0])],
        "a int, b string, v array<double>",
    )
    stats = {r["column"]: r for r in profile(df).collect()}
    assert stats["a"]["n_nulls"] == 1
    assert stats["b"]["n_nulls"] == 1
    assert stats["v"]["n_nulls"] == 1
    assert stats["v"]["min_repr"] is None  # arrays are not orderable
    assert stats["a"]["min_repr"] == "1" and stats["a"]["max_repr"] == "2"
