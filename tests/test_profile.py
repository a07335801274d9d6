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


def test_profile_kll_quantiles_and_sketch(spark):
    """quantiles= adds a rank-bounded map for numeric columns (null
    for non-numeric), and the exposed rollup is the MERGEABLE state:
    merging per-shard sketches equals the direct build's quantiles."""
    import numpy as np

    from fenix_spark.operators.profile import profile, profile_quantile_sketch
    from fenix_spark.operators.sketches import kll_merge, kll_quantiles

    vals = [float(i) for i in range(1, 1001)]
    df = spark.createDataFrame(
        [(v, int(v) % 7, f"s{int(v)}") for v in vals], "x double, g int, s string"
    )
    stats = {r["column"]: r for r in profile(df, quantiles=[0.25, 0.5, 0.9]).collect()}
    assert stats["s"]["quantiles"] is None
    qx = stats["x"]["quantiles"]
    srt = np.array(sorted(vals))
    for q, v in qx.items():
        rank = np.searchsorted(srt, v, side="right") / len(srt)
        assert abs(rank - q) <= 0.03, (q, v, rank)
    # no-quantiles call keeps the old 7-column schema
    assert "quantiles" not in profile(df).columns

    # mergeable state: shard sketches merged == direct quantiles class
    a = profile_quantile_sketch(df.where("x <= 400"))
    b = profile_quantile_sketch(df.where("x > 400"))
    merged = kll_merge(a.unionByName(b), ["column"])
    got = {
        (r["column"], r["q"]): r["value"]
        for r in kll_quantiles(merged, ["column"], [0.5]).collect()
    }
    rank = np.searchsorted(srt, got[("x", 0.5)], side="right") / len(srt)
    assert abs(rank - 0.5) <= 0.03


def test_profile_quantiles_partition_invariant(spark):
    """The profile quantile path inherits KLL's partition invariance:
    identical data in 2 vs 16 partitions lands every quantile within
    the rank-error class (deterministic compaction coins make each
    layout itself stable across retries)."""
    import numpy as np

    from fenix_spark.operators.profile import profile

    vals = [float(i) ** 1.5 for i in range(1, 2001)]  # skewed
    srt = np.array(sorted(vals))
    rows = [(v,) for v in vals]
    qs = [0.1, 0.5, 0.9, 0.99]
    for parts in (2, 16):
        df = spark.createDataFrame(rows, "x double").repartition(parts)
        qmap = {
            r["column"]: r["quantiles"]
            for r in profile(df, quantiles=qs).collect()
        }["x"]
        for q, v in qmap.items():
            rank = np.searchsorted(srt, v, side="right") / len(srt)
            assert abs(rank - q) <= 0.03, (parts, q, v, rank)
