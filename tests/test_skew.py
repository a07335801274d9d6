"""Key-skew diagnostics (operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.skew import (
    key_skew_report,
    recommended_salts,
    simulate_partition_load,
    skew_certificate,
)


def _skewed(spark, n=10_000, hot_share=0.3):
    hot = int(n * hot_share)
    rows = [("HOT", i) for i in range(hot)] + [
        (f"k{i % 500}", i) for i in range(hot, n)
    ]
    return spark.createDataFrame(rows, "key string, v long"), n, hot


def test_planted_hot_key_flagged_exactly(spark):
    df, n, hot = _skewed(spark)
    rep = key_skew_report(df, ["key"], k=5, m=64, shuffle_partitions=32)
    top = rep.head()
    assert top["key"] == "HOT"
    assert top["count"] == hot  # exact, not an estimate
    assert top["share"] == pytest.approx(hot / n)
    # a balanced reducer carries n/32 rows; HOT needs hot/(n/32) salts
    assert top["salt_factor"] == -(-hot // (n / 32))


def test_simulated_load_drops_with_salting(spark):
    df, n, _ = _skewed(spark)
    rows = [
        r.asDict()
        for r in key_skew_report(
            df, ["key"], k=5, m=64, shuffle_partitions=32
        ).collect()
    ]
    unsalted = simulate_partition_load(rows, n, 32, salted=False)
    salted = simulate_partition_load(rows, n, 32, salted=True)
    # the hot key alone is ~9.6x a balanced reducer; salted it flattens
    assert unsalted > 8.0
    assert salted < 2.5
    assert recommended_salts(rows) == rows[0]["salt_factor"]


def test_certificate_uniform_true_skewed_false(spark):
    uni = spark.createDataFrame(
        [(f"k{i % 400}",) for i in range(8_000)], "key string"
    )
    rep = key_skew_report(uni, ["key"], k=10, m=256, shuffle_partitions=32)
    assert skew_certificate(rep, threshold_share=0.05)
    df, _, _ = _skewed(spark)
    rep2 = key_skew_report(df, ["key"], k=10, m=256, shuffle_partitions=32)
    assert not skew_certificate(rep2, threshold_share=0.05)


def test_certificate_refuses_insufficient_resolution(spark):
    df, _, _ = _skewed(spark)
    rep = key_skew_report(df, ["key"], k=10, m=4, shuffle_partitions=32)
    with pytest.raises(ValueError, match="larger m"):
        skew_certificate(rep, threshold_share=0.01)


def test_composite_keys_and_null_component(spark):
    rows = [("a", None, i) for i in range(3_000)] + [
        ("a", f"s{i % 100}", i) for i in range(3_000)
    ]
    df = spark.createDataFrame(rows, "x string, y string, v long")
    rep = key_skew_report(df, ["x", "y"], k=3, m=64, shuffle_partitions=16)
    top = rep.head()
    assert top["count"] == 3_000
    assert "\x00NULL" in top["key"]
    # the NULL sentinel is distinct from the literal string "NULL"
    lit = spark.createDataFrame(
        [("a", "NULL", i) for i in range(100)], "x string, y string, v long"
    )
    rep2 = key_skew_report(df.unionByName(lit), ["x", "y"], k=3, m=64)
    counts = {r["key"]: r["count"] for r in rep2.collect()}
    assert counts["a\x1f\x00NULL"] == 3_000


def test_salted_join_with_recommended_factor_is_exact(spark):
    """Close the loop: diagnose → salt with the recommended factor →
    the salted join still equals the plain join."""
    from fenix_spark.operators.joins import salted_join

    df, n, _ = _skewed(spark, n=4_000)
    rows = [
        r.asDict()
        for r in key_skew_report(
            df, ["key"], k=5, m=64, shuffle_partitions=16
        ).collect()
    ]
    s = recommended_salts(rows)
    assert s > 1
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"d{i}") for i in range(500)],
        "key string, attr string",
    )
    plain = set(
        (r["key"], r["v"], r["attr"])
        for r in df.join(dim, "key").collect()
    )
    salted = set(
        (r["key"], r["v"], r["attr"])
        for r in salted_join(df, dim, "key", salts=s).collect()
    )
    assert salted == plain
