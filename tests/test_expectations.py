"""Expectations tests: rule-ledger correctness (nulls are
violations), one-scan plan contract, quarantine split semantics,
gate raising, uniqueness and referential checks on real tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.expectations import (
    expect_subset,
    expect_unique,
    quarantine,
    require,
    validate,
)


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (0, "ok", 10.0),
        (1, "ok", -3.0),  # negative value
        (2, None, 5.0),  # null status
        (3, "ok", None),  # null value → violates value rule (unknown ≠ pass)
        (4, "weird", 2.0),  # bad status
    ]
    return spark.createDataFrame(rows, "id bigint, status string, value double")


def _rules():
    # built lazily: Column construction needs an active session
    return [
        ("status_known", F.col("status").isin("ok", "closed")),
        ("value_nonneg", F.col("value") >= 0),
    ]


def test_validate_ledger(spark, messy):
    got = {r.rule: (r.violations, r.total) for r in validate(messy, _rules()).collect()}
    assert got == {"status_known": (2, 5), "value_nonneg": (2, 5)}


def test_validate_is_one_scan(spark, messy):
    plan = validate(messy, _rules())  # plan inspection happens pre-collect
    # the AGG dataframe: one aggregate over the source, no join/shuffle
    agg_df = messy.agg(
        F.count(F.lit(1)).alias("t"),
        *[F.sum((~F.coalesce(p, F.lit(False))).cast("long")).alias(n) for n, p in _rules()],
    )
    s = agg_df._jdf.queryExecution().executedPlan().toString()
    assert s.count("Scan") == 1
    assert plan.count() == 2  # ledger rows, one per rule


def test_quarantine_split(spark, messy):
    clean, bad = quarantine(messy, _rules())
    assert sorted(r.id for r in clean.collect()) == [0]
    bad_rows = {r.id: list(r["__failed"]) for r in bad.collect()}
    assert bad_rows[1] == ["value_nonneg"]
    assert bad_rows[2] == ["status_known"]
    assert bad_rows[3] == ["value_nonneg"]
    assert bad_rows[4] == ["status_known"]
    assert "__failed" not in clean.columns


def test_require_gate(spark, messy):
    with pytest.raises(ValueError, match="status_known"):
        require(messy, _rules())
    # generous tolerance passes and returns the frame unchanged
    out = require(messy, _rules(), max_fraction=0.5)
    assert out.count() == 5


def test_unique_and_subset_on_tpch(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert expect_unique(orders, ["o_orderkey"]).count() == 0
    assert expect_subset(orders, "o_custkey", customer, "c_custkey").count() == 0
    # planted violation is caught
    dangling = orders.limit(5).withColumn("o_custkey", F.lit(-999))
    assert expect_subset(dangling, "o_custkey", customer, "c_custkey").count() == 5


def test_validate_on_empty_frame(spark, messy):
    empty = messy.where(F.lit(False))
    got = {r.rule: (r.violations, r.total, r.fraction) for r in validate(empty, _rules()).collect()}
    assert got == {"status_known": (0, 0, 0.0), "value_nonneg": (0, 0, 0.0)}
    # gate passes on empty input instead of crashing
    require(empty, _rules())


def test_duplicate_rule_names_rejected(spark):
    import pytest
    from pyspark.sql import functions as F

    from fenix_spark.operators.expectations import validate

    df = spark.range(5)
    with pytest.raises(ValueError, match="unique"):
        validate(df, [("r", F.col("id") >= 0), ("r", F.col("id") < 10)])
    with pytest.raises(ValueError, match="__total"):
        validate(df, [("__total", F.col("id") >= 0)])


def test_expect_complete_per_column(spark):
    from fenix_spark.operators.expectations import expect_complete

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, None), (3, "c", 1.0), (4, "d", None)],
        "id bigint, s string, v double",
    )
    got = {r.column: r for r in expect_complete(df, ["id", "s", "v"], 0.3).collect()}
    assert got["id"].nulls == 0 and got["id"].ok
    assert got["s"].nulls == 1 and got["s"].fraction == 0.25 and got["s"].ok
    assert got["v"].nulls == 3 and not got["v"].ok
    # empty frame: zero fractions, everything ok
    empty = expect_complete(df.where("id < 0"), ["s"]).collect()
    assert empty[0].fraction == 0.0 and empty[0].ok


def test_expect_monotonic_finds_regressions(spark):
    from fenix_spark.operators.expectations import expect_monotonic

    rows = [
        ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 15.0),  # regression at 3
        ("b", 1, 5.0), ("b", 2, 5.0),                    # flat
    ]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    bad = expect_monotonic(df, "k", "o", "v").collect()
    assert [(r.k, r.o, r.v, r.prev_value) for r in bad] == [("a", 3, 15.0, 20.0)]
    # strict mode also rejects the flat step
    strict = {(r.k, r.o) for r in expect_monotonic(df, "k", "o", "v", strict=True).collect()}
    assert strict == {("a", 3), ("b", 2)}


def test_expect_fresh_ledger(spark):
    from fenix_spark.operators.expectations import expect_fresh

    df = spark.createDataFrame([(1_000,), (9_000,)], "ts bigint")
    [ok] = expect_fresh(df, "ts", as_of_ms=10_000, max_lag_ms=2_000).collect()
    assert ok.latest_ms == 9_000 and ok.lag_ms == 1_000 and ok.ok
    [stale] = expect_fresh(df, "ts", as_of_ms=20_000, max_lag_ms=2_000).collect()
    assert not stale.ok
    [empty] = expect_fresh(
        df.where("ts < 0"), "ts", as_of_ms=10_000, max_lag_ms=2_000
    ).collect()
    assert empty.latest_ms is None and not empty.ok


def test_expect_schema_ledger(spark):
    from fenix_spark.operators.expectations import expect_schema

    df = spark.createDataFrame(
        [(1, "x", 2.0)], "id bigint, text string, extra double"
    )
    got = {r.column: r.status for r in expect_schema(
        df, "id bigint, text string, missing_col int"
    ).collect()}
    assert got == {
        "id": "ok",
        "text": "ok",
        "missing_col": "missing",
        "extra": "extra",
    }
    # type mismatch + allow_extra
    got2 = {r.column: r.status for r in expect_schema(
        df, "id string, text string", allow_extra=True
    ).collect()}
    assert got2["id"] == "type_mismatch" and got2["extra"] == "ok"
    # clean pass: every row ok
    clean = expect_schema(df, "id bigint, text string, extra double").collect()
    assert all(r.status == "ok" for r in clean)
