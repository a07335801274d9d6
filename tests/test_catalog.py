"""Catalog semantics (catalog.py), mirroring the reference's table
API invariants (/root/reference/src/fenix/io/table/table.py:9-56 and
tests/test_flight.py:42-50 round-trip exactness)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fenix_spark import catalog


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "store")


def _df(spark, n=20, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_make_load_roundtrip(spark, root):
    src = _df(spark)
    catalog.make(root, "t1", src)
    got = catalog.load(spark, root, "t1")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in src.collect()}


def test_multi_load_unions_by_name(spark, root):
    catalog.make(root, "a", _df(spark, 5))
    catalog.make(root, "b", _df(spark, 5, offset=100))
    got = catalog.load(spark, root, ["a", "b"])
    assert got.count() == 10
    assert set(got.columns) == {"k", "v"}


def test_list_and_drop(spark, root):
    catalog.make(root, "x", _df(spark))
    catalog.make(root, "y", _df(spark))
    assert list(catalog.list_tables(root)) == ["x", "y"]
    catalog.drop(root, "x")
    assert list(catalog.list_tables(root)) == ["y"]
    catalog.drop(root, "x")  # idempotent, like unlink+exists guard


def test_remove_whole_store(spark, root):
    catalog.make(root, "x", _df(spark))
    catalog.remove(root)
    assert not os.path.isdir(root)
    assert list(catalog.list_tables(root)) == []


def test_make_overwrites(spark, root):
    catalog.make(root, "t", _df(spark, 10))
    catalog.make(root, "t", _df(spark, 3, offset=50))
    assert catalog.load(spark, root, "t").count() == 3


def test_hstack_last_wins(spark):
    """Duplicate non-key columns resolve to the RIGHT side, matching
    the reference's dict-comprehension last-wins (table.py:39-40)."""
    left = spark.createDataFrame([(1, "l1", 10), (2, "l2", 20)], "k int, v string, only_l int")
    right = spark.createDataFrame([(1, "r1", 5), (2, "r2", 6)], "k int, v string, only_r int")
    out = catalog.hstack(left, right, "k")
    rows = {r["k"]: (r["v"], r["only_l"], r["only_r"]) for r in out.collect()}
    assert rows == {1: ("r1", 10, 5), 2: ("r2", 20, 6)}


def test_partitioned_make_prunes(spark, root):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("part")
    )
    catalog.make(root, "p", df, partition_by=["part"])
    got = catalog.load(spark, root, "p").where(F.col("part") == 2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert got.count() == 25
