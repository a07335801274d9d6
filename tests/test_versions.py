"""Versioned-table tests: snapshot immutability, time travel,
rollback, vacuum safety, and the write-then-flip protocol."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fenix_spark.versions import (
    current_version,
    list_versions,
    read_version,
    rollback,
    vacuum,
    write_version,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "store")


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_versions_accumulate_and_latest_resolves(spark, root):
    assert write_version(root, "t", _df(spark, 3, "a")) == 1
    assert write_version(root, "t", _df(spark, 5, "b")) == 2
    assert list_versions(root, "t") == [1, 2]
    assert current_version(root, "t") == 2
    assert read_version(spark, root, "t").count() == 5
    # time travel: v1 unchanged by the v2 write
    v1 = read_version(spark, root, "t", version=1)
    assert v1.count() == 3 and v1.select("tag").distinct().head().tag == "a"


def test_rollback_is_pointer_only(spark, root):
    write_version(root, "t", _df(spark, 3, "a"))
    write_version(root, "t", _df(spark, 5, "b"))
    rollback(root, "t", 1)
    assert current_version(root, "t") == 1
    assert read_version(spark, root, "t").count() == 3
    # the newer snapshot still exists and is still readable
    assert read_version(spark, root, "t", version=2).count() == 5
    # the next write version continues from the max, not the pointer
    assert write_version(root, "t", _df(spark, 7, "c")) == 3


def test_rollback_unknown_version_raises(spark, root):
    write_version(root, "t", _df(spark, 1, "a"))
    with pytest.raises(FileNotFoundError, match="v=9"):
        rollback(root, "t", 9)


def test_vacuum_keeps_current_and_newest(spark, root):
    for tag in "abcd":
        write_version(root, "t", _df(spark, 2, tag))
    rollback(root, "t", 1)  # current = 1, versions = [1,2,3,4]
    deleted = vacuum(root, "t", keep=2)
    # keeps newest two (3,4) and NEVER the current pointer (1)
    assert deleted == [2]
    assert list_versions(root, "t") == [1, 3, 4]
    assert read_version(spark, root, "t").count() == 2  # pointer intact


def test_missing_table_and_version_raise(spark, root):
    with pytest.raises(FileNotFoundError, match="_LATEST"):
        read_version(spark, root, "nope")
    write_version(root, "t", _df(spark, 1, "a"))
    with pytest.raises(FileNotFoundError, match="v=5"):
        read_version(spark, root, "t", version=5)


def test_flip_is_atomic_rename_no_partial_pointer(spark, root):
    """The _LATEST file must always contain a complete version id —
    the flip goes through a temp file + os.replace, so no reader can
    observe an empty/partial pointer."""
    write_version(root, "t", _df(spark, 2, "a"))
    d = os.path.join(root, "versions", "t")
    # no leftover temp files after a successful flip
    assert [e for e in os.listdir(d) if e.startswith("._latest_")] == []
    with open(os.path.join(d, "_LATEST")) as f:
        assert f.read().strip() == "1"


def test_merge_upsert_insert_update_delete(spark, root):
    from fenix_spark.versions import merge_upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id bigint, val string"
    )
    write_version(root, "t", base)
    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "id bigint, val string, is_delete boolean",
    )
    v = merge_upsert(spark, root, "t", updates, "id", delete_col="is_delete")
    assert v == 2
    got = {r.id: r.val for r in read_version(spark, root, "t").collect()}
    assert got == {1: "a", 2: "B", 4: "d"}  # 3 deleted, 2 updated, 4 inserted
    # time travel still shows the pre-merge state
    old = {r.id: r.val for r in read_version(spark, root, "t", version=1).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_diff_versions_cdc(spark, root):
    from fenix_spark.versions import diff_versions, merge_upsert

    write_version(
        root, "t", spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id bigint, val string")
    )
    merge_upsert(
        spark,
        root,
        "t",
        spark.createDataFrame(
            [(2, "B", False), (4, "d", False), (3, None, True)],
            "id bigint, val string, is_delete boolean",
        ),
        "id",
        delete_col="is_delete",
    )
    got = {r.id: r.change for r in diff_versions(spark, root, "t", 1, 2, "id").collect()}
    assert got == {2: "update", 3: "delete", 4: "insert"}
    # symmetric direction flips the verbs
    rev = {r.id: r.change for r in diff_versions(spark, root, "t", 2, 1, "id").collect()}
    assert rev == {2: "update", 3: "insert", 4: "delete"}
    # no-change diff is empty
    assert diff_versions(spark, root, "t", 1, 1, "id").count() == 0
