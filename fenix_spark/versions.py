"""Versioned tables — snapshot isolation / time travel for the
catalog, delta-lake-lite and purely ADDITIVE (the flat
``catalog.make``/``load`` layout is untouched).

Layout, under the same store root:

    versions/<name>/v=<N>/          parquet snapshot N (immutable)
    versions/<name>/_LATEST         one line: the current version id

Write protocol = write-then-flip: the new snapshot is fully written
under its own ``v=<N>`` directory BEFORE the ``_LATEST`` pointer is
atomically replaced (``os.replace`` of a temp file — POSIX-atomic), so
readers always resolve to a complete snapshot; a writer crash leaves
an orphan snapshot directory, never a torn table. Rollback is a
pointer flip to an existing version — O(1), no data movement.

At 100 TB this is the same cost model as any snapshot store: each
version pays only its own write; old versions share nothing (no
copy-on-write file reuse — that is the documented difference from
Delta/Iceberg, chosen so a snapshot is a plain self-contained parquet
directory every tool can read directly). ``vacuum`` deletes
out-of-pointer versions older than a keep count.

Two stated contracts (not silently assumed):

- SINGLE WRITER per table: version ids are assigned by listing, so
  two concurrent writers can race to the same ``v=<N>`` and clobber
  each other's snapshot. Readers are always safe (the pointer only
  ever names a complete snapshot); writer serialization is the
  caller's (scheduler's) job — the same model as a cron-owned table.
- POSIX-path semantics: the atomic flip is ``os.replace`` and
  listing/vacuum are local-path ops, like ``catalog.compact``
  (SCALE.md known bounds). An object-store deployment wants a table
  format with a real commit protocol instead.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _table_dir(root: str, name: str) -> str:
    return os.path.join(root, "versions", name)


def _latest_path(root: str, name: str) -> str:
    return os.path.join(_table_dir(root, name), "_LATEST")


def list_versions(root: str, name: str) -> list[int]:
    d = _table_dir(root, name)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(e.split("=", 1)[1]) for e in os.listdir(d) if e.startswith("v=")
    )


def current_version(root: str, name: str) -> int | None:
    p = _latest_path(root, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def _flip_latest(root: str, name: str, version: int) -> None:
    d = _table_dir(root, name)
    fd, tmp = tempfile.mkstemp(dir=d, prefix="._latest_")
    with os.fdopen(fd, "w") as f:
        f.write(str(version))
    os.replace(tmp, _latest_path(root, name))  # atomic pointer flip


def write_version(root: str, name: str, df: DataFrame) -> int:
    """Write the next snapshot and flip ``_LATEST`` to it; returns the
    new version id."""
    versions = list_versions(root, name)
    version = (versions[-1] + 1) if versions else 1
    d = _table_dir(root, name)
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(d, f"v={version}"))
    _flip_latest(root, name, version)
    return version


def read_version(
    spark: SparkSession, root: str, name: str, version: int | None = None
) -> DataFrame:
    """Load a snapshot: ``version=None`` resolves the ``_LATEST``
    pointer (snapshot isolation — concurrent writers flip the pointer
    only after their snapshot is complete); an explicit version is
    time travel."""
    if version is None:
        version = current_version(root, name)
        if version is None:
            raise FileNotFoundError(f"versioned table {name!r} has no _LATEST")
    d = os.path.join(_table_dir(root, name), f"v={version}")
    if not os.path.isdir(d):
        raise FileNotFoundError(f"versioned table {name!r} has no v={version}")
    return spark.read.parquet(d)


def rollback(root: str, name: str, version: int) -> None:
    """Point ``_LATEST`` at an existing older version — O(1), data
    untouched; the rolled-back-over versions remain readable until
    vacuumed."""
    if version not in list_versions(root, name):
        raise FileNotFoundError(f"versioned table {name!r} has no v={version}")
    _flip_latest(root, name, version)


def merge_upsert(
    spark: SparkSession,
    root: str,
    name: str,
    updates: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> int:
    """MERGE INTO, snapshot-style: combine the latest snapshot with
    ``updates`` (matched keys take the update row — last-wins; new keys
    insert; rows whose ``delete_col`` is true are dropped) and write
    the result as the next version. Readers on the old version see a
    consistent snapshot throughout; the flip is atomic.

    The combine is one full-outer-shaped pass built as
    anti-join + union (cheaper than a true full outer: base rows whose
    key has an update are filtered by a broadcast-able key set when
    updates are increment-sized)."""
    base = read_version(spark, root, name)
    from pyspark.sql import functions as F

    upd = updates
    if delete_col is not None:
        deletes = upd.where(F.col(delete_col)).select(key)
        upd = upd.where(~F.col(delete_col)).drop(delete_col)
        base = base.join(deletes, key, "left_anti")
    survivors = base.join(upd.select(key), key, "left_anti")
    merged = survivors.unionByName(upd)
    return write_version(root, name, merged)


def diff_versions(
    spark: SparkSession,
    root: str,
    name: str,
    v_from: int,
    v_to: int,
    key: str,
) -> DataFrame:
    """Change feed between two snapshots: (key, change) with change ∈
    insert | delete | update — the CDC view a downstream consumer
    replays instead of re-reading the whole table. Row equality is an
    xxhash64 over all non-key columns (order-normalized), so the diff
    shuffles (key, 8-byte hash) pairs, never full rows."""
    from pyspark.sql import functions as F

    def keyed(version: int) -> DataFrame:
        df = read_version(spark, root, name, version)
        cols = sorted(c for c in df.columns if c != key)
        return df.select(
            F.col(key), F.xxhash64(*[F.col(c) for c in cols]).alias("__h")
        )

    a = keyed(v_from).withColumnRenamed("__h", "__h_from")
    b = keyed(v_to).withColumnRenamed("__h", "__h_to")
    j = a.join(b, key, "full_outer")
    return j.select(
        key,
        F.when(F.col("__h_from").isNull(), F.lit("insert"))
        .when(F.col("__h_to").isNull(), F.lit("delete"))
        .when(F.col("__h_from") != F.col("__h_to"), F.lit("update"))
        .alias("change"),
    ).where(F.col("change").isNotNull())


def vacuum(root: str, name: str, keep: int = 2) -> list[int]:
    """Delete versions beyond the newest ``keep``, never the one
    ``_LATEST`` points at; returns the deleted version ids."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    cur = current_version(root, name)
    versions = list_versions(root, name)
    victims = [v for v in versions[:-keep] if v != cur]
    for v in victims:
        shutil.rmtree(os.path.join(_table_dir(root, name), f"v={v}"))
    return victims
