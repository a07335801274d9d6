"""Parquet-backed table catalog mirroring fenix's directory layout
(reference: src/fenix/io/table/table.py:9-56):

    <root>/sources/<name>/        parquet table        (ref: .arrow file)
    <root>/codings/<name>/        centroid table       (ref: .torch pickle)
    <root>/indexes/<source>/<column>/<coding>/   indexed source
                                                 (ref: positional sidecar)

Differences forced by Spark's execution model (SURVEY.md §1.3): the
reference h-stacks a row-aligned sidecar column; Spark has no stable row
order, so an index here is the source CO-WRITTEN with its ``__CODED_ID__``
column, partitioned by that column — which turns IVF probe pruning into
physical partition pruning at any scale.
"""

from __future__ import annotations

import os
import re
import shutil
from collections.abc import Iterator, Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

# Table/coder/index names become filesystem path segments, and on the
# Flight wire they arrive from UNTRUSTED clients (descriptors, tickets,
# action bodies).  Validating here — the single chokepoint every path
# helper goes through — means no caller can be tricked into joining
# '../../x' or '/etc' under the store root (read, write via
# manifest.begin's makedirs, or rmtree via drop-table/remove).  One
# path segment only: no separators, no '..', must not start with '.'
# (dot-prefixed entries are reader-invisible by the manifest contract).
_NAME_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9_.-]*\Z")


def check_name(name: str) -> str:
    """Validate a catalog name used as a single path segment; returns
    the name so call sites can stay expressions. Raises ValueError on
    anything that could escape the store root."""
    if not isinstance(name, str) or not _NAME_RE.match(name) or ".." in name:
        raise ValueError(
            f"invalid catalog name {name!r}: must match [A-Za-z0-9][A-Za-z0-9_.-]* "
            "with no '..' (names are single path segments under the store root)"
        )
    return name


def _sources_dir(root: str) -> str:
    return os.path.join(root, "sources")


def source_path(root: str, name: str) -> str:
    return os.path.join(root, "sources", check_name(name))


def coding_path(root: str, name: str) -> str:
    return os.path.join(root, "codings", check_name(name))


def index_path(root: str, source: str, column: str, coding: str) -> str:
    return os.path.join(
        root, "indexes", check_name(source), check_name(column), check_name(coding)
    )


def make(root: str, name: str, df: DataFrame, partition_by: Sequence[str] = ()) -> None:
    """Create/replace a named table (ref: table.make, table.py:24-26)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(source_path(root, name))


def load(spark: SparkSession, root: str, name: str | Sequence[str]) -> DataFrame:
    """Load one table, or union-all a list of tables by column name
    (ref: table.load multi-source v-stack, table.py:12-21,29-35).
    Resolves through the manifest pointer when the table has been
    compacted (manifest.py) — flat tables read unchanged."""
    from fenix_spark.manifest import resolve

    if isinstance(name, str):
        return spark.read.parquet(resolve(source_path(root, name)))
    dfs = [spark.read.parquet(resolve(source_path(root, n))) for n in name]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=False), dfs)


def hstack(left: DataFrame, right: DataFrame, key: str, how: str = "inner") -> DataFrame:
    """Column concat by explicit KEY (ref: table.join axis=1,
    table.py:37-43). The reference zips columns positionally and lets
    duplicate names resolve LAST-WINS via a dict comprehension
    (table.py:39-40); Spark has no stable row order, so alignment is a
    key equi-join — and last-wins is replicated by dropping the left
    side's duplicated non-key columns before joining.

    NOTE the semantic difference from the reference: its positional
    h-stack preserves every row of equal-length tables, while the
    default ``how='inner'`` DROPS rows whose key is missing on either
    side. Pass ``how='full'`` (nulls for the missing side) to mirror
    the reference's length-preserving behavior on keyed data."""
    dups = [c for c in left.columns if c != key and c in right.columns]
    return left.drop(*dups).join(right, key, how)


def compact(
    spark: SparkSession,
    root: str,
    name: str,
    target_file_bytes: int = 128 << 20,
    sort_by: Sequence[str] = (),
    zorder_by: Sequence[str] = (),
) -> int:
    """Rewrite a table into ≈``target_file_bytes`` files — the
    maintenance pass that keeps streaming-ingested tables scannable.

    ``stream_ingest`` appends one file per micro-batch per partition;
    at 100 TB/day that is millions of footer reads per scan within a
    week. Compaction sizes the file count from the CURRENT on-disk
    bytes (so it adapts as the table grows) and optionally sorts rows
    within files (``sort_by``) so parquet min/max row-group stats
    become selective — the poor man's clustering that makes
    point-lookups skip whole files; ``zorder_by`` clusters SEVERAL
    columns at once via a Morton key (multi-dimensional pruning).

    Rewrite is a MANIFEST COMMIT (manifest.py), object-store-safe: the
    new files are written into a hidden generation directory (invisible
    to readers by construction — no staging rename), the ``_CURRENT``
    pointer is flipped with ONE atomic single-file write, and only then
    is the superseded data vacuumed. A crash at any step leaves readers
    on a complete generation: before the flip they see the old table,
    after it the new one; cleanup failures cost storage, never
    correctness. Crash-injection tests at every boundary:
    tests/test_manifest.py. Single writer per table (manifest.py
    contract): pause a streaming ingest while compacting its table.
    Returns the number of files written.
    """
    from fenix_spark import manifest

    path = source_path(root, name)
    if spark.catalog.tableExists(bucketed_table_name(name)):
        # a bucketed table's rows live at this same path but its
        # bucket metadata lives in the session catalog, which lists
        # the location NON-recursively — moving the files into a
        # hidden generation would silently empty spark.table() reads
        raise ValueError(
            f"table {name!r} is bucketed ({bucketed_table_name(name)}): "
            "compaction would strand its metastore listing. Rewrite it "
            "with make_bucketed (bucketing already fixes file count "
            "and co-location) instead of compact()."
        )
    src_dir = manifest.resolve(path)
    on_disk = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(src_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-on_disk // target_file_bytes))  # ceil
    df = spark.read.parquet(src_dir)
    if zorder_by:
        # multi-column clustering: range-partition + sort by the Morton
        # key so EVERY zorder_by column gets narrow per-file min/max
        # ranges (functions/zorder.py; proven in tests/test_zorder.py)
        from fenix_spark.functions.zorder import zorder_key

        if sort_by:
            raise ValueError("pass sort_by or zorder_by, not both")
        keyed = zorder_key(df, list(zorder_by))
        out = (
            keyed.repartitionByRange(n_files, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    elif sort_by:
        out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_files)
    gen, staging = manifest.begin(path)
    out.write.mode("overwrite").parquet(staging)
    manifest.commit(path, gen)
    manifest.vacuum(path)
    # a file-level bloom index cannot survive a rewrite of the file
    # set (its rows name the OLD files, which the vacuum just
    # removed): drop the sidecar so the next lookup fails loudly with
    # "rebuild me" instead of resolving stale paths mid-query
    bloom = os.path.join(path, "_bloom")
    if os.path.isdir(bloom):
        shutil.rmtree(bloom)
    return n_files


def bucketed_table_name(name: str) -> str:
    """Session-catalog identifier for a bucketed store table. Bucketing
    metadata (bucket count + columns) lives in the table catalog, not
    the parquet footers, so bucketed tables are addressed by name via
    ``spark.table`` rather than by path."""
    return f"fenix_bucketed_{name}"


def make_bucketed(
    spark: SparkSession,
    root: str,
    name: str,
    df: DataFrame,
    key: str | Sequence[str],
    buckets: int = 32,
) -> str:
    """Create/replace a named table BUCKETED (and sorted) by ``key`` —
    the Spark-native co-location primitive the reference cannot express
    (its tables are single .arrow files, table.py:24-26).

    Each of the ``buckets`` output files holds exactly the rows with
    ``hash(key) % buckets == i``, so a join or aggregation of two
    tables bucketed the same way needs NO shuffle at any scale: the
    scan itself is the partitioning. At 100 TB this turns the nightly
    "join facts to yesterday's facts" query from a 2×100 TB shuffle
    into a zip of pre-sorted files. Verified by plan contract in
    tests/test_catalog.py::test_bucketed_join_is_shuffle_free.

    Returns the session-catalog table name to pass to ``spark.table``
    / ``load_bucketed``. Choose ``buckets`` so one bucket of the
    LARGER table fits an executor's memory comfortably (bucket ≈
    table_bytes / buckets; e.g. 100 TB / 65536 ≈ 1.5 GB).
    """
    keys = [key] if isinstance(key, str) else list(key)
    table = bucketed_table_name(name)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    path = source_path(root, name)
    if os.path.isdir(path):
        shutil.rmtree(path)  # saveAsTable refuses to overwrite a dropped table's files
    (
        df.write.format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .option("path", path)
        .saveAsTable(table)
    )
    return table


def load_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Load a bucketed table WITH its bucket metadata (a plain
    ``spark.read.parquet`` of the same directory would read the rows
    but lose the co-location contract)."""
    return spark.table(bucketed_table_name(name))


def list_tables(root: str) -> Iterator[str]:
    """Enumerate table names (ref: table.list, table.py:46-49)."""
    base = _sources_dir(root)
    if not os.path.isdir(base):
        return
    for entry in sorted(os.listdir(base)):
        if os.path.isdir(os.path.join(base, entry)):
            yield entry


def drop(root: str, name: str) -> None:
    """Drop a table (ref: table.drop, table.py:52-56)."""
    path = source_path(root, name)
    if os.path.isdir(path):
        shutil.rmtree(path)


def remove(root: str) -> None:
    """Remove the whole store (ref: flight.py:102-103 'remove' action)."""
    if os.path.isdir(root):
        shutil.rmtree(root)


def bloom_index_path(root: str, name: str, column: str) -> str:
    return os.path.join(_sources_dir(root), name, "_bloom", column)


def make_bloom_index(
    spark: SparkSession,
    root: str,
    name: str,
    column: str,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> None:
    """Build and persist a file-level Bloom index
    (sources/file_bloom.py) for ``column`` of catalog table ``name``,
    WITH its geometry: (m_bits, k) ride in a ``_geometry.json``
    sidecar next to the index rows, so later lookups can never probe
    with mismatched parameters — the corruption mode the raw module
    documents as caller-owned becomes structurally impossible through
    the catalog."""
    import json

    from fenix_spark import manifest
    from fenix_spark.sources.file_bloom import build_file_bloom

    idx = build_file_bloom(
        spark, manifest.resolve(source_path(root, name)), column, m_bits, k
    )
    p = bloom_index_path(root, name, column)
    # manifest commit from the first build: the geometry sidecar is
    # written INTO the generation before the pointer flips, so a
    # half-built index is never resolvable
    gen, staging = manifest.begin(p)
    idx.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, "_geometry.json"), "w") as f:
        json.dump({"m_bits": m_bits, "k": k, "column": column}, f)
    manifest.commit(p, gen)
    manifest.vacuum(p)


def refresh_bloom_index(
    spark: SparkSession, root: str, name: str, column: str
) -> None:
    """Extend the persisted index to files appended since the build —
    indexes ONLY the delta (sources/file_bloom.append_file_bloom),
    using the stored geometry."""
    import json

    from fenix_spark import manifest
    from fenix_spark.sources.file_bloom import append_file_bloom

    p = bloom_index_path(root, name, column)
    live = manifest.resolve(p)
    with open(os.path.join(live, "_geometry.json")) as f:
        geo = json.load(f)
    idx = spark.read.parquet(live)
    new = append_file_bloom(
        spark,
        idx,
        manifest.resolve(source_path(root, name)),
        column,
        geo["m_bits"],
        geo["k"],
    )
    # the new index READS the old, so the write must not disturb it:
    # the new generation is written in place (hidden dir — no rename,
    # object-store-safe), geometry sidecar INSIDE it before the
    # single-file pointer flip. A crash at any step leaves the pointer
    # on a complete index WITH its geometry; vacuum afterwards only
    # garbage-collects (tests/test_manifest.py injects a crash at
    # every boundary).
    gen, staging = manifest.begin(p)
    new.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, "_geometry.json"), "w") as f:
        json.dump(geo, f)
    manifest.commit(p, gen)
    manifest.vacuum(p)


def bloom_point_lookup(
    spark: SparkSession, root: str, name: str, column: str, values: Sequence
) -> DataFrame:
    """Point lookup through the persisted index with the persisted
    geometry — reads only candidate files, results identical to a
    full-scan filter."""
    import json

    from fenix_spark import manifest
    from fenix_spark.sources.file_bloom import point_lookup

    p = bloom_index_path(root, name, column)
    live = manifest.resolve(p)
    with open(os.path.join(live, "_geometry.json")) as f:
        geo = json.load(f)
    if geo["column"] != column:
        raise ValueError(
            f"index at {p} was built for column {geo['column']!r}, not {column!r}"
        )
    idx = spark.read.parquet(live)
    return point_lookup(
        spark,
        manifest.resolve(source_path(root, name)),
        column,
        values,
        idx,
        geo["m_bits"],
        geo["k"],
    )
