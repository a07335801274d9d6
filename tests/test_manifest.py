"""Manifest commits (manifest.py) and the maintenance ops built on
them (catalog.compact, refresh_bloom_index, stream_ingest resolution):
a crash is INJECTED at every protocol boundary and the invariant
checked each time — readers always resolve one complete generation
(old before the pointer flip, new after), retries succeed, and cleanup
failures cost storage only."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fenix_spark import catalog, manifest


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "store")


def _mk(spark, root, name="t", n=1000, files=8):
    df = spark.range(n).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    df.repartition(files).write.mode("overwrite").parquet(
        catalog.source_path(root, name)
    )
    return n


def _ids(spark, root, name="t"):
    return sorted(r.k for r in catalog.load(spark, root, name).select("k").collect())


def test_flat_table_reads_unchanged(spark, root):
    n = _mk(spark, root)
    path = catalog.source_path(root, "t")
    assert manifest.current_gen(path) is None
    assert manifest.resolve(path) == path
    assert _ids(spark, root) == list(range(n))


def test_compact_commits_manifest_and_vacuums_flat(spark, root):
    n = _mk(spark, root, files=16)
    path = catalog.source_path(root, "t")
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    assert manifest.current_gen(path) == 1
    live = manifest.resolve(path)
    assert os.path.basename(live).startswith("_gen-")
    assert _ids(spark, root) == list(range(n))
    # RETENTION WINDOW: the flat part files this commit superseded stay
    # one more commit (a reader that resolved them just before the flip
    # may still be mid-scan); repo readers already resolve through the
    # manifest and see only the generation
    assert [f for f in os.listdir(path) if f.endswith(".parquet")]
    # second compact bumps the generation; ITS vacuum expires the flat
    # files (now two commits stale) and retains generation 1
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    assert manifest.current_gen(path) == 2
    assert manifest.list_gens(path) == [1, 2]
    assert not [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert _ids(spark, root) == list(range(n))
    # third compact expires generation 1
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    assert manifest.list_gens(path) == [2, 3]
    assert _ids(spark, root) == list(range(n))


def test_crash_before_commit_preserves_old_table(spark, root, monkeypatch):
    """Boundary 1+2: die during/after the staging write but BEFORE the
    pointer flip — readers keep the old table; a retry succeeds and
    sweeps the orphan generation."""
    n = _mk(spark, root)
    path = catalog.source_path(root, "t")
    before = _ids(spark, root)

    def boom(p, g):
        raise OSError("injected crash before commit")

    monkeypatch.setattr(manifest, "commit", boom)
    with pytest.raises(OSError, match="injected"):
        catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    # old data fully readable; orphan generation invisible
    assert manifest.current_gen(path) is None
    assert _ids(spark, root) == before
    assert manifest.list_gens(path) == [1]  # orphan on disk, uncommitted

    monkeypatch.undo()
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    # retry never reuses the orphan id and the vacuum swept it
    assert manifest.current_gen(path) == 2
    assert manifest.list_gens(path) == [2]
    assert _ids(spark, root) == before
    assert len(before) == n


def test_crash_after_commit_before_vacuum_serves_new_table(spark, root, monkeypatch):
    """Boundary 3: die AFTER the pointer flip but before cleanup —
    readers already see the new table; leftover garbage is swept by
    any later vacuum."""
    _mk(spark, root)
    path = catalog.source_path(root, "t")
    before = _ids(spark, root)

    def boom(p):
        raise OSError("injected crash before vacuum")

    monkeypatch.setattr(manifest, "vacuum", boom)
    with pytest.raises(OSError, match="injected"):
        catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    assert manifest.current_gen(path) == 1
    assert _ids(spark, root) == before  # new generation, same rows
    # superseded flat files still on disk (cleanup never ran) ...
    assert [f for f in os.listdir(path) if f.endswith(".parquet")]
    monkeypatch.undo()
    # ... vacuum alone completes cleanup — but the flat files are the
    # layout THIS commit superseded, so the retention window keeps them
    # until the following commit expires them
    manifest.vacuum(path)
    assert [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert manifest.list_gens(path) == [1]
    assert _ids(spark, root) == before
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    assert not [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert manifest.list_gens(path) == [1, 2]
    assert _ids(spark, root) == before


def test_make_after_compact_resets_to_flat_layout(spark, root):
    """catalog.make (full overwrite) on a manifest-managed table wipes
    the pointer with the rest of the directory — the table returns to
    flat layout and reads correctly through load either way."""
    _mk(spark, root, n=100, files=2)
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    assert manifest.current_gen(catalog.source_path(root, "t")) == 1
    df2 = spark.range(7).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    catalog.make(root, "t", df2)
    path = catalog.source_path(root, "t")
    assert manifest.current_gen(path) is None  # pointer gone with the dir
    assert _ids(spark, root) == list(range(7))
    # and the flat table can be compacted again from scratch
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    assert manifest.current_gen(path) == 1
    assert _ids(spark, root) == list(range(7))


def test_package_aliases_run_the_full_protocol(tmp_path):
    """The package-level names (manifest_begin/commit/resolve/vacuum —
    aliased to avoid colliding with versions.vacuum) drive one full
    begin→write→commit→vacuum cycle, including the retention window:
    the generation a commit superseded survives until the FOLLOWING
    commit's vacuum."""
    import fenix_spark as fx

    path = str(tmp_path / "t")
    gen, d = fx.manifest_begin(path)
    os.makedirs(d)
    open(os.path.join(d, "data.parquet"), "wb").write(b"x")
    fx.manifest_commit(path, gen)
    assert fx.manifest_resolve(path) == d
    gen2, d2 = fx.manifest_begin(path)
    os.makedirs(d2)
    open(os.path.join(d2, "data.parquet"), "wb").write(b"y")
    fx.manifest_commit(path, gen2)
    # gen1 is what THIS commit superseded — retained for in-flight reads
    assert fx.manifest_vacuum(path) == []
    assert os.path.isdir(d)
    assert fx.manifest_resolve(path) == d2
    gen3, d3 = fx.manifest_begin(path)
    os.makedirs(d3)
    open(os.path.join(d3, "data.parquet"), "wb").write(b"z")
    fx.manifest_commit(path, gen3)
    # the following commit's vacuum expires gen1, retains gen2
    assert fx.manifest_vacuum(path) == [os.path.basename(d)]
    assert os.path.isdir(d2)
    assert fx.manifest_resolve(path) == d3


def test_begin_never_reuses_orphans_and_commit_is_guarded(tmp_path):
    path = str(tmp_path / "d")
    gen1, d1 = manifest.begin(path)
    assert gen1 == 1
    os.makedirs(d1)  # crashed writer left a partial generation
    gen2, d2 = manifest.begin(path)
    assert gen2 == 2 and d2 != d1
    # committing a generation that was never written is loud
    with pytest.raises(FileNotFoundError, match="not written"):
        manifest.commit(path, 9)
    # pointer to a missing generation (external damage) is loud too
    os.makedirs(d2)
    manifest.commit(path, 2)
    import shutil

    shutil.rmtree(d2)
    with pytest.raises(FileNotFoundError, match="missing"):
        manifest.resolve(path)


def test_bloom_refresh_crash_injection(spark, root, monkeypatch):
    """The bloom index refresh on the manifest protocol: a crash
    before the flip keeps the OLD index (lookups still correct for the
    old files); after the flip the NEW index serves; geometry is
    inside whichever generation the pointer names."""
    _mk(spark, root, n=4000, files=4)
    catalog.make_bloom_index(spark, root, "t", "k", m_bits=1 << 15)
    p = catalog.bloom_index_path(root, "t", "k")
    assert manifest.current_gen(p) == 1  # even the first build commits

    # append new rows through the catalog layout, then refresh w/crash
    spark.range(10_000, 10_050).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).coalesce(1).write.mode("append").parquet(catalog.source_path(root, "t"))

    real_commit = manifest.commit

    def boom(pp, g):
        raise OSError("injected crash before index commit")

    monkeypatch.setattr(manifest, "commit", boom)
    with pytest.raises(OSError, match="injected"):
        catalog.refresh_bloom_index(spark, root, "t", "k")
    # old index + geometry still resolvable and correct for old keys
    assert manifest.current_gen(p) == 1
    got = sorted(
        r.k for r in catalog.bloom_point_lookup(spark, root, "t", "k", [5]).collect()
    )
    assert got == [5]

    monkeypatch.setattr(manifest, "commit", real_commit)
    catalog.refresh_bloom_index(spark, root, "t", "k")
    assert manifest.current_gen(p) == 3  # gen 2 was the orphan
    # orphan 2 swept immediately (never committed); gen 1 is the
    # superseded COMMITTED index, retained one more commit
    assert manifest.list_gens(p) == [1, 3]
    got = sorted(
        r.k
        for r in catalog.bloom_point_lookup(
            spark, root, "t", "k", [5, 10_025]
        ).collect()
    )
    assert got == [5, 10_025]


def test_stream_ingest_refuses_compacted_table_and_delta_pattern_works(
    spark, root, tmp_path
):
    """The parquet file-sink's _spark_metadata log cannot adopt a
    compacted generation (batch readers of a sink-owned dir trust only
    the log), so stream_ingest REFUSES a manifest-managed table loudly
    — and the documented base+delta pattern covers continued ingest:
    sink into a sibling table, union through the multi-table load."""
    from fenix_spark.streaming import stream_ingest, stream_source

    n = _mk(spark, root, n=200, files=2)
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)

    src_dir = str(tmp_path / "incoming")
    newdf = spark.range(10_000, 10_020).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    newdf.coalesce(1).write.mode("overwrite").parquet(src_dir)
    src = stream_source(spark, src_dir, newdf.schema)

    with pytest.raises(ValueError, match="compacted"):
        stream_ingest(src, root, "t", str(tmp_path / "_ck"), available_now=True)

    # base + delta: ingest lands in a sibling table, the union reads
    q = stream_ingest(src, root, "t_delta", str(tmp_path / "_ck2"), available_now=True)
    q.awaitTermination(120)
    both = catalog.load(spark, root, ["t", "t_delta"])
    got = sorted(r.k for r in both.select("k").collect())
    assert got == list(range(n)) + list(range(10_000, 10_020))


def test_vacuum_sweeps_stale_sink_log(spark, root, tmp_path):
    """Compacting a previously stream-ingested table: the compact reads
    the sink's exactly-once view; the superseded _spark_metadata log is
    swept WITH the flat layout it describes when the retention window
    expires it (the following commit), so during the window the flat
    path stays self-consistent for a log-trusting reader and after it
    nothing misleading remains."""
    from fenix_spark.streaming import stream_ingest, stream_source

    src_dir = str(tmp_path / "incoming")
    df = spark.range(300).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    df.repartition(3).write.mode("overwrite").parquet(src_dir)
    src = stream_source(spark, src_dir, df.schema)
    q = stream_ingest(src, root, "s", str(tmp_path / "_ck"), available_now=True)
    q.awaitTermination(120)
    path = catalog.source_path(root, "s")
    assert os.path.isdir(os.path.join(path, "_spark_metadata"))

    catalog.compact(spark, root, "s", target_file_bytes=1 << 30)
    # retention window: log + flat files survive the commit that
    # superseded them (still a complete, consistent sink directory)
    assert os.path.isdir(os.path.join(path, "_spark_metadata"))
    assert _ids(spark, root, "s") == list(range(300))
    catalog.compact(spark, root, "s", target_file_bytes=1 << 30)
    assert not os.path.exists(os.path.join(path, "_spark_metadata"))
    assert _ids(spark, root, "s") == list(range(300))


def test_compact_refuses_bucketed_tables(spark, root):
    """Bucketed rows live at the same path but the metastore lists the
    location non-recursively — compaction would silently empty
    spark.table() reads, so it refuses loudly."""
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") % 5).alias("v"))
    catalog.make_bucketed(spark, root, "bt", df, "k", buckets=4)
    with pytest.raises(ValueError, match="bucketed"):
        catalog.compact(spark, root, "bt", target_file_bytes=1 << 30)
    assert catalog.load_bucketed(spark, "bt").count() == 100


def test_compact_invalidates_stale_bloom_sidecar(spark, root):
    """A file-level bloom index names the pre-compact files; after the
    rewrite the sidecar is dropped so the next lookup fails loudly
    with 'rebuild me' instead of resolving vacuumed paths mid-query."""
    _mk(spark, root, n=500, files=4)
    catalog.make_bloom_index(spark, root, "t", "k", m_bits=1 << 14)
    got = sorted(
        r.k for r in catalog.bloom_point_lookup(spark, root, "t", "k", [5]).collect()
    )
    assert got == [5]
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    with pytest.raises(FileNotFoundError):
        catalog.bloom_point_lookup(spark, root, "t", "k", [5])
    # rebuild works against the committed generation
    catalog.make_bloom_index(spark, root, "t", "k", m_bits=1 << 14)
    got = sorted(
        r.k for r in catalog.bloom_point_lookup(spark, root, "t", "k", [5]).collect()
    )
    assert got == [5]


def test_reader_resolved_before_commit_survives_the_committers_vacuum(spark, root):
    """The retention window's reason to exist (ADVICE r10): a reader
    that resolved generation N just before a maintenance commit flips
    the pointer to N+1 is still mid-scan when the committer vacuums —
    its files must survive until the FOLLOWING commit."""
    n = _mk(spark, root, n=500, files=4)
    path = catalog.source_path(root, "t")
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)  # gen 1
    live1 = manifest.resolve(path)
    reader = spark.read.parquet(live1)  # lazy: resolved, not yet scanned
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)  # gen 2 + vacuum
    # the overlapping reader completes against the retained generation
    assert reader.count() == n
    assert sorted(r.k for r in reader.collect()) == list(range(n))
    # ... and the FOLLOWING commit expires it
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)  # gen 3
    assert not os.path.isdir(live1)
    assert _ids(spark, root) == list(range(n))
