"""Migrate a reference-engine store into this engine's parquet
catalog — the switching path for an existing user: their data lives
as Arrow IPC files in the reference layout
(ref: src/fenix/io/table/table.py:9, io/index/index.py:16,23)

    <ref_root>/sources/<name>.arrow
    <ref_root>/codings/<name>.torch          (torch pickle — see below)
    <ref_root>/indexes/<source>/<column>/<coding>.arrow

and becomes the catalog layout (catalog.py) under ``out_root``.

Mechanics per artifact class:

- **sources**: read through the ``arrowipc`` DataSource (per-file
  partition parallelism, Arrow-batch fast path) and written with
  ``catalog.make`` — a plain distributed read→write.
- **indexes**: the reference sidecar is ROW-POSITION aligned with its
  source (one ``__CODED_ID__`` column, no key). Spark has no stable
  row order, so the positional zip happens at migration time with a
  STREAMING pyarrow pass (batch-by-batch zip of the two IPC streams,
  parquet written incrementally — nothing fully materialized); the
  result is the co-written keyed layout this engine uses, partitioned
  by code so probe pruning is physical from the first query.
  This pass runs on the driver: single-file streaming IO, bounded by
  the reference's own one-file-per-table model (a store the reference
  could serve fits through a one-time streamed copy).
- **codings**: the reference persists codings as torch pickles
  (ref: io/coder/coder.py:125). These now import DIRECTLY — no torch
  and no retrain: ``sources.torchpickle`` reads torch's zip
  serialization with a restricted allowlist unpickler and rebuilds
  the (num_codebooks, codebook_size, sub_dim) tensor as numpy, and
  the centroids land as this engine's coding table under
  ``codings/<name>``. Unreadable variants (legacy tar format,
  foreign globals) raise with the fallback spelled out: pass
  ``skip_codings=True`` to migrate everything else and retrain with
  ``coder.train_coding`` over the migrated source.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession

from fenix_spark import catalog

CODE_COL = "__CODED_ID__"


def _strip(name: str, suffix: str) -> str:
    return name[: -len(suffix)] if name.endswith(suffix) else name


def migrate_reference_store(
    spark: SparkSession,
    ref_root: str,
    out_root: str,
    skip_codings: bool = False,
    key_col: str | None = None,
    max_zip_bytes: int = 8 << 30,
) -> dict:
    """Run the migration; returns a manifest dict
    ``{"sources": [...], "indexes": [...], "codings_skipped": [...]}``.
    Idempotent: re-running overwrites the same outputs.

    Index sidecars are positional, so zipping them with their source is
    inherently ordered work. Two paths:

    - default: the driver-side streaming zip (bounded memory, but
      single-threaded and proportional to source+sidecar BYTES). Gated
      at ``max_zip_bytes``: a store above the gate raises loudly
      instead of silently running a multi-hour driver job.
    - ``key_col``: the DISTRIBUTED path for sources that carry a
      unique key column. The driver streams only the THIN columns
      (source key + sidecar code — mmap'd, payload buffers untouched)
      into a (key → code) map; the wide payload then migrates as a
      distributed keyed equi-join, and the byte gate does not apply.
    """
    from fenix_spark.sources.arrowipc_source import register

    register(spark)
    manifest: dict = {"sources": [], "indexes": [], "codings": [], "codings_skipped": []}

    codings_dir = os.path.join(ref_root, "codings")
    codings = (
        sorted(os.listdir(codings_dir)) if os.path.isdir(codings_dir) else []
    )
    if skip_codings:
        manifest["codings_skipped"] = [f for f in codings if f.endswith(".torch")]
    else:
        from fenix_spark.sources.torchpickle import import_reference_coding

        for f in codings:
            if not f.endswith(".torch"):
                continue
            name = _strip(f, ".torch")
            import pickle as _pkl

            try:
                import_reference_coding(
                    spark,
                    os.path.join(codings_dir, f),
                    catalog.coding_path(out_root, name),
                )
            except (NotImplementedError, _pkl.UnpicklingError, ValueError) as e:
                raise NotImplementedError(
                    f"reference coding {f} could not be imported torch-free "
                    f"({e}). Re-run with skip_codings=True, then retrain "
                    "with coder.train_coding over the migrated source "
                    "(fixed seeds) — the supported fallback."
                ) from e
            manifest["codings"].append(name)

    src_dir = os.path.join(ref_root, "sources")
    for f in sorted(os.listdir(src_dir)) if os.path.isdir(src_dir) else []:
        if not f.endswith(".arrow"):
            continue
        name = _strip(f, ".arrow")
        df = spark.read.format("arrowipc").load(os.path.join(src_dir, f))
        catalog.make(out_root, name, df)
        manifest["sources"].append(name)

    idx_root = os.path.join(ref_root, "indexes")
    if os.path.isdir(idx_root):
        for source in sorted(os.listdir(idx_root)):
            for column in sorted(os.listdir(os.path.join(idx_root, source))):
                cdir = os.path.join(idx_root, source, column)
                for f in sorted(os.listdir(cdir)):
                    if not f.endswith(".arrow"):
                        continue
                    coding = _strip(f, ".arrow")
                    out = catalog.index_path(out_root, source, column, coding)
                    src_path = os.path.join(src_dir, f"{source}.arrow")
                    side_path = os.path.join(cdir, f)
                    if key_col is not None:
                        _zip_index_keyed(spark, src_path, side_path, out, key_col)
                    else:
                        total = os.path.getsize(src_path) + os.path.getsize(side_path)
                        if total > max_zip_bytes:
                            raise ValueError(
                                f"index {source}/{column}/{coding} is "
                                f"{total:,} bytes — above the "
                                f"max_zip_bytes gate ({max_zip_bytes:,}). "
                                "The positional zip is a single-threaded "
                                "driver-side stream; at this size pass "
                                "key_col=<unique source key> for the "
                                "distributed keyed migration, or raise "
                                "max_zip_bytes if a long driver job is "
                                "acceptable."
                            )
                        _zip_index(src_path, side_path, out)
                    manifest["indexes"].append(f"{source}/{column}/{coding}")
                    logging.getLogger(__name__).info(
                        "migrated index %s/%s/%s", source, column, coding
                    )
    return manifest


def _zip_index_keyed(
    spark: SparkSession,
    source_path: str,
    sidecar_path: str,
    out_dir: str,
    key_col: str,
) -> None:
    """Distributed keyed zip: the driver streams ONLY (key, code) —
    two thin columns, payload buffers never touched — into a keymap;
    the wide source then joins it distributed on the key. Raises on
    row-count drift (same contract as the positional zip) and on a
    non-unique key (a dup key would silently fan rows out)."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as papq

    from pyspark.sql import functions as F

    from fenix_spark.sources.arrowipc_source import (
        _normalize_batch,
        _normalize_schema,
        _open_ipc,
    )

    src = _open_ipc(source_path)
    side = _open_ipc(sidecar_path)
    src_fields = list(_normalize_schema(src.schema))
    side_fields = list(_normalize_schema(side.schema))
    if key_col not in {f.name for f in src_fields}:
        raise ValueError(
            f"key_col {key_col!r} not in source columns "
            f"({[f.name for f in src_fields]})"
        )
    clash = {f.name for f in src_fields} & {f.name for f in side_fields}
    if clash:
        raise ValueError(
            f"index sidecar column(s) {sorted(clash)} collide with source "
            f"columns ({source_path}); rename in the sidecar before migrating"
        )

    key_field = next(f for f in src_fields if f.name == key_col)
    map_schema = pa.schema([key_field] + side_fields)
    tmp = tempfile.mkdtemp(prefix="fenix_keymap_")
    try:
        keymap_path = os.path.join(tmp, "keymap.parquet")
        n_rows = 0
        with papq.ParquetWriter(keymap_path, map_schema) as w:

            def thin(reader, cols):
                for b in _iter_batches(reader):
                    nb = _normalize_batch(b)
                    yield nb.select(cols)

            s_iter = _rechunk(thin(src, [key_col]))
            c_iter = _rechunk(thin(side, [f.name for f in side_fields]))
            while True:
                sb = next(s_iter, None)
                cb = next(c_iter, None)
                if sb is None and cb is None:
                    break
                if sb is None or cb is None or sb.num_rows != cb.num_rows:
                    raise ValueError(
                        "index sidecar misaligned with source "
                        f"({source_path} vs {sidecar_path}): row counts differ"
                    )
                w.write_batch(
                    pa.RecordBatch.from_arrays(
                        list(sb.columns) + list(cb.columns), schema=map_schema
                    )
                )
                n_rows += sb.num_rows

        # Stage the keymap on the SAME filesystem as out_dir (Hadoop FS
        # copy) before Spark reads it: executors on a real cluster
        # cannot see the driver's local tempdir (r6 review finding —
        # the "distributed" path must not require a shared local FS).
        from fenix_spark.streaming.fsutil import _fs

        staged_dir = out_dir.rstrip("/") + "__keymap_tmp"
        fs, staged_p = _fs(spark, staged_dir + "/keymap.parquet")
        jvm = spark._jvm
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(staged_dir))
        fs.copyFromLocalFile(
            False,
            True,
            jvm.org.apache.hadoop.fs.Path("file://" + os.path.abspath(keymap_path)),
            staged_p,
        )
        src_df = spark.read.format("arrowipc").load(source_path)
        keymap = spark.read.parquet(staged_dir)
        n_distinct = keymap.select(key_col).distinct().count()
        if n_distinct != n_rows:
            raise ValueError(
                f"key_col {key_col!r} is not unique in {source_path} "
                f"({n_rows:,} rows, {n_distinct:,} distinct) — a keyed "
                "migration would fan rows out; use the positional zip"
            )
        joined = src_df.join(F.broadcast(keymap) if n_rows < 2_000_000 else keymap, key_col)
        joined.write.mode("overwrite").partitionBy(CODE_COL).parquet(out_dir)
        # the join must be lossless: every source row got exactly one code
        n_out = spark.read.parquet(out_dir).count()
        if n_out != n_rows:
            shutil.rmtree(out_dir, ignore_errors=True)
            raise ValueError(
                f"keyed migration dropped rows ({n_rows:,} source, "
                f"{n_out:,} joined) — source keys missing from the "
                f"keymap stream; the store at {source_path} is "
                "internally inconsistent"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        try:
            from fenix_spark.streaming.fsutil import delete_path

            delete_path(spark, out_dir.rstrip("/") + "__keymap_tmp")
        except Exception:  # noqa: BLE001 - best-effort cleanup
            pass


def _iter_batches(reader):
    """RecordBatch iteration over either IPC framing (file readers
    expose get_batch(i); stream readers iterate)."""
    import pyarrow as pa

    if isinstance(reader, pa.ipc.RecordBatchFileReader):
        for i in range(reader.num_record_batches):
            yield reader.get_batch(i)
    else:
        yield from reader


def _rechunk(gen, size: int = 65536):
    """Re-batch a RecordBatch stream to fixed-size chunks so a zip of
    two streams never needs to align mismatched batch boundaries."""
    import pyarrow as pa

    buf: list = []
    n = 0
    for b in gen:
        buf.append(b)
        n += b.num_rows
        while n >= size:
            t = pa.Table.from_batches(buf)
            head = t.slice(0, size)
            rest = t.slice(size)
            yield head.combine_chunks().to_batches()[0]
            buf = rest.combine_chunks().to_batches() if rest.num_rows else []
            n = rest.num_rows
    if n:
        yield pa.Table.from_batches(buf).combine_chunks().to_batches()[0]


def _zip_index(source_path: str, sidecar_path: str, out_dir: str) -> None:
    """Streaming positional zip of source + sidecar IPC files into a
    code-partitioned parquet index dir; raises on row-count drift
    (a misaligned sidecar must fail loudly, not shear rows)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from fenix_spark.sources.arrowipc_source import _normalize_batch, _open_ipc

    src = _open_ipc(source_path)
    side = _open_ipc(sidecar_path)

    def rows(reader):
        # re-batch to a common chunk size so the zip never needs to
        # align mismatched batch boundaries
        for b in _iter_batches(reader):
            yield _normalize_batch(b)

    rechunk = _rechunk

    from fenix_spark.sources.arrowipc_source import _normalize_schema

    src_fields = list(_normalize_schema(src.schema))
    side_fields = list(_normalize_schema(side.schema))
    clash = {f.name for f in src_fields} & {f.name for f in side_fields}
    if clash:
        # pyarrow tolerates duplicate field names; a parquet table with
        # them is a downstream landmine — refuse loudly instead
        raise ValueError(
            f"index sidecar column(s) {sorted(clash)} collide with source "
            f"columns ({source_path}); rename in the sidecar before migrating"
        )
    out_schema = pa.schema(src_fields + side_fields)

    def zipped():
        # rechunk emits equal-size chunks while both streams have
        # data, so any count drift surfaces as one side ending early
        # or an unequal final chunk — raise loudly, never shear rows
        s_iter, c_iter = rechunk(rows(src)), rechunk(rows(side))
        while True:
            sb = next(s_iter, None)
            cb = next(c_iter, None)
            if sb is None and cb is None:
                return
            if sb is None or cb is None or sb.num_rows != cb.num_rows:
                raise ValueError(
                    "index sidecar misaligned with source "
                    f"({source_path} vs {sidecar_path}): row counts differ"
                )
            cols = list(sb.columns) + list(cb.columns)
            yield pa.RecordBatch.from_arrays(cols, schema=out_schema)

    # batches stream straight into the dataset writer — nothing is
    # fully materialized; a mid-stream error leaves no _SUCCESS marker
    pads.write_dataset(
        zipped(),
        out_dir,
        schema=out_schema,
        format="parquet",
        partitioning=pads.partitioning(
            pa.schema([pa.field(CODE_COL, pa.int64())]), flavor="hive"
        ),
        existing_data_behavior="delete_matching",
    )
    # completeness marker matching the catalog's _SUCCESS convention
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass
