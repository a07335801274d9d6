"""A Spark Python DataSource for Arrow IPC files — the reference
engine's native table format (one ``<name>.arrow`` IPC stream per
table, ref: src/fenix/io/arrow/arrow.py:6-21), so an existing
reference store can be read by this engine directly:

    from fenix_spark.sources.arrowipc_source import register
    register(spark)
    df = spark.read.format("arrowipc").load("/store/sources/embeddings.arrow")

Shape:

- ONE input partition PER FILE. The reference's stream-format files
  must be read sequentially (no batch index), so intra-file splits
  are impossible by format; the reference's own one-file-per-table
  layout makes per-file parallelism the natural unit. Both IPC
  framings are accepted (stream first, file/Feather-V2 fallback).
- ``read`` yields PyArrow RecordBatches straight through (the
  DataSource API's Arrow fast path — no per-row Python), after
  normalizing types Spark's Arrow bridge doesn't ingest:
  extension types → their storage arrays (the reference's Tensor /
  QUInt8 extensions arrive as their underlying storage — use
  ``functions/tensors.py`` to interpret quantized payloads),
  fixed-size lists → variable lists, dictionary → decoded values.
- File discovery goes through the Hadoop FileSystem API when a
  session is active (same contract as the webdataset source); byte
  access uses pyarrow's local readers, so remote stores need a
  mounted/fuse path on the executor — stated, not discovered.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _close(reader) -> None:
    # RecordBatchFileReader exposes no close(); the stream reader does
    close = getattr(reader, "close", None)
    if close is not None:
        close()


def _open_ipc(path: str):
    import pyarrow as pa

    source = pa.memory_map(path)
    try:
        return pa.ipc.open_stream(source)
    except pa.ArrowInvalid:
        source.seek(0)
        return pa.ipc.open_file(source)


def _signed_for_unsigned(t):
    """Spark's Arrow bridge has no unsigned ints: widen to the signed
    type that holds the full range (uint8 → int16 — the same
    array<smallint> convention functions/tensors.py uses for quantized
    payloads — uint16 → int32, uint32 → int64). uint64 is rejected
    loudly rather than silently wrapped."""
    import pyarrow as pa

    if pa.types.is_uint8(t):
        return pa.int16()
    if pa.types.is_uint16(t):
        return pa.int32()
    if pa.types.is_uint32(t):
        return pa.int64()
    if pa.types.is_uint64(t):
        raise ValueError(
            "arrowipc: uint64 column cannot be represented losslessly "
            "in Spark; cast it before export"
        )
    return None


def _normalize_type(t):
    """The Spark-ingestible type for an Arrow type (extension →
    storage, fixed_size_list → list, dictionary → values, unsigned →
    wider signed), applied recursively through list values."""
    import pyarrow as pa

    if isinstance(t, pa.BaseExtensionType):
        t = t.storage_type
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_fixed_size_list(t) or pa.types.is_list(t):
        return pa.list_(_normalize_type(t.value_type))
    if pa.types.is_struct(t):
        # NestedTensor storage is struct<fixed_size_list | struct …>:
        # normalize recursively so the fsl-inside-struct becomes the
        # variable lists Spark's Arrow bridge ingests
        return pa.struct(
            [
                pa.field(f.name, _normalize_type(f.type), f.nullable)
                for f in t
            ]
        )
    signed = _signed_for_unsigned(t)
    return signed if signed is not None else t


def _normalize_batch(batch):
    import pyarrow as pa

    cols, fields = [], []
    for i, field in enumerate(batch.schema):
        arr = batch.column(i)
        if isinstance(field.type, pa.BaseExtensionType):
            arr = arr.storage
        if pa.types.is_dictionary(arr.type):
            arr = arr.dictionary_decode()
        want = _normalize_type(field.type)
        if arr.type != want:
            arr = arr.cast(want)
        cols.append(arr)
        fields.append(pa.field(field.name, want, field.nullable))
    return pa.RecordBatch.from_arrays(cols, schema=pa.schema(fields))


def _normalize_schema(schema):
    import pyarrow as pa

    return pa.schema(
        [
            pa.field(field.name, _normalize_type(field.type), field.nullable)
            for field in schema
        ]
    )


class ArrowIPCDataSource(DataSource):
    """format("arrowipc"): options — ``path`` (a ``.arrow`` file or a
    directory of them), ``suffix`` (default ``.arrow``)."""

    @classmethod
    def name(cls) -> str:
        return "arrowipc"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        files = _list_files(
            self.options.get("path"), self.options.get("suffix", ".arrow")
        )
        if not files:
            raise FileNotFoundError(
                f"no arrow IPC files under {self.options.get('path')!r}"
            )
        reader = _open_ipc(files[0])
        try:
            return from_arrow_schema(_normalize_schema(reader.schema))
        finally:
            _close(reader)

    def reader(self, schema) -> "ArrowIPCReader":
        return ArrowIPCReader(self.options, schema)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _list_files(path: str | None, suffix: str) -> list[str]:
    if not path:
        raise ValueError("arrowipc source requires a path")
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    except Exception:  # noqa: BLE001 - no pyspark context
        spark = None
    if spark is not None:
        from fenix_spark.streaming.fsutil import _fs

        fs, p = _fs(spark, path)
        if fs.exists(p) and fs.getFileStatus(p).isFile():
            return [path]
        if fs.exists(p):
            root = path.rstrip("/")
            return sorted(
                f"{root}/{st.getPath().getName()}"
                for st in fs.listStatus(p)
                if st.getPath().getName().endswith(suffix)
            )
        return []
    if os.path.isfile(path):
        return [path]
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(suffix)
    )


class ArrowIPCReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        self.suffix = options.get("suffix", ".arrow")
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        files = _list_files(self.path, self.suffix)
        if not files:
            raise FileNotFoundError(
                f"no {self.suffix} files under {self.path}"
            )
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        import pyarrow as pa

        reader = _open_ipc(partition.path)
        try:
            if isinstance(reader, pa.ipc.RecordBatchFileReader):
                batches = (
                    reader.get_batch(i) for i in range(reader.num_record_batches)
                )
            else:
                batches = reader
            for batch in batches:
                norm = _normalize_batch(batch)
                # honor a user-supplied narrower read schema
                if self.fields != norm.schema.names:
                    norm = norm.select(self.fields)
                yield norm
        finally:
            _close(reader)


def register(spark) -> None:
    """Idempotent registration of the ``arrowipc`` format."""
    spark.dataSource.register(ArrowIPCDataSource)


# ------------------------------------------------------------------
# Reference Arrow extension-type fidelity (ref: src/fenix/ex/arrow/
# tensor/tensor.py:10-29, quint8/quint8.py:56-87). Spark columns can't
# BE extension arrays, so the mapping is:
#
#   TensorType(dtype, shape)            <-> array<T> + tensor_shape
#                                           column metadata
#   QUInt8TensorType(shape,scale,shift) <-> array<smallint> + quant +
#                                           tensor_shape metadata
#   NestedTensorType(struct, shapetree) <-> struct<...array<T>...> +
#                                           nested_tensor_shape (JSON
#                                           shape tree) metadata
#                                           (ref ex/arrow/nested/
#                                           nested.py:18-31)
#
# On EXPORT, columns carrying that metadata are re-wrapped into the
# reference's exact wire form: fixed_size_list storage + the standard
# Arrow extension field-metadata keys (ARROW:extension:name /
# ARROW:extension:metadata with the msgpack payloads the reference's
# __arrow_ext_serialize__ emits) — a reference process with the types
# registered reconstructs TensorType/QUInt8TensorType natively, and
# any Arrow reader still sees valid storage. On INGEST, the same
# annotations (from a registered ExtensionType instance or the raw
# field-metadata keys) map back to column metadata instead of being
# normalized away.

_EXT_NAME = b"ARROW:extension:name"
_EXT_META = b"ARROW:extension:metadata"


def _extension_annotation(field):
    """(name, payload) for a field that is a registered ExtensionType
    or carries the standard extension field-metadata keys; else None."""
    import pyarrow as pa

    t = field.type
    if isinstance(t, pa.BaseExtensionType):
        try:
            return t.extension_name, t.__arrow_ext_serialize__()
        except NotImplementedError:
            return None
    meta = field.metadata or {}
    if _EXT_NAME in meta:
        return meta[_EXT_NAME].decode("ascii"), meta.get(_EXT_META, b"")
    return None


def _spark_meta_for_extension(name: str, payload: bytes) -> dict | None:
    """Spark column metadata for a reference extension annotation."""
    import json

    from fenix_spark.sources.msgpack_mini import unpackb

    if not payload:
        # Named-but-unannotated extension field (metadata key absent):
        # nothing to decode — skip the annotation rather than crash on
        # an empty msgpack payload.
        return None
    if name == "tensor":
        shape = unpackb(payload)
        return {"tensor_shape": [int(d) for d in shape]}
    if name == "tensor::qint8":
        p = unpackb(payload)
        return {
            "tensor_shape": [int(d) for d in p["shape"]],
            "quant": json.dumps(
                {"scale": float(p["scale"]), "shift": int(p["shift"])}
            ),
        }
    if name == "NestedTensor":
        # ref ex/arrow/nested/nested.py:18-31 — the payload is a
        # msgpack SHAPE TREE: {field: [dims...] | nested tree}. Kept as
        # JSON column metadata; the storage struct itself arrives
        # through the normal struct normalization (F7 path access
        # works either way — this preserves the tensor SHAPES)
        return {"nested_tensor_shape": json.dumps(unpackb(payload))}
    return None


def read_arrow_ipc(spark, path: str, suffix: str = ".arrow"):
    """Read reference ``.arrow`` tables WITH extension-type fidelity:
    the ``arrowipc`` datasource yields the storage arrays (Spark has no
    extension columns), and this helper re-attaches the reference's
    Tensor/QUInt8 annotations as ``tensor_shape``/``quant`` column
    metadata read from the first file's Arrow schema — the same keys
    ``functions/tensors.py`` and ``write_arrow_ipc`` speak, closing the
    round trip export → reference schema → re-ingest."""
    register(spark)
    df = spark.read.format("arrowipc").options(path=path, suffix=suffix).load()
    files = _list_files(path, suffix)
    if not files:
        return df
    reader = _open_ipc(files[0])
    try:
        arrow_schema = reader.schema
    finally:
        _close(reader)
    for field in arrow_schema:
        ann = _extension_annotation(field)
        if ann is None or field.name not in df.columns:
            continue
        meta = _spark_meta_for_extension(*ann)
        if meta:
            existing = dict(df.schema[field.name].metadata or {})
            existing.update(meta)
            df = df.withMetadata(field.name, existing)
    return df


def _nested_shape_of(df, name: str):
    """The JSON shape tree from ``nested_tensor_shape`` column
    metadata, or None."""
    import json

    if name not in df.columns:
        return None
    meta = df.schema[name].metadata or {}
    raw = meta.get("nested_tensor_shape")
    return json.loads(raw) if raw else None


def _nest_storage(arr, tree):
    """Rebuild a struct array as the reference's NestedTensor STORAGE:
    every leaf named in the shape tree becomes a fixed_size_list of
    prod(shape) (the reference flattens each tensor to its row-major
    vector, nested.py:50-61); nested dicts recurse through sub-structs.
    Leaves absent from the tree pass through unchanged."""
    import math

    import pyarrow as pa

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    children, fields = [], []
    for i, f in enumerate(arr.type):
        child = arr.field(i)
        sub = tree.get(f.name)
        if isinstance(sub, dict) and pa.types.is_struct(f.type):
            child = _nest_storage(child, sub)
        elif isinstance(sub, (list, tuple)) and pa.types.is_list(f.type):
            n = int(math.prod(sub)) if sub else 1
            child = child.cast(pa.list_(f.type.value_type, n))
        children.append(child)
        fields.append(pa.field(f.name, child.type, f.nullable))
    # from_arrays drops the struct-level validity unless told: a null
    # tensor ROW must stay null on the wire, not resurface as a struct
    # of whatever sat under the null slot
    mask = arr.is_null() if arr.null_count else None
    return pa.StructArray.from_arrays(children, fields=fields, mask=mask)


def _wrap_extension_columns(df, table):
    """Rewrap plain-array columns of an exported Arrow table into the
    reference's extension wire form wherever the Spark schema carries
    tensor metadata. Returns the (possibly) rewritten table."""
    import math

    import pyarrow as pa

    from fenix_spark.functions.tensors import qparams_of, shape_of
    from fenix_spark.sources.msgpack_mini import packb

    cols, fields = [], []
    changed = False
    for i, field in enumerate(table.schema):
        arr = table.column(i)
        tree = _nested_shape_of(df, field.name)
        if tree and pa.types.is_struct(field.type):
            storage = _nest_storage(arr, tree)
            meta = dict(field.metadata or {})
            meta[_EXT_NAME] = b"NestedTensor"
            # msgpack_mini emits the same bytes msgspec does for
            # {str: [int...]|tree} — the reference's
            # __arrow_ext_deserialize__ reconstructs NestedTensorType
            meta[_EXT_META] = packb(tree)
            cols.append(storage)
            fields.append(
                pa.field(field.name, storage.type, field.nullable, meta)
            )
            changed = True
            continue
        shape = (
            shape_of(df, field.name) if field.name in df.columns else None
        )
        if shape and pa.types.is_list(field.type):
            n = int(math.prod(shape))
            qp = qparams_of(df, field.name)
            if qp is not None:
                scale, shift = qp
                storage = arr.cast(pa.list_(pa.uint8())).cast(
                    pa.list_(pa.uint8(), n)
                )
                name = b"tensor::qint8"
                payload = packb(
                    {"shape": list(shape), "scale": scale, "shift": shift}
                )
            else:
                storage = arr.cast(pa.list_(field.type.value_type, n))
                name = b"tensor"
                payload = packb(list(shape))
            meta = dict(field.metadata or {})
            meta[_EXT_NAME] = name
            meta[_EXT_META] = payload
            cols.append(storage.combine_chunks())
            fields.append(
                pa.field(field.name, storage.type, field.nullable, meta)
            )
            changed = True
        else:
            cols.append(arr)
            fields.append(field)
    if not changed:
        return table
    return pa.Table.from_arrays(cols, schema=pa.schema(fields))


def write_arrow_ipc(df, path: str, max_rows: int = 5_000_000) -> int:
    """Export ``df`` to a single Arrow IPC STREAM file — the reference
    engine's native one-file-per-table layout (ref:
    src/fenix/io/arrow/arrow.py:6-21), closing the interop loop:
    ``migrate_reference_store`` brings a reference store in, this
    writes query results back out where the reference (or any Arrow
    consumer: polars, duckdb, pyarrow) can read them.

    The format is a SINGLE sequential stream, so this is inherently a
    one-writer export — a driver-side collect, loudly capped at
    ``max_rows`` (the same bounded-driver-materialization contract as
    ``bloom_to_words``). It is an interop/export tool for result and
    dimension tables, NOT a data sink: corpus-sized output belongs in
    parquet through the catalog, where every executor writes in
    parallel. Returns the row count written."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"write_arrow_ipc is a single-stream driver-side export: "
            f"{n} rows > max_rows={max_rows}. Corpus-sized data belongs "
            "in parquet (catalog.make); raise max_rows only if the "
            "driver can really hold this table"
        )
    table = df.toArrow()
    # columns carrying tensor_shape / quant metadata go out in the
    # reference's extension wire form (fixed_size_list storage +
    # ARROW:extension:* field metadata) so a reference reader
    # reconstructs TensorType / QUInt8TensorType exactly
    table = _wrap_extension_columns(df, table)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with pa.OSFile(path, "wb") as sink:
        with ipc.new_stream(sink, table.schema) as w:
            w.write_table(table)
    return n
