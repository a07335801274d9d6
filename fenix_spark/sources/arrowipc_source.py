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


def _normalize_batch(batch):
    import pyarrow as pa

    cols, fields = [], []
    for i, field in enumerate(batch.schema):
        arr = batch.column(i)
        t = field.type
        if isinstance(t, pa.ExtensionType):
            arr = arr.storage
            t = arr.type
        if pa.types.is_fixed_size_list(t):
            arr = arr.cast(pa.list_(t.value_type))
            t = arr.type
        if pa.types.is_dictionary(t):
            arr = arr.dictionary_decode()
            t = arr.type
        cols.append(arr)
        fields.append(pa.field(field.name, t, field.nullable))
    return pa.RecordBatch.from_arrays(cols, schema=pa.schema(fields))


def _normalize_schema(schema):
    import pyarrow as pa

    fields = []
    for field in schema:
        t = field.type
        if isinstance(t, pa.ExtensionType):
            t = t.storage_type
        if pa.types.is_fixed_size_list(t):
            t = pa.list_(t.value_type)
        if pa.types.is_dictionary(t):
            t = t.value_type
        fields.append(pa.field(field.name, t, field.nullable))
    return pa.schema(fields)


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
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with pa.OSFile(path, "wb") as sink:
        with ipc.new_stream(sink, table.schema) as w:
            w.write_table(table)
    return n
