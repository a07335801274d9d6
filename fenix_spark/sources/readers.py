"""Format readers.

CSV/JSONL go straight through Spark's distributed readers (splittable,
schema-on-read with explicit StructType preferred — inference costs an
extra pass). Arrow IPC is the reference's on-disk format
(io/arrow/arrow.py): Spark has no native IPC reader, so migration
ingest streams record batches through pyarrow ON THE DRIVER and lands
parquet batch-by-batch — a one-time O(file) conversion with O(batch)
memory, matching the reference's own single-node ingest bound
(flight.py:34-44 processes one stream on one server). After ingest,
everything is distributed parquet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.ipc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from fenix_spark import catalog


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """Distributed CSV scan. Pass a schema: inference reads the data
    twice and infers timestamps inconsistently across locales."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Distributed JSON-lines scan (one object per line — the only
    splittable JSON layout; multiline JSON funnels through one task)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Read a (small) Arrow IPC stream file into a DataFrame via the
    driver — for files that fit driver memory. For big files use
    ``ingest_arrow_ipc`` which streams batch-by-batch into parquet."""
    with pa.ipc.open_stream(path) as reader:
        tbl = reader.read_all()
    return spark.createDataFrame(tbl.to_pandas())


def ingest_arrow_ipc(
    spark: SparkSession,
    path: str,
    root: str,
    name: str,
    batch_rows: int = 65536,
) -> DataFrame:
    """Migrate a reference ``.arrow`` table into the parquet catalog:
    stream record batches (O(batch) driver memory), append each chunk
    as parquet under ``<root>/sources/<name>``, return the resulting
    distributed DataFrame. The reference's own ingest is also a
    single stream writer (io/arrow/arrow.py:11-21); after this
    one-time hop the table is splittable parquet.

    Related tools: ``spark.read.format("arrowipc")``
    (sources/arrowipc_source.py) reads ``.arrow`` files LAZILY and
    distributed (per-file partitions, no catalog hop) — prefer it for
    querying in place; ``sources.migrate.migrate_reference_store``
    migrates a WHOLE reference store including the positional index
    sidecars."""
    target = catalog.source_path(root, name)
    first = True
    with pa.ipc.open_stream(path) as reader:
        buffer: list[pa.RecordBatch] = []
        buffered = 0

        def flush() -> None:
            nonlocal first, buffer, buffered
            if not buffer:
                return
            chunk = pa.Table.from_batches(buffer)
            pdf = chunk.to_pandas()
            mode = "overwrite" if first else "append"
            spark.createDataFrame(pdf).write.mode(mode).parquet(target)
            first = False
            buffer, buffered = [], 0

        for batch in reader:
            buffer.append(batch)
            buffered += batch.num_rows
            if buffered >= batch_rows:
                flush()
        flush()
    return spark.read.parquet(target)
