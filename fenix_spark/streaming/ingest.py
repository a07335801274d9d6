"""Streaming ingest into the engine's parquet catalog layout — the
Structured Streaming analog of the reference's Flight ``do_put``
(src/fenix/flight.py:34-44): batches arrive, get appended under
``<root>/sources/<name>``, and become immediately scannable.

Scale notes: file-source streaming with ``maxFilesPerTrigger`` gives
backpressure; the sink writes parquet partitioned however the caller
pre-partitioned the frame (e.g. by date for events), so downstream
scans prune. Exactly-once comes from the checkpoint + file-sink
transaction log — both just directories under the root, matching the
reference's "everything is a directory" catalog (io/table/table.py:9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """A file-based streaming source (schema must be explicit — file
    streams can't infer)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def enrich_stream(stream: DataFrame, dim: DataFrame, key: str | list[str]) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    flowing stream (the streaming analog of the TPC-H dim joins).

    The static side is BROADCAST once per micro-batch — no state, no
    watermark, no shuffle of the stream side, which is the only join
    shape that stays O(batch) at an unbounded 100 TB/day ingest rate.
    (A stream-stream join would need full-history state for this use;
    see streaming/dedup.py for the same stateless-vs-stateful split.)
    The static frame is re-resolved every batch, so slowly-changing
    dimensions pick up updates on the next trigger when backed by a
    re-readable source.
    """
    from pyspark.sql import functions as F

    keys = [key] if isinstance(key, str) else list(key)
    return stream.join(F.broadcast(dim), keys, "left")


def stream_ingest(
    df: DataFrame,
    root: str,
    name: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Append a streaming frame into ``<root>/sources/<name>`` —
    the catalog location batch readers use (catalog.py). With
    ``available_now`` the query drains everything currently available
    and stops: deterministic for tests and backfills; pass False for a
    continuously running ingest.

    COMPACTED TABLES REFUSE FILE-SINK APPENDS (loud, not silent): the
    parquet file-sink keeps its own ``_spark_metadata`` transaction log
    and batch readers of a sink-owned directory trust ONLY that log —
    a sink started inside a compacted generation would make the
    compacted files invisible to every reader (split-brain, measured in
    tests/test_manifest.py). The 100 TB pattern is base + delta:
    continue ingesting into a sibling table (``<name>_delta``) and read
    ``catalog.load(spark, root, [name, delta])`` — then fold the union
    into a new base with ``catalog.make`` + ``compact`` when the delta
    grows, and restart the delta sink fresh."""
    from fenix_spark.catalog import source_path
    from fenix_spark.manifest import current_gen

    path = source_path(root, name)
    if current_gen(path) is not None:
        raise ValueError(
            f"table {name!r} has been compacted (manifest-managed): the "
            "parquet file-sink's _spark_metadata log cannot adopt the "
            "compacted files, so appending here would hide them from "
            "readers. Ingest into a sibling delta table and union via "
            f"catalog.load(spark, root, [{name!r}, '<delta>'])."
        )
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
