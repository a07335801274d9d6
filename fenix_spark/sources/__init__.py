"""Source connectors: every format the engine ingests or exposes.

The reference's single ingest path is an Arrow RecordBatch stream over
gRPC written to an IPC file (src/fenix/flight.py:34-44,
io/arrow/arrow.py:11-21). Spark-first, ingest = read ANY supported
format into a DataFrame and land it in the parquet catalog
(catalog.make); these helpers cover the formats a data pipeline
actually receives: parquet, CSV, JSON-lines, and Arrow IPC files
(the reference's native format, for migration).
"""

from fenix_spark.sources.readers import (
    ingest_arrow_ipc,
    read_arrow_ipc,
    read_csv,
    read_jsonl,
)

from fenix_spark.sources.warc_source import (
    WarcDataSource,
    register as register_warc_source,
    write_warc,
)
from fenix_spark.sources.webdataset_source import (
    WebDatasetDataSource,
    register as register_webdataset_source,
)

__all__ = [
    "WarcDataSource",
    "WebDatasetDataSource",
    "ingest_arrow_ipc",
    "read_arrow_ipc",
    "read_csv",
    "read_jsonl",
    "register_warc_source",
    "register_webdataset_source",
    "write_warc",
]
