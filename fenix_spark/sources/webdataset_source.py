"""A Spark Python DataSource that reads WebDataset tar shards back as
a DataFrame — the ingest side of ``operators/webdataset.py``'s export,
built on Spark 4's Python DataSource API (SPARK-44076) so shard
reading is a first-class, partition-parallel scan:

    from fenix_spark.sources.webdataset_source import register
    register(spark)
    df = spark.read.format("webdataset").load("/path/to/shards")

Scale shape:

- ONE input partition PER TAR SHARD (`partitions()`), so a
  1000-executor cluster reads 100k shards with full parallelism and
  locality-friendly whole-file access (tars are sequential media —
  exactly why trainers shard this way).
- Each partition streams its tar member-by-member (`tarfile` in
  streaming mode, no index materialization); samples are grouped by
  basename per the webdataset convention (``<key>.<ext>`` payload +
  ``<key>.json`` metadata) and yielded as Arrow-bound tuples.
- A sample with SEVERAL payload members (``key.jpg`` + ``key.cls``)
  yields one ROW PER PAYLOAD, each carrying the sample's key and
  json metadata — nothing is silently dropped; re-group with
  ``groupBy("key")`` when a one-row-per-sample view is wanted. The
  webdataset convention requires a sample's members to be
  CONSECUTIVE in the tar; members of the same key that are split by
  another key start a NEW sample (spec-compliant reading of a
  non-conforming tar), with the json metadata attaching only to the
  contiguous run it appears in.
- Payload skipping: the Python DataSource API does not push column
  pruning into ``read`` automatically, but a USER-SUPPLIED read
  schema does reach the reader — ``spark.read.format("webdataset")
  .schema("key string, meta string").load(p)`` never materializes
  payload bytes into Python objects, so metadata-only scans of
  petabyte shard sets stay cheap.
"""

from __future__ import annotations

import os
import tarfile

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FULL_SCHEMA = "key string, ext string, data binary, meta string, shard string"


class WebDatasetDataSource(DataSource):
    """format("webdataset"): options — ``path`` (or load(path)),
    ``suffix`` (shard filename suffix, default ``.tar``)."""

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        return FULL_SCHEMA

    def reader(self, schema) -> "WebDatasetReader":
        return WebDatasetReader(self.options, schema)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WebDatasetReader(DataSourceReader):
    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError("webdataset source requires a path")
        self.path = path
        self.suffix = options.get("suffix", ".tar")
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        shards = self._list_shards()
        if not shards:
            raise FileNotFoundError(
                f"no {self.suffix} shards under {self.path}"
            )
        return [_ShardPartition(s) for s in shards]

    def _list_shards(self) -> list[str]:
        """Shard discovery via the Hadoop FileSystem API when a
        session is active (HDFS/S3A paths work like local ones —
        partitions() runs on the driver); plain os.listdir as the
        fallback for sessionless use. Note `read()` itself opens the
        shard with tarfile, which needs a locally reachable path on
        the EXECUTOR — remote shard BYTES still require a mounted or
        fuse-exposed store, stated here rather than discovered as a
        worker crash."""
        try:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        except Exception:  # noqa: BLE001 - no pyspark context
            spark = None
        if spark is not None:
            from fenix_spark.streaming.fsutil import _fs

            fs, p = _fs(spark, self.path)
            if fs.exists(p) and fs.getFileStatus(p).isFile():
                return [self.path]
            if fs.exists(p):
                # rebuild child paths from the caller's own root
                # string so its scheme/authority form is preserved
                # (str(Path) would turn /local into file:/local,
                # toUri().getPath() would strip an s3a:// bucket)
                root = self.path.rstrip("/")
                return sorted(
                    f"{root}/{st.getPath().getName()}"
                    for st in fs.listStatus(p)
                    if st.getPath().getName().endswith(self.suffix)
                )
            return []
        if os.path.isfile(self.path):
            return [self.path]
        if not os.path.isdir(self.path):
            return []
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(self.suffix)
        )

    def read(self, partition):
        want_data = "data" in self.fields
        shard = partition.path
        # webdataset contract: a sample's members are CONSECUTIVE in
        # the tar; flush the current sample whenever the key changes.
        # Every payload member is kept — one output row per payload,
        # all sharing the sample's json metadata (last-wins retention
        # of a single slot would silently drop key.cls next to
        # key.jpg).
        cur_key = None
        cur_meta = None
        cur_payloads: list[tuple[str, bytes | None]] = []

        def emit():
            if cur_key is None:
                return
            payloads = cur_payloads if cur_payloads else [(None, None)]
            for ext, data in payloads:
                row = {
                    "key": cur_key,
                    "ext": ext,
                    "data": data if want_data else None,
                    "meta": cur_meta,
                    "shard": shard,
                }
                yield tuple(row[f] for f in self.fields)

        try:
            with tarfile.open(shard, "r") as tar:
                for info in tar:
                    if not info.isfile():
                        continue
                    # FIRST-dot split (webdataset convention): the key is
                    # everything before the first dot, so multi-segment
                    # extensions (seg.png, json.gz) group with their sample
                    base, dot, ext = info.name.partition(".")
                    if not dot:
                        base, ext = info.name, ""
                    if base != cur_key:
                        yield from emit()
                        cur_key, cur_meta, cur_payloads = base, None, []
                    if ext == "json":
                        cur_meta = tar.extractfile(info).read().decode("utf-8")
                    else:
                        cur_payloads.append(
                            (ext, tar.extractfile(info).read() if want_data else None)
                        )
        except (tarfile.TarError, OSError, EOFError):
            # crawl-source discipline (warc_source's contract): a
            # truncated/corrupt shard ends the FILE, never the task —
            # samples before the damage were already yielded; the torn
            # in-progress sample is DROPPED, not emitted half-read
            return
        yield from emit()


def register(spark) -> None:
    """Idempotent registration of the ``webdataset`` format."""
    spark.dataSource.register(WebDatasetDataSource)
