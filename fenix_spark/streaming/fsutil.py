"""Filesystem helpers for streaming state roots, routed through the
Hadoop FileSystem API so a ``state_root`` on HDFS / S3A / any
Hadoop-registered scheme behaves exactly like a local path. The
foreachBatch WRITES always went through Spark (scheme-agnostic); these
helpers close the gap for state DISCOVERY (listing ``batch_id=N``
partial dirs) and compaction DELETES, which previously used
``os.listdir`` / ``shutil.rmtree`` and silently required a locally
mounted state root.

``Path.getFileSystem`` resolves the scheme per call (a ``file:`` root
and an ``s3a:`` root can coexist), and a plain ``/path`` resolves via
``fs.defaultFS`` — identical to how Spark's own sinks resolve the same
string, so readers and writers always agree on the filesystem.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def list_child_names(spark: SparkSession, root: str) -> list[str]:
    """Names of the direct children of ``root`` (empty if absent)."""
    fs, p = _fs(spark, root)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def delete_path(spark: SparkSession, path: str) -> bool:
    """Recursive delete; False if the path did not exist."""
    fs, p = _fs(spark, path)
    return bool(fs.delete(p, True))


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Overwrite ``path`` with ``text`` (UTF-8) through the Hadoop FS
    API — used for tiny state sidecars (e.g. the KLL ``k``), so they
    live next to the partials on whatever filesystem holds them."""
    fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str | None:
    """Contents of ``path`` as UTF-8 text, or None if absent."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return None
    jvm = spark._jvm
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def complete_partial_ids(spark: SparkSession, root: str, prefix: str) -> list[int]:
    """Ids of COMPLETE ``{prefix}=N`` partial dirs under ``root`` —
    completeness is the _SUCCESS marker, so a crash mid-write (or a
    retried batch's cleared-but-unwritten dir) is invisible to readers
    rather than a torn merge / schema-inference failure."""
    out = []
    for d in list_child_names(spark, root):
        if d.startswith(f"{prefix}=") and path_exists(
            spark, f"{root}/{d}/_SUCCESS"
        ):
            try:
                out.append(int(d.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)
