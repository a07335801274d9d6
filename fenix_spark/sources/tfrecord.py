"""TFRecord source/sink — the training-shard wire format, lib-free.

A TFRecord file (public format, TensorFlow docs "TFRecord and
tf.train.Example") is a sequence of length-framed records:

    uint64  length            (little-endian)
    uint32  masked_crc32c(length bytes)
    byte    data[length]      (a serialized tf.train.Example proto)
    uint32  masked_crc32c(data)

with ``masked_crc = rotr15(crc32c(x)) + 0xa282ead8``. The payload is a
``tf.train.Example`` protobuf — also a public, stable wire format:
``Example{features: Features{feature: map<string, Feature>}}`` where a
``Feature`` is one of bytes_list / float_list / int64_list. Neither
tensorflow nor protobuf ships in this environment, so both layers are
written/parsed directly against the wire specs (the same approach as
``sources/torchpickle.py`` for torch's zip format): protobuf
varint/LEN encoding is ~40 lines, and CRC-32C (Castagnoli) is a
table-driven page. The canonical CRC test vector and a byte-pinned
record are in tests.

Registered as a Spark Python DataSource, so the surface is idiomatic:

    register_tfrecord(spark)
    df.write.format("tfrecord").mode("overwrite").save(path)   # executor-parallel shards
    spark.read.format("tfrecord").schema(ddl).load(path)       # partition-per-file

Column-type mapping (write): long→int64_list, double/float→float_list,
string→bytes_list(utf-8), binary→bytes_list, array<long>→int64_list,
array<double|float>→float_list, array<string|binary>→bytes_list.
Read: with an explicit ``.schema(...)``, scalars are singletons of
their list (a record missing the field or with an empty list reads as
NULL); without a schema, types are inferred from the FIRST record of
the FIRST file and every field comes back as an array column (the wire
format is lists all the way down — scalar-ness is schema knowledge
only the caller has).

Scale shape: writing is one shard file per partition, each executor
streaming its own records (repartition/write_shards upstream chooses
the shard count); reading is one input partition per file. Records are
CRC-checked on read — a torn shard fails loudly, never yields garbage.
Feature keys are emitted in sorted order so identical rows serialize
to identical bytes (diffable, dedupable exports).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)

__all__ = ["register_tfrecord", "TFRecordDataSource"]

# ------------------------------------------------------------- crc32c

_CRC32C_POLY = 0x82F63B78  # Castagnoli, reflected


def _make_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -------------------------------------------------- proto wire helpers


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _feature_bytes(values: list[bytes]) -> bytes:
    # Feature{bytes_list: BytesList{value: repeated bytes = 1}} = field 1
    inner = b"".join(_len_field(1, v) for v in values)
    return _len_field(1, inner)


def _feature_floats(values: list[float]) -> bytes:
    # Feature{float_list = 2}; FloatList.value packed float32
    packed = struct.pack(f"<{len(values)}f", *values)
    return _len_field(2, _len_field(1, packed))


def _feature_ints(values: list[int]) -> bytes:
    # Feature{int64_list = 3}; Int64List.value packed varint (two's
    # complement 64-bit for negatives, per proto spec)
    packed = b"".join(_varint(v & 0xFFFFFFFFFFFFFFFF) for v in values)
    return _len_field(3, _len_field(1, packed))


def _example(features: dict[str, bytes]) -> bytes:
    # Features.feature map entries: key=1 (string), value=2 (Feature);
    # sorted keys → byte-deterministic records
    entries = b"".join(
        _len_field(1, _len_field(1, k.encode()) + _len_field(2, feat))
        for k, feat in sorted(features.items())
    )
    return _len_field(1, entries)  # Example.features = 1


def _frame(record: bytes) -> bytes:
    header = struct.pack("<Q", len(record))
    return (
        header
        + struct.pack("<I", _masked_crc(header))
        + record
        + struct.pack("<I", _masked_crc(record))
    )


# ------------------------------------------------------ proto parsing


def _read_varint(mv: memoryview, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = mv[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint in tfrecord proto")


def _parse_message(mv: memoryview) -> list[tuple[int, int, object]]:
    """(field, wire_type, value) triples of one message level."""
    out = []
    pos = 0
    while pos < len(mv):
        tag, pos = _read_varint(mv, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_varint(mv, pos)
            out.append((field, wt, v))
        elif wt == 2:
            n, pos = _read_varint(mv, pos)
            out.append((field, wt, mv[pos : pos + n]))
            pos += n
        elif wt == 5:
            out.append((field, wt, mv[pos : pos + 4]))
            pos += 4
        elif wt == 1:
            out.append((field, wt, mv[pos : pos + 8]))
            pos += 8
        else:
            raise ValueError(f"unsupported proto wire type {wt}")
    return out


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def parse_example(record: bytes) -> dict[str, list]:
    """Serialized tf.train.Example → {name: list of int/float/bytes}."""
    out: dict[str, list] = {}
    for f, wt, v in _parse_message(memoryview(record)):
        if f != 1 or wt != 2:
            continue  # only Example.features
        for f2, wt2, entry in _parse_message(v):
            if f2 != 1 or wt2 != 2:
                continue  # only Features.feature map entries
            key, feat = None, None
            for f3, wt3, v3 in _parse_message(entry):
                if f3 == 1 and wt3 == 2:
                    key = bytes(v3).decode()
                elif f3 == 2 and wt3 == 2:
                    feat = v3
            if key is None or feat is None:
                continue
            values: list = []
            for f4, wt4, v4 in _parse_message(feat):
                if f4 == 1 and wt4 == 2:  # BytesList
                    for f5, wt5, v5 in _parse_message(v4):
                        if f5 == 1 and wt5 == 2:
                            values.append(bytes(v5))
                elif f4 == 2 and wt4 == 2:  # FloatList (packed)
                    for f5, wt5, v5 in _parse_message(v4):
                        if f5 == 1 and wt5 == 2:
                            n = len(v5) // 4
                            values.extend(struct.unpack(f"<{n}f", bytes(v5)))
                        elif f5 == 1 and wt5 == 5:  # unpacked variant
                            values.append(struct.unpack("<f", bytes(v5))[0])
                elif f4 == 3 and wt4 == 2:  # Int64List (packed)
                    for f5, wt5, v5 in _parse_message(v4):
                        if f5 == 1 and wt5 == 2:
                            pos = 0
                            mv5 = memoryview(v5)
                            while pos < len(mv5):
                                x, pos = _read_varint(mv5, pos)
                                values.append(_to_signed64(x))
                        elif f5 == 1 and wt5 == 0:
                            values.append(_to_signed64(v5))
            out[key] = values
    return out


def read_records(path: str):
    """Yield CRC-verified record payloads from one TFRecord file."""
    with open(path, "rb") as fh:
        while True:
            header = fh.read(8)
            if not header:
                return
            if len(header) != 8:
                raise ValueError(f"{path}: truncated record header")
            (crc_h,) = struct.unpack("<I", fh.read(4))
            if crc_h != _masked_crc(header):
                raise ValueError(f"{path}: header CRC mismatch (torn file?)")
            (n,) = struct.unpack("<Q", header)
            data = fh.read(n)
            if len(data) != n:
                raise ValueError(f"{path}: truncated record body")
            (crc_d,) = struct.unpack("<I", fh.read(4))
            if crc_d != _masked_crc(data):
                raise ValueError(f"{path}: record CRC mismatch (corrupt data)")
            yield data


# ------------------------------------------------- Spark DataSource


def _list_files(path: str, suffix: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(suffix) and not f.startswith("_")
    )


class TFRecordDataSource(DataSource):
    """format("tfrecord"): options — ``path``, ``suffix`` (default
    ``.tfrecord``). Write side shards one file per partition."""

    @classmethod
    def name(cls) -> str:
        return "tfrecord"

    def schema(self):
        # no user schema: infer from the first record, all fields as
        # arrays (the wire format carries lists; scalar-ness is caller
        # knowledge — pass .schema(...) for scalar columns)
        from pyspark.sql import types as T

        files = _list_files(
            self.options.get("path"), self.options.get("suffix", ".tfrecord")
        )
        if not files:
            raise FileNotFoundError(
                f"no tfrecord files under {self.options.get('path')!r}"
            )
        first = next(iter(read_records(files[0])), None)
        if first is None:
            raise ValueError(f"{files[0]} holds no records to infer from")
        fields = []
        for k, values in sorted(parse_example(first).items()):
            if values and isinstance(values[0], bytes):
                elem = T.BinaryType()
            elif values and isinstance(values[0], float):
                elem = T.FloatType()
            else:
                elem = T.LongType()
            fields.append(T.StructField(k, T.ArrayType(elem), True))
        return T.StructType(fields)

    def reader(self, schema) -> "TFRecordReader":
        return TFRecordReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> "TFRecordWriter":
        return TFRecordWriter(self.options, schema, overwrite)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TFRecordReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        self.suffix = options.get("suffix", ".tfrecord")
        self.schema = schema

    def partitions(self):
        files = _list_files(self.path, self.suffix)
        if not files:
            raise FileNotFoundError(f"no {self.suffix} files under {self.path}")
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        from pyspark.sql import types as T

        fields = self.schema.fields
        for record in read_records(partition.path):
            parsed = parse_example(record)
            row = []
            for f in fields:
                values = parsed.get(f.name)
                if isinstance(f.dataType, T.ArrayType):
                    if values is None:
                        row.append(None)
                    elif isinstance(f.dataType.elementType, T.StringType):
                        row.append([v.decode() for v in values])
                    else:
                        row.append(values)
                else:  # scalar column: singleton list on the wire
                    if not values:
                        row.append(None)
                    elif isinstance(f.dataType, T.StringType):
                        row.append(values[0].decode())
                    elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                        row.append(float(values[0]))
                    elif isinstance(f.dataType, T.BinaryType):
                        row.append(bytes(values[0]))
                    else:
                        row.append(int(values[0]))
            yield tuple(row)


class _ShardDone(WriterCommitMessage):
    pass


class TFRecordWriter(DataSourceArrowWriter):
    def __init__(self, options, schema, overwrite: bool):
        import uuid

        self.path = options.get("path")
        self.suffix = options.get("suffix", ".tfrecord")
        self.schema = schema
        self.overwrite = overwrite
        # Per-JOB token (minted once on the driver, shipped to every
        # task in the pickled writer): temp and final shard names carry
        # it, so abort sweeps only THIS job's files — a concurrent
        # append to the same directory keeps its in-progress temps and
        # its committed shards.
        self.job_token = uuid.uuid4().hex[:12]
        if self.path is None:
            raise ValueError("tfrecord writer requires a path")
        if overwrite and os.path.isdir(self.path):
            import shutil

            shutil.rmtree(self.path)

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        # Task-commit protocol: write under an underscore-prefixed temp
        # name (readers skip '_'-files) and rename into place only when
        # the task's iterator is exhausted. A task that dies mid-write —
        # even exactly at a record boundary — leaves no readable shard,
        # in overwrite AND append mode; rename is atomic on posix.
        base = f"part-{pid:05d}-{self.job_token}-{uuid.uuid4().hex[:8]}{self.suffix}"
        out = os.path.join(self.path, base)
        tmp = os.path.join(self.path, "_tmp-" + base)
        n = 0
        with open(tmp, "wb") as fh:
            for batch in iterator:
                cols = {
                    name: batch.column(i).to_pylist()
                    for i, name in enumerate(batch.schema.names)
                }
                names = list(batch.schema.names)
                for r in range(batch.num_rows):
                    feats = {}
                    for name in names:
                        v = cols[name][r]
                        if v is None:
                            continue
                        feats[name] = _encode_value(name, v)
                    fh.write(_frame(_example(feats)))
                    n += 1
        if n == 0:
            os.remove(tmp)  # no empty shards
        else:
            os.replace(tmp, out)
        return _ShardDone()

    def commit(self, messages):
        # shard files are self-contained; a _SUCCESS marker mirrors the
        # parquet convention so completeness is checkable
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages):
        # Sweep ONLY this job's files — matched by the per-job token —
        # so an aborted append leaves the directory byte-identical to
        # before the write (finished tasks' renamed-in shards included)
        # while a concurrent job's '_tmp-' files and shards survive.
        mark = f"-{self.job_token}-"
        try:
            for name in os.listdir(self.path):
                if mark in name and name.endswith(self.suffix):
                    os.remove(os.path.join(self.path, name))
        except OSError:
            pass  # directory never created: nothing to clean


def _encode_value(name: str, v) -> bytes:
    if isinstance(v, bool):
        raise TypeError(f"column {name!r}: boolean has no tf.train.Feature type")
    if isinstance(v, int):
        return _feature_ints([v])
    if isinstance(v, float):
        return _feature_floats([v])
    if isinstance(v, str):
        return _feature_bytes([v.encode()])
    if isinstance(v, (bytes, bytearray)):
        return _feature_bytes([bytes(v)])
    if isinstance(v, list):
        if not v:
            return _feature_ints([])
        head = v[0]
        if isinstance(head, int):
            return _feature_ints(v)
        if isinstance(head, float):
            return _feature_floats(v)
        if isinstance(head, str):
            return _feature_bytes([s.encode() for s in v])
        if isinstance(head, (bytes, bytearray)):
            return _feature_bytes([bytes(b) for b in v])
    raise TypeError(
        f"column {name!r}: {type(v).__name__} does not map to a "
        "tf.train.Feature (supported: int/float/str/bytes and lists thereof)"
    )


def register_tfrecord(spark) -> None:
    """Idempotent registration of the ``tfrecord`` format."""
    spark.dataSource.register(TFRecordDataSource)
