"""TFRecord source/sink (sources/tfrecord.py). Proof bar: the CRC-32C
implementation matches the canonical public test vector; a one-record
file's BYTES are pinned against a hand-assembled expected frame
(length + masked CRCs + hand-encoded Example proto); write→read round
trips through Spark with scalar and array columns; corrupt files fail
loudly by name."""

from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import functions as F

from fenix_spark.sources.tfrecord import (
    _example,
    _feature_bytes,
    _feature_floats,
    _feature_ints,
    _frame,
    _masked_crc,
    crc32c,
    parse_example,
    read_records,
    register_tfrecord,
)


def test_crc32c_canonical_vector():
    # the public Castagnoli check value ("123456789" -> 0xE3069283)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # masked form per the TFRecord spec
    assert _masked_crc(b"123456789") == (
        ((0xE3069283 >> 15) | (0xE3069283 << 17)) + 0xA282EAD8
    ) & 0xFFFFFFFF


def test_single_record_bytes_pinned(tmp_path):
    """Assemble the expected bytes BY HAND from the public specs and
    compare with the writer's output for one record."""
    # Example{features{feature{"x": int64_list{value:[5]}}}}
    int64_list = b"\x0a\x01\x05"  # Int64List.value packed: tag 0x0a len 1 varint 5
    feature = b"\x1a\x03" + int64_list  # Feature.int64_list = field 3
    entry = b"\x0a\x01x" + b"\x12\x05" + feature  # key "x", value Feature
    features = b"\x0a" + bytes([len(entry)]) + entry  # Features.feature
    example = b"\x0a" + bytes([len(features)]) + features  # Example.features
    assert _example({"x": _feature_ints([5])}) == example

    frame = _frame(example)
    header = struct.pack("<Q", len(example))
    assert frame[:8] == header
    assert struct.unpack("<I", frame[8:12])[0] == _masked_crc(header)
    assert frame[12:-4] == example
    assert struct.unpack("<I", frame[-4:])[0] == _masked_crc(example)

    p = str(tmp_path / "one.tfrecord")
    with open(p, "wb") as fh:
        fh.write(frame)
    got = list(read_records(p))
    assert got == [example]
    assert parse_example(got[0]) == {"x": [5]}


def test_proto_round_trip_all_types():
    feats = {
        "i": _feature_ints([1, -2, 2**62, -(2**62)]),
        "f": _feature_floats([1.5, -0.25]),
        "b": _feature_bytes([b"\x00\xff", b""]),
        "s": _feature_bytes(["héllo".encode()]),
        "empty": _feature_ints([]),
    }
    parsed = parse_example(_example(feats))
    assert parsed["i"] == [1, -2, 2**62, -(2**62)]
    assert parsed["f"] == [1.5, -0.25]
    assert parsed["b"] == [b"\x00\xff", b""]
    assert parsed["s"] == ["héllo".encode()]
    assert parsed["empty"] == []


def test_spark_write_read_round_trip(spark, tmp_path):
    register_tfrecord(spark)
    df = spark.range(0, 200).select(
        F.col("id"),
        (F.col("id") * 0.5).cast("double").alias("score"),
        F.concat(F.lit("doc"), F.col("id")).alias("text"),
        F.array(F.col("id"), F.col("id") + 1).alias("tokens"),
    ).repartition(4)
    out = str(tmp_path / "shards")
    df.write.format("tfrecord").mode("overwrite").save(out)
    shards = [f for f in os.listdir(out) if f.endswith(".tfrecord")]
    assert len(shards) == 4  # one shard per partition
    assert os.path.exists(os.path.join(out, "_SUCCESS"))

    back = (
        spark.read.format("tfrecord")
        .schema("id long, score double, text string, tokens array<bigint>")
        .load(out)
    )
    got = {r.id: r for r in back.collect()}
    assert len(got) == 200
    assert got[7].score == 3.5
    assert got[7].text == "doc7"
    assert got[7].tokens == [7, 8]


def test_read_without_schema_infers_arrays(spark, tmp_path):
    register_tfrecord(spark)
    df = spark.range(0, 10).select(
        F.col("id"), F.concat(F.lit("d"), F.col("id")).alias("t")
    )
    out = str(tmp_path / "s2")
    df.write.format("tfrecord").mode("overwrite").save(out)
    back = spark.read.format("tfrecord").load(out)
    # inference: every field an array (wire carries lists), sorted names
    assert [f.name for f in back.schema.fields] == ["id", "t"]
    assert all(f.dataType.typeName() == "array" for f in back.schema.fields)
    row = {r["id"][0]: r for r in back.collect()}
    assert bytes(row[3]["t"][0]) == b"d3"


def test_float32_write_loses_precision_documented(spark, tmp_path):
    """float_list is float32 on the wire (the tf.train.Example spec) —
    a double that is not float32-representable comes back rounded;
    exactly-representable values round-trip bit-for-bit."""
    register_tfrecord(spark)
    df = spark.createDataFrame([(1, 0.1), (2, 1.5)], "id bigint, v double")
    out = str(tmp_path / "f32")
    df.write.format("tfrecord").mode("overwrite").save(out)
    got = {
        r.id: r.v
        for r in spark.read.format("tfrecord")
        .schema("id long, v float")
        .load(out)
        .collect()
    }
    assert got[2] == 1.5
    assert got[1] == pytest.approx(0.1, rel=1e-7) and got[1] != 0.1


def test_corrupt_records_fail_by_name(tmp_path):
    good = _frame(_example({"x": _feature_ints([1])}))
    p = str(tmp_path / "bad.tfrecord")
    # flip one payload byte: data CRC must catch it
    bad = bytearray(good)
    bad[14] ^= 0xFF
    with open(p, "wb") as fh:
        fh.write(bytes(bad))
    with pytest.raises(ValueError, match="CRC mismatch"):
        list(read_records(p))
    # truncated body
    with open(p, "wb") as fh:
        fh.write(good[: len(good) - 6])
    with pytest.raises(ValueError, match="truncated|CRC"):
        list(read_records(p))


def test_failed_append_leaves_directory_unchanged(spark, tmp_path):
    """A write that dies mid-task in APPEND mode must leave the target
    byte-identical: tasks write '_tmp-' names and rename only on
    completion, so no partial shard — even one truncated exactly at a
    record boundary — ever carries a readable name."""
    register_tfrecord(spark)
    out = str(tmp_path / "shards")
    base = spark.range(0, 50).select(F.col("id"))
    base.write.format("tfrecord").mode("overwrite").save(out)
    before = {
        f: os.path.getsize(os.path.join(out, f))
        for f in os.listdir(out)
        if not f.startswith("_")
    }

    # raise AFTER some rows have been produced so the task genuinely
    # writes records before dying (the error expression lives in the
    # written column itself, so Catalyst cannot prune it away)
    bad = spark.range(0, 1000).coalesce(1).select(
        F.when(F.col("id") < 500, F.col("id"))
        .otherwise(F.raise_error(F.lit("boom")).cast("long"))
        .alias("id")
    )
    with pytest.raises(Exception, match="boom"):
        bad.write.format("tfrecord").mode("append").save(out)

    after = {
        f: os.path.getsize(os.path.join(out, f))
        for f in os.listdir(out)
        if not f.startswith("_")
    }
    assert after == before
    # and the survivors still read clean
    got = spark.read.format("tfrecord").schema("id long").load(out).count()
    assert got == 50


def test_unsupported_type_raises_by_column(spark, tmp_path):
    register_tfrecord(spark)
    df = spark.createDataFrame([(1, True)], "id bigint, flag boolean")
    with pytest.raises(Exception, match="flag"):
        df.write.format("tfrecord").mode("overwrite").save(str(tmp_path / "nope"))


def test_abort_sweeps_only_its_own_jobs_files(tmp_path):
    """abort() matches files by the writer's per-job token: another
    concurrent job's in-progress temps and committed shards in the
    same directory survive an abort (previously every '_tmp-*' file
    was swept, breaking the other job's end-of-task rename)."""
    from fenix_spark.sources.tfrecord import TFRecordWriter

    out = tmp_path / "shards"
    out.mkdir()
    w1 = TFRecordWriter({"path": str(out)}, None, overwrite=False)
    w2 = TFRecordWriter({"path": str(out)}, None, overwrite=False)
    assert w1.job_token != w2.job_token
    # simulate each job's on-disk state mid-write
    mine_tmp = out / f"_tmp-part-00000-{w1.job_token}-aaaa.tfrecord"
    mine_done = out / f"part-00001-{w1.job_token}-bbbb.tfrecord"
    other_tmp = out / f"_tmp-part-00000-{w2.job_token}-cccc.tfrecord"
    other_done = out / f"part-00001-{w2.job_token}-dddd.tfrecord"
    for f in (mine_tmp, mine_done, other_tmp, other_done):
        f.write_bytes(b"x")
    w1.abort([])
    # job 1's temps AND its renamed-in shards are gone; job 2 untouched
    assert not mine_tmp.exists() and not mine_done.exists()
    assert other_tmp.exists() and other_done.exists()
