"""MP4 box-tree parsing tests: encoder/parser round-trip, spec-level
field placement (fixed-point dims, v0/v1 mvhd), malformed-input
tolerance, and the Spark mapInPandas wrapper."""

from __future__ import annotations

import struct

import pytest

from fenix_spark.multimodal.mp4 import (
    encode_minimal_mp4,
    parse_mp4_metadata,
    video_metadata,
)


def test_roundtrip_metadata():
    blob = encode_minimal_mp4(12.5, timescale=1000, width=1280, height=720, codec="hev1")
    m = parse_mp4_metadata(blob)
    assert m["ok"]
    assert m["brand"] == "isom"
    assert m["duration_s"] == 12.5
    assert m["timescale"] == 1000
    assert m["n_tracks"] == 1
    assert m["track_kinds"] == ["vide"]
    assert m["codecs"] == ["hev1"]
    assert (m["width"], m["height"]) == (1280, 720)


def test_mvhd_v1_large_duration():
    # hand-build a v1 mvhd with a 64-bit duration
    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    dur = (1 << 33) + 17
    mvhd = box(
        b"mvhd",
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 90_000)
        + struct.pack(">Q", dur)
        + b"\x00" * 80,
    )
    blob = box(b"moov", mvhd)
    m = parse_mp4_metadata(blob)
    assert m["timescale"] == 90_000
    assert m["duration_s"] == round(dur / 90_000, 6)


def test_malformed_inputs_never_raise():
    for blob in (
        b"",
        b"\x00",
        b"\x00\x00\x00\x10ftyp",  # size overruns buffer
        b"\xff" * 64,
        encode_minimal_mp4(1.0)[:-7],  # truncated mid-box
    ):
        m = parse_mp4_metadata(blob)
        assert isinstance(m, dict)
    # random bytes: not ok
    assert not parse_mp4_metadata(b"\xff" * 64)["ok"]


def test_video_metadata_over_spark(spark):
    rows = [
        (0, encode_minimal_mp4(3.0, width=640, height=360)),
        (1, encode_minimal_mp4(60.0, width=1920, height=1080, codec="av01")),
        (2, b"not a video"),
    ]
    df = spark.createDataFrame(rows, "id bigint, data binary")
    got = {r.id: r for r in video_metadata(df).collect()}
    assert got[0].ok and got[0].duration_s == 3.0 and got[0].width == 640
    assert got[1].codecs == ["av01"] and got[1].height == 1080
    assert not got[2].ok


def test_curation_filter_shape(spark):
    """The curation use: drop sub-5s clips without any decode."""
    from pyspark.sql import functions as F

    rows = [(i, encode_minimal_mp4(float(i))) for i in (1, 3, 10, 30)]
    df = spark.createDataFrame(rows, "id bigint, data binary")
    kept = video_metadata(df).where(F.col("duration_s") >= 5.0)
    assert sorted(r.id for r in kept.collect()) == [10, 30]


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def test_tkhd_trailing_padding_dims():
    """Dims live at the version-fixed offsets (body+76 for v0) — a
    tkhd with trailing padding after width/height must still parse
    correctly (reading 'the last 8 bytes' would return garbage)."""
    body = (
        b"\x00\x00\x00\x07"
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", 1000)  # duration
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 1280 << 16, 720 << 16)
        + b"\x00" * 8  # trailing padding/extension bytes
    )
    blob = _box(b"moov", _box(b"trak", _box(b"tkhd", body)))
    m = parse_mp4_metadata(blob)
    assert (m["width"], m["height"]) == (1280, 720)


def test_tkhd_v1_layout_dims():
    """v1 tkhd: 64-bit creation/modification/duration shift the dims
    to body+88."""
    body = (
        b"\x01\x00\x00\x07"
        + struct.pack(">QQ", 0, 0)  # creation, modification (u64)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">Q", 1000)  # duration (u64)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 640 << 16, 480 << 16)
    )
    blob = _box(b"moov", _box(b"trak", _box(b"tkhd", body)))
    m = parse_mp4_metadata(blob)
    assert (m["width"], m["height"]) == (640, 480)
