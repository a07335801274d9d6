"""Compression sniff/decompress: stdlib codec round trips, the
decompression-bomb guard, magic detection, and the Spark surface."""

from __future__ import annotations

import bz2
import gzip
import lzma
import zlib

import numpy as np
import pytest

from fenix_spark.multimodal.compress import (
    decompress_blobs,
    decompress_payload,
    sniff_compression,
)

PAYLOAD = b"the quick brown fox jumps over the lazy dog " * 400


@pytest.mark.parametrize(
    "codec,comp",
    [
        ("gzip", gzip.compress),
        ("zlib", zlib.compress),
        ("bzip2", bz2.compress),
        ("xz", lzma.compress),
    ],
)
def test_roundtrip_and_sniff(codec, comp):
    blob = comp(PAYLOAD)
    assert sniff_compression(blob) == codec
    assert decompress_payload(blob) == PAYLOAD
    assert decompress_payload(blob, codec) == PAYLOAD


def test_uncompressed_passthrough():
    assert sniff_compression(b"plain text here") is None
    assert decompress_payload(b"plain text here") == b"plain text here"
    assert sniff_compression(b"") is None


def test_zstd_detected_but_boundary():
    blob = b"\x28\xb5\x2f\xfd" + b"\x00" * 20
    assert sniff_compression(blob) == "zstd"
    with pytest.raises(NotImplementedError, match="zstd"):
        decompress_payload(blob)


def test_bomb_guard_raises_not_truncates():
    bomb = zlib.compress(b"\x00" * (4 << 20))  # 4 MiB of zeros, ~4 KB packed
    with pytest.raises(ValueError, match="bomb"):
        decompress_payload(bomb, max_out=1 << 20)
    # under the cap it is NOT truncated
    out = decompress_payload(bomb, max_out=8 << 20)
    assert len(out) == 4 << 20


@pytest.mark.parametrize("comp", [bz2.compress, lzma.compress])
def test_bomb_guard_buffering_codecs(comp):
    bomb = comp(b"\x00" * (4 << 20))
    with pytest.raises(ValueError, match="bomb"):
        decompress_payload(bomb, max_out=1 << 20)
    assert decompress_payload(bomb, max_out=8 << 20) == b"\x00" * (4 << 20)


def test_corrupt_stream_raises_cleanly():
    blob = bytearray(gzip.compress(PAYLOAD))
    blob[15] ^= 0xFF
    with pytest.raises(Exception):
        decompress_payload(bytes(blob))


def test_decompress_blobs_spark(spark):
    rows = [
        (1, bytearray(gzip.compress(PAYLOAD))),
        (2, bytearray(b"already plain")),
        (3, bytearray(b"\x28\xb5\x2f\xfd" + b"junk")),  # zstd: lib absent
        (4, bytearray(zlib.compress(b"\x00" * (4 << 20)))),  # bomb at cap 1MiB
        (5, None),
        (6, bytearray(b"\x1f\x8b not actually gzip")),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, data binary")
    got = {r["id"]: r for r in decompress_blobs(df, max_out=1 << 20).collect()}
    assert got[1]["ok"] and got[1]["codec"] == "gzip"
    assert bytes(got[1]["data"]) == PAYLOAD
    assert got[2]["ok"] and got[2]["codec"] is None
    assert bytes(got[2]["data"]) == b"already plain"
    assert not got[3]["ok"] and got[3]["codec"] == "zstd" and got[3]["data"] is None
    assert not got[4]["ok"] and got[4]["codec"] == "zlib"
    assert not got[5]["ok"] and got[5]["data"] is None
    assert not got[6]["ok"] and got[6]["codec"] == "gzip"


def test_sniff_fuzz_never_raises():
    rng = np.random.default_rng(13)
    for _ in range(300):
        n = int(rng.integers(0, 64))
        out = sniff_compression(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        assert out is None or isinstance(out, str)


def test_multi_member_streams_fully_decompress():
    """Concatenated members (parallel writers' routine output) must
    yield the FULL payload — returning member 1 only would silently
    truncate documents."""
    a, b = b"first part " * 100, b"second part " * 100
    assert decompress_payload(gzip.compress(a) + gzip.compress(b)) == a + b
    assert decompress_payload(bz2.compress(a) + bz2.compress(b)) == a + b
    assert decompress_payload(lzma.compress(a) + lzma.compress(b)) == a + b
    # three members, and the bomb cap spans ALL members
    tri = gzip.compress(b"\x00" * (1 << 20)) * 3
    with pytest.raises(ValueError, match="bomb"):
        decompress_payload(tri, max_out=2 << 20)
    assert len(decompress_payload(tri, max_out=4 << 20)) == 3 << 20


def test_trailing_garbage_after_final_member_tolerated():
    a = b"payload " * 50
    blob = gzip.compress(a) + b"\x00\x01junk-not-a-member"
    assert decompress_payload(blob) == a


def test_truncated_stream_raises_not_partial():
    """A truncated stream must FAIL, not return a silent prefix — a
    partially decompressed document poisons dedup (module contract)."""
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    for codec, comp in [
        ("gzip", gzip.compress),
        ("zlib", zlib.compress),
        ("bzip2", bz2.compress),
        ("xz", lzma.compress),
    ]:
        blob = comp(payload)
        cut = blob[: len(blob) // 2]
        with pytest.raises((ValueError, Exception)):
            out = decompress_payload(cut, codec)
            # if no exception surfaced from the codec itself, the
            # truncation guard must have raised — reaching here with a
            # partial prefix is the bug
            raise AssertionError(f"{codec}: returned {len(out)} partial bytes")


def test_truncated_gzip_specifically_raises_truncation():
    payload = np.random.default_rng(3).integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    blob = gzip.compress(payload)
    with pytest.raises(ValueError, match="truncated"):
        decompress_payload(blob[: len(blob) // 2], "gzip")


def test_truncated_blobs_flagged_not_ok(spark):
    payload = np.random.default_rng(5).integers(0, 256, 50_000, dtype=np.uint8).tobytes()
    cut = gzip.compress(payload)[:100]
    df = spark.createDataFrame([(1, bytearray(cut))], "media_id long, data binary")
    row = decompress_blobs(df).collect()[0]
    assert row["ok"] is False and row["data"] is None
