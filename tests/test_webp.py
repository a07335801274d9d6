"""WebP container parsing tests: VP8L/VP8/VP8X round-trips, chunk
padding, malformed-input tolerance, and the Spark wrapper."""

from __future__ import annotations

import struct

from fenix_spark.multimodal.webp import (
    encode_minimal_webp,
    parse_webp_metadata,
    webp_metadata,
)


def test_lossless_roundtrip():
    m = parse_webp_metadata(encode_minimal_webp(320, 240, lossless=True))
    assert m["ok"]
    assert m["format"] == "lossless"
    assert (m["width"], m["height"]) == (320, 240)
    assert m["has_alpha"] is False
    assert m["animated"] is False


def test_lossless_alpha_bit():
    m = parse_webp_metadata(
        encode_minimal_webp(16, 16, lossless=True, alpha=True)
    )
    assert m["has_alpha"] is True


def test_lossy_keyframe_dims():
    m = parse_webp_metadata(encode_minimal_webp(640, 480, lossless=False))
    assert m["ok"]
    assert m["format"] == "lossy"
    assert (m["width"], m["height"]) == (640, 480)


def test_vp8x_canvas_precedes_stream_dims():
    blob = encode_minimal_webp(12000, 9000, lossless=True, with_vp8x=True)
    m = parse_webp_metadata(blob)
    assert m["format"] == "extended"  # VP8X claims the container
    assert (m["width"], m["height"]) == (12000, 9000)  # 24-bit canvas
    assert m["chunks"] == ["VP8X", "VP8L"]


def test_odd_chunk_padding_walk():
    # VP8L payload here is 8 bytes (even); craft an odd-sized unknown
    # chunk first and confirm the walk still reaches VP8L
    vp8l = encode_minimal_webp(8, 8, lossless=True)[12:]
    odd = b"META" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    body = b"WEBP" + odd + vp8l
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    m = parse_webp_metadata(blob)
    assert m["ok"]
    assert m["chunks"] == ["META", "VP8L"]


def test_malformed_inputs_never_raise():
    good = encode_minimal_webp(32, 32)
    for blob in (
        b"",
        b"RIFF",
        b"RIFF\x00\x00\x00\x00WEBP",
        b"\xff" * 40,
        good[:-3],  # truncated mid-chunk
        b"RIFF" + struct.pack("<I", 2**31) + good[8:],  # size overrun
    ):
        m = parse_webp_metadata(blob)
        assert isinstance(m, dict)


def test_webp_metadata_over_spark(spark):
    rows = [
        (0, encode_minimal_webp(100, 50, lossless=True)),
        (1, encode_minimal_webp(64, 64, lossless=False)),
        (2, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, data binary")
    got = {r.id: r for r in webp_metadata(df).collect()}
    assert got[0].ok and got[0].format == "lossless"
    assert (got[0].width, got[0].height) == (100, 50)
    assert got[1].format == "lossy"
    assert got[2].ok is False
