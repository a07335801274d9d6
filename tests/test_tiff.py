"""TIFF codec tests: encoder/decoder round-trips across channel
counts, IFD metadata walk, a THIRD-PARTY fixture cross-checked
pixel-exactly against the independent PPM of the same image, and
malformed-input tolerance for the parser."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from fenix_spark.multimodal.tiff import (
    decode_tiff,
    encode_tiff,
    parse_tiff_metadata,
)

_FIXTURE_DIRS = glob.glob("/root/.pyenv/versions/*/lib/python3.11/test/imghdrdata")


def test_roundtrip_channel_counts():
    rng = np.random.default_rng(0)
    for shape in [(13, 17), (9, 11, 3), (6, 7, 4), (5, 4, 2), (1, 1), (20, 1, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        blob = encode_tiff(img)
        assert np.array_equal(decode_tiff(blob), img)
        m = parse_tiff_metadata(blob)
        c = 1 if img.ndim == 2 else img.shape[2]
        assert (m["ok"], m["width"], m["height"], m["channels"]) == (
            True,
            img.shape[1],
            img.shape[0],
            c,
        )
        assert m["compression"] == "none" and m["n_pages"] == 1


def test_third_party_fixture_matches_independent_ppm():
    """python.tiff (written by a third-party tool) must decode
    pixel-identically to the PPM of the same logo shipped next to it
    — a cross-format golden with no shared code path."""
    if not _FIXTURE_DIRS:
        pytest.skip("no stdlib imghdrdata fixtures on this machine")
    base = _FIXTURE_DIRS[0]
    t = decode_tiff(open(f"{base}/python.tiff", "rb").read())
    parts = open(f"{base}/python.ppm", "rb").read().split(maxsplit=4)
    w, h = int(parts[1]), int(parts[2])
    ppm = np.frombuffer(parts[4][: w * h * 3], np.uint8).reshape(h, w, 3)
    assert t.shape == (h, w, 4)
    assert np.array_equal(t[..., :3], ppm)


def test_compressed_variants_raise_not_implemented():
    img = np.zeros((4, 4, 3), np.uint8)
    blob = bytearray(encode_tiff(img))
    # flip the Compression tag value (type SHORT at its IFD slot) to 5
    i = blob.find((259).to_bytes(2, "little"))
    blob[i + 8] = 5  # lzw
    with pytest.raises(NotImplementedError, match="lzw"):
        decode_tiff(bytes(blob))
    m = parse_tiff_metadata(bytes(blob))
    assert m["ok"] and m["compression"] == "lzw"  # metadata tier still reports


def test_parser_never_raises_on_garbage():
    rng = np.random.default_rng(1)
    for _ in range(200):
        parse_tiff_metadata(bytes(rng.integers(0, 256, int(rng.integers(0, 120)), dtype=np.uint8)))
    base = encode_tiff(np.zeros((6, 6, 3), np.uint8))
    for _ in range(100):
        m = bytearray(base)
        for _ in range(4):
            m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
        parse_tiff_metadata(bytes(m))


def test_decode_payload_integration():
    from fenix_spark.multimodal.media import decode_payload

    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    got = decode_payload(encode_tiff(img), "tiff", (4, 5, 3))
    assert np.array_equal(got, img)
