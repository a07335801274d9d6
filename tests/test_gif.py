"""GIF codec tests: LZW round-trips across palette sizes (code-width
growth + dictionary reset), metadata walk, a THIRD-PARTY fixture
cross-checked against the independent PPM of the same image (within
palette quantization), transparency→RGBA, and parser fuzz."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from fenix_spark.multimodal.gif import (
    decode_gif,
    encode_gif,
    parse_gif_metadata,
)

_FIXTURE_DIRS = glob.glob("/root/.pyenv/versions/*/lib/python3.11/test/imghdrdata")


def _pal_image(rng, n_colors, shape):
    lut = np.unique(rng.integers(0, 256, (n_colors, 3), dtype=np.uint8), axis=0)
    return lut[rng.integers(0, len(lut), shape)]


def test_roundtrip_palette_sizes():
    rng = np.random.default_rng(0)
    for n_colors, shape in [(2, (13, 17)), (7, (9, 30)), (250, (40, 41)), (256, (20, 20)), (1, (5, 5))]:
        img = _pal_image(rng, n_colors, shape)
        blob = encode_gif(img)
        assert np.array_equal(decode_gif(blob), img)
        m = parse_gif_metadata(blob)
        assert m["ok"] and (m["width"], m["height"]) == (shape[1], shape[0])
        assert m["n_frames"] == 1 and not m["animated"]


def test_lzw_dictionary_reset_on_large_noisy_image():
    """>4096 dictionary entries forces the encoder's clear-code reset
    path; the decoder must follow."""
    rng = np.random.default_rng(2)
    img = _pal_image(rng, 256, (120, 130))
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_third_party_fixture_close_to_independent_ppm():
    """python.gif decodes within palette-quantization distance of the
    truecolor PPM of the same logo (the GIF was quantized by whoever
    authored it — exactness is impossible, closeness is the check)."""
    if not _FIXTURE_DIRS:
        pytest.skip("no stdlib imghdrdata fixtures on this machine")
    base = _FIXTURE_DIRS[0]
    img = decode_gif(open(f"{base}/python.gif", "rb").read())
    parts = open(f"{base}/python.ppm", "rb").read().split(maxsplit=4)
    w, h = int(parts[1]), int(parts[2])
    ppm = np.frombuffer(parts[4][: w * h * 3], np.uint8).reshape(h, w, 3)
    assert img.shape[:2] == (h, w)
    # compare only OPAQUE pixels: under transparency the palette RGB
    # is arbitrary while the PPM shows the flattened background
    mask = img[..., 3] == 255
    assert mask.mean() > 0.4
    d = np.abs(img[..., :3].astype(int) - ppm.astype(int))[mask]
    assert d.mean() < 1.0 and d.max() <= 8
    m = parse_gif_metadata(open(f"{base}/python.gif", "rb").read())
    assert m["ok"] and m["version"] == "89a" and m["has_transparency"]


def test_transparency_yields_rgba():
    """An 89a graphic-control block with a transparent index must
    produce RGBA with alpha 0 exactly at that palette entry."""
    rng = np.random.default_rng(3)
    img = _pal_image(rng, 4, (6, 7))
    blob = bytearray(encode_gif(img))
    # splice a GCE (transparent index 0) before the image descriptor
    at = blob.index(b"\x2c")
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])
    blob = blob[:at] + gce + blob[at:]
    out = decode_gif(bytes(blob))
    assert out.shape == (6, 7, 4)
    # recompute which pixels hold palette entry 0 via the opaque decode
    base = decode_gif(encode_gif(img))
    pal0 = np.unique(img.reshape(-1, 3), axis=0)[0]
    expect0 = (base == pal0).all(axis=2)
    assert np.array_equal(out[..., 3] == 0, expect0)


def test_parser_never_raises_on_garbage():
    rng = np.random.default_rng(4)
    for _ in range(200):
        parse_gif_metadata(bytes(rng.integers(0, 256, int(rng.integers(0, 120)), dtype=np.uint8)))
    base = encode_gif(_pal_image(rng, 9, (8, 8)))
    for _ in range(100):
        m = bytearray(base)
        for _ in range(4):
            m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
        parse_gif_metadata(bytes(m))


def test_malformed_decode_raises_cleanly():
    rng = np.random.default_rng(5)
    base = encode_gif(_pal_image(rng, 9, (8, 8)))
    for _ in range(60):
        m = bytearray(base)
        for _ in range(3):
            m[int(rng.integers(6, len(m)))] = int(rng.integers(0, 256))
        try:
            out = decode_gif(bytes(m))
            assert out.dtype == np.uint8  # mutation may stay valid
        except ValueError:
            pass


def test_decode_payload_integration():
    from fenix_spark.multimodal.media import decode_payload

    rng = np.random.default_rng(6)
    img = _pal_image(rng, 12, (5, 9))
    got = decode_payload(encode_gif(img), "gif", (5, 9, 3))
    assert np.array_equal(got, img)


def test_interlaced_frame_deinterlaces():
    """Hand-build an interlaced GIF: permute rows into the 4-pass
    storage order, encode, flip the interlace flag — decode must
    return the ORIGINAL row order."""
    from fenix_spark.multimodal.gif import _INTERLACE_PASSES

    rng = np.random.default_rng(7)
    img = _pal_image(rng, 16, (19, 11))  # odd height crosses pass bounds
    order = []
    for start, step in _INTERLACE_PASSES:
        order += list(range(start, img.shape[0], step))
    stored = img[order]  # rows as they appear in the stream
    blob = bytearray(encode_gif(stored))
    at = blob.index(b"\x2c")
    blob[at + 9] |= 0x40  # image-descriptor interlace flag
    got = decode_gif(bytes(blob))
    assert np.array_equal(got, img)


def test_system_gif_fixtures_decode():
    """Every GIF shipped with the system pythons must parse and
    decode without raising (real-world variety: transparency,
    different palette depths)."""
    import glob as _glob

    paths = _glob.glob("/root/.pyenv/versions/3.11.7/lib/**/*.gif", recursive=True)
    if not paths:
        pytest.skip("no system gif fixtures")
    decoded = 0
    for path in paths[:20]:
        data = open(path, "rb").read()
        m = parse_gif_metadata(data)
        assert m["ok"], path
        img = decode_gif(data)
        assert img.shape[:2] == (m["height"], m["width"]), path
        decoded += 1
    assert decoded >= 3
