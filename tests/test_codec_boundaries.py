"""The named codec-boundary envelope, pinned in ONE place (VERDICT r11
#8): every format gap that remains in the multimodal tier raises
NotImplementedError LOUDLY, naming the boundary — never a silent stub,
never a wrong decode. Each test here is the contract that keeps a
boundary honest until a codec lib exists in the image (or the format
is closed with spec-derived work, as progressive JPEG was in r11 and
the TIFF floating-point predictor in r12).

Current envelope (everything else decodes for real):
- JPEG: 12-bit precision, arithmetic coding (SOF9/SOF10), lossless
  (SOF3 — pinned in test_multimodal).
- TIFF: CCITT fax codings (pinned in test_tiff — their Huffman code
  BOOKS are tabulated T.4/T.6 constants with nothing in the image to
  verify an implementation against).
- WebP: lossy VP8 payload without libwebp (VP8L lossless is real).
- Audio: mp3/flac/ogg PCM decode (mp3 CONTAINER metadata is real).
- Video: h264/vp9/av1 frame-pixel decode (mp4 box tree, sample
  byte-ranges and frame extraction points are real).
- Compression: zstd/lz4 payloads (pinned in test_compress).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest


def _baseline_jpeg():
    from fenix_spark.multimodal.jpeg import encode_jpeg

    rng = np.random.default_rng(3)
    base = rng.integers(40, 200, (2, 2), np.uint8)
    img = np.kron(base, np.ones((8, 8), np.uint8))  # smooth 16x16 gray
    return encode_jpeg(img, quality=90)


def test_jpeg_12bit_precision_raises_by_name():
    from fenix_spark.multimodal.jpeg import decode_jpeg

    good = _baseline_jpeg()
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    # SOF0 body: len(2) precision(1) ... — flip precision 8 -> 12
    bad = bytearray(good)
    assert bad[sof + 4] == 8
    bad[sof + 4] = 12
    with pytest.raises(NotImplementedError, match="precision 12"):
        decode_jpeg(bytes(bad))


def test_jpeg_arithmetic_coding_raises_by_name():
    from fenix_spark.multimodal.jpeg import decode_jpeg

    good = _baseline_jpeg()
    sof = good.find(b"\xff\xc0")
    for marker in (b"\xff\xc9", b"\xff\xca"):  # arithmetic seq/prog
        bad = good[:sof] + marker + good[sof + 2 :]
        with pytest.raises(NotImplementedError, match="SOF marker 0xc"):
            decode_jpeg(bad)


def test_mp3_pcm_decode_is_a_named_boundary():
    from fenix_spark.multimodal.media import decode_audio

    for fmt in ("mp3", "flac", "ogg"):
        with pytest.raises(NotImplementedError, match="no audio codec"):
            decode_audio(b"\xff\xfb\x90\x00" * 8, fmt)


def test_video_frame_decode_is_a_named_boundary():
    from fenix_spark.multimodal.media import decode_payload

    for fmt in ("h264", "vp9", "av1"):
        with pytest.raises(NotImplementedError, match="no codec"):
            decode_payload(b"\x00\x00\x00\x01\x67", fmt, (2, 2, 3))


def _lossy_webp_container() -> bytes:
    # minimal RIFF/WEBP lossy chunk: 3-byte keyframe tag, the 9d 01 2a
    # start code, 14-bit w/h — a VALID header with no coefficient data
    payload = b"\x10\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 2, 2)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_lossy_vp8_without_libwebp_is_a_named_boundary():
    from fenix_spark.multimodal import libwebp
    from fenix_spark.multimodal.media import decode_payload

    if libwebp.available():  # pragma: no cover - image has no libwebp
        pytest.skip("libwebp present: lossy VP8 decodes for real here")
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        decode_payload(_lossy_webp_container(), "webp", ())


def test_boundary_raises_never_leak_from_metadata_tier():
    """The metadata parsers must stay TOTAL (ok=False, not raises) even
    for formats whose payload decode is a boundary — a 100 TB scan
    cannot afford one malformed file killing a task."""
    from fenix_spark.multimodal.mp3 import parse_mp3_metadata
    from fenix_spark.multimodal.webp import parse_webp_metadata

    assert parse_webp_metadata(_lossy_webp_container())["format"] == "lossy"
    assert parse_mp3_metadata(b"\x00\x01garbage")["ok"] is False
    assert parse_webp_metadata(b"nonsense")["ok"] is False
