"""WebP CONTAINER parsing — dimensions/format/features from the RIFF
byte stream with no codec dependency, completing the metadata tier of
the container set (mp4 box tree, mp3 frame walk, and now RIFF/WebP).
Everything derives from the public WebP container spec:

- RIFF layout: ``RIFF <u32le size> WEBP`` then chunks of
  ``<fourcc> <u32le size> <payload>`` padded to even length.
- ``VP8 `` (lossy): 3-byte frame tag; a keyframe then carries the
  start code 0x9d 0x01 0x2a and 14-bit width/height in two u16le.
- ``VP8L`` (lossless): 1-byte signature 0x2f, then a u32le holding
  width−1 (bits 0-13), height−1 (bits 14-27), alpha (bit 28).
- ``VP8X`` (extended): feature flags byte (ICC/alpha/EXIF/XMP/anim)
  + 24-bit little-endian canvas width−1 / height−1.

Pixel decode lives one tier up: lossless (VP8L) payloads decode for
real via ``multimodal/vp8l.py`` (pure Python, golden-tested
byte-identical to libwebp), with the system libwebp as the ctypes
fast path when loadable; lossy VP8 without libwebp remains the one
NotImplementedError (full DCT codec).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_webp_metadata(data: bytes) -> dict:
    """Walk the RIFF chunk list; never raises on malformed bytes
    (``ok=False`` instead). ``format`` is 'lossy' | 'lossless' |
    'extended' (VP8X present; dims are the canvas size)."""
    out: dict = {
        "ok": False,
        "format": None,
        "width": None,
        "height": None,
        "has_alpha": None,
        "animated": None,
        "chunks": [],
    }
    try:
        if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
            return out
        (riff_size,) = struct.unpack_from("<I", data, 4)
        end = min(len(data), 8 + riff_size)
        pos = 12
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body = pos + 8
            if body + size > end:
                break  # truncated chunk: keep what's parsed so far
            out["chunks"].append(fourcc.decode("ascii", "replace").strip())
            if fourcc == b"VP8X" and size >= 10:
                flags = data[body]
                out["format"] = "extended"
                out["has_alpha"] = bool(flags & 0x10)
                out["animated"] = bool(flags & 0x02)
                w = int.from_bytes(data[body + 4 : body + 7], "little") + 1
                h = int.from_bytes(data[body + 7 : body + 10], "little") + 1
                out["width"], out["height"] = w, h
            elif fourcc == b"VP8 " and size >= 10 and out["format"] is None:
                # keyframe start code after the 3-byte frame tag
                if data[body + 3 : body + 6] == b"\x9d\x01\x2a":
                    (w,) = struct.unpack_from("<H", data, body + 6)
                    (h,) = struct.unpack_from("<H", data, body + 8)
                    out["format"] = "lossy"
                    out["width"], out["height"] = w & 0x3FFF, h & 0x3FFF
                    out["has_alpha"] = False
            elif fourcc == b"VP8L" and size >= 5 and out["format"] is None:
                if data[body] == 0x2F:
                    (bits,) = struct.unpack_from("<I", data, body + 1)
                    out["format"] = "lossless"
                    out["width"] = (bits & 0x3FFF) + 1
                    out["height"] = ((bits >> 14) & 0x3FFF) + 1
                    out["has_alpha"] = bool((bits >> 28) & 1)
            pos = body + size + (size & 1)  # chunks pad to even
        out["ok"] = out["format"] is not None
        if out["animated"] is None:
            out["animated"] = False
    except Exception:  # noqa: BLE001 - malformed bytes: partial out
        pass
    return out


def encode_minimal_webp(
    width: int,
    height: int,
    lossless: bool = True,
    with_vp8x: bool = False,
    alpha: bool = False,
) -> bytes:
    """Structurally-valid WebP container (real RIFF framing + real
    VP8L/VP8 headers, stub payload bytes — no encoder) for testing
    the parser and pipeline plumbing, like ``encode_minimal_mp4`` /
    ``encode_silent_mp3``."""
    if lossless:
        bits = (
            ((width - 1) & 0x3FFF)
            | (((height - 1) & 0x3FFF) << 14)
            | ((1 if alpha else 0) << 28)
        )
        payload = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 3
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    else:
        payload = (
            b"\x00\x00\x00"  # frame tag (keyframe, show)
            + b"\x9d\x01\x2a"
            + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
            + b"\x00" * 4
        )
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP"
    if with_vp8x:
        x = (
            bytes([0x10 if alpha else 0x00])
            + b"\x00" * 3
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        body += b"VP8X" + struct.pack("<I", len(x)) + x
    body += chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def webp_metadata(
    df: DataFrame, data_col: str = "data", id_col: str = "media_id"
) -> DataFrame:
    """(id, ok, format, width, height, has_alpha, animated) — parse
    every blob's RIFF chunk list; bytes stay on the executors."""
    import pandas as pd

    schema = (
        "id bigint, ok boolean, format string, width int, height int, "
        "has_alpha boolean, animated boolean"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                m = parse_webp_metadata(bytes(pdf["__data"].iloc[i]))
                rows.append(
                    {
                        "id": pdf["__id"].iloc[i],
                        "ok": m["ok"],
                        "format": m["format"],
                        "width": m["width"],
                        "height": m["height"],
                        "has_alpha": m["has_alpha"],
                        "animated": m["animated"],
                    }
                )
            yield pd.DataFrame(rows)

    src = df.select(
        F.col(id_col).alias("__id"), F.col(data_col).alias("__data")
    )
    return src.mapInPandas(gen, schema)
