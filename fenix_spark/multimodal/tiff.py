"""TIFF — baseline container walk + UNCOMPRESSED decode, pure stdlib.

Derived from the public TIFF 6.0 specification: a JPEG-style crawl
corpus carries plenty of TIFF (scans, scientific exports), and the
baseline uncompressed profile (compression=1, 8 bits/sample, chunky
planar layout) is raw strip bytes — a REAL decode with no codec
library. Everything else (LZW/Deflate/JPEG-in-TIFF, planar, tiled)
reports its shape through the metadata tier and raises at decode,
keeping the repo's single swap-in convention.

- ``parse_tiff_metadata``: endianness, IFD chain walk (page count),
  first-page width/height/channels/bits/compression/strip layout.
  NEVER raises on malformed bytes (``ok=False`` — fuzz-tested).
- ``decode_tiff``: (h, w) or (h, w, c) uint8 from strip data.
- ``encode_tiff``: minimal single-strip little-endian writer — the
  round-trip partner for tests and planted corpora.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

_COMPRESSION_NAMES = {
    1: "none",
    2: "ccitt_g3_1d",
    3: "ccitt_g3",
    4: "ccitt_g4",
    5: "lzw",
    6: "old_jpeg",
    7: "jpeg",
    8: "deflate",
    32773: "packbits",
}


def _read_entries(data: bytes, off: int, fmt: str) -> tuple[dict, int]:
    """One IFD at ``off`` → ({tag: [values]}, next_ifd_offset)."""
    (n,) = struct.unpack_from(fmt + "H", data, off)
    entries: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(fmt + "HHI", data, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        total = size * count
        voff = base + 8 if total <= 4 else struct.unpack_from(fmt + "I", data, base + 8)[0]
        if voff + total > len(data):
            continue
        if typ == 3:
            vals = list(struct.unpack_from(f"{fmt}{count}H", data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(f"{fmt}{count}I", data, voff))
        elif typ == 1:
            vals = list(data[voff : voff + count])
        else:
            vals = []
        entries[tag] = vals
    (nxt,) = struct.unpack_from(fmt + "I", data, off + 2 + 12 * n)
    return entries, nxt


def parse_tiff_metadata(data: bytes) -> dict:
    """Header + IFD-chain walk; never raises on garbage."""
    out: dict = {
        "ok": False,
        "byte_order": None,
        "n_pages": 0,
        "width": None,
        "height": None,
        "channels": None,
        "bits_per_sample": None,
        "compression": None,
        "n_strips": None,
    }
    try:
        if len(data) < 8 or data[:2] not in (b"II", b"MM"):
            return out
        fmt = "<" if data[:2] == b"II" else ">"
        (magic,) = struct.unpack_from(fmt + "H", data, 2)
        if magic != 42:
            return out
        out["byte_order"] = "little" if fmt == "<" else "big"
        (off,) = struct.unpack_from(fmt + "I", data, 4)
        first = None
        seen = set()
        while off and off + 6 <= len(data) and off not in seen and out["n_pages"] < 1000:
            seen.add(off)
            entries, off = _read_entries(data, off, fmt)
            out["n_pages"] += 1
            if first is None:
                first = entries
        if not out["n_pages"] or first is None:
            return out
        out["width"] = (first.get(_TAG_WIDTH) or [None])[0]
        out["height"] = (first.get(_TAG_HEIGHT) or [None])[0]
        out["channels"] = (first.get(_TAG_SAMPLES) or [1])[0]
        bits = first.get(_TAG_BITS) or [1]
        out["bits_per_sample"] = bits[0]
        comp = (first.get(_TAG_COMPRESSION) or [1])[0]
        out["compression"] = _COMPRESSION_NAMES.get(comp, str(comp))
        out["n_strips"] = len(first.get(_TAG_STRIP_OFFSETS) or [])
        out["ok"] = out["width"] is not None and out["height"] is not None
    except Exception:  # noqa: BLE001 - malformed bytes: partial out
        pass
    return out


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline uncompressed 8-bit chunky TIFF → (h, w) gray or
    (h, w, c) uint8. Compressed/planar/tiled variants raise — their
    SHAPE still reports through parse_tiff_metadata."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF (bad byte-order mark)")
    fmt = "<" if data[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(fmt + "H", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    (off,) = struct.unpack_from(fmt + "I", data, 4)
    if off + 6 > len(data):
        raise ValueError("tiff: truncated IFD")
    entries, _ = _read_entries(data, off, fmt)
    w = (entries.get(_TAG_WIDTH) or [0])[0]
    h = (entries.get(_TAG_HEIGHT) or [0])[0]
    c = (entries.get(_TAG_SAMPLES) or [1])[0]
    bits = entries.get(_TAG_BITS) or [8]
    comp = (entries.get(_TAG_COMPRESSION) or [1])[0]
    planar = (entries.get(_TAG_PLANAR) or [1])[0]
    if comp != 1:
        raise NotImplementedError(
            f"tiff compression {_COMPRESSION_NAMES.get(comp, comp)!r} needs a "
            "codec; only baseline uncompressed decodes here"
        )
    if planar != 1:
        raise NotImplementedError("tiff planar layout unsupported (chunky only)")
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"tiff bits-per-sample {bits} unsupported (8 only)")
    if not (0 < w <= 65535 and 0 < h <= 65535 and 1 <= c <= 8):
        raise ValueError(f"tiff: implausible dims {w}x{h}x{c}")
    offsets = entries.get(_TAG_STRIP_OFFSETS) or []
    counts = entries.get(_TAG_STRIP_COUNTS) or []
    if not offsets or len(offsets) != len(counts):
        raise ValueError("tiff: missing strip layout")
    buf = bytearray()
    for o, n in zip(offsets, counts):
        if o + n > len(data):
            raise ValueError("tiff: strip beyond EOF")
        buf += data[o : o + n]
    need = w * h * c
    if len(buf) < need:
        raise ValueError(f"tiff: strips hold {len(buf)} bytes, need {need}")
    img = np.frombuffer(bytes(buf[:need]), np.uint8).reshape(h, w, c)
    return img[..., 0] if c == 1 else img


def encode_tiff(img: np.ndarray) -> bytes:
    """(h, w) gray or (h, w, c≤4) uint8 → minimal little-endian
    single-strip uncompressed TIFF."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_tiff needs (h, w[, c]) uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if not 1 <= c <= 4:
        raise ValueError("encode_tiff supports 1..4 channels")
    pixels = np.ascontiguousarray(img).tobytes()
    # layout: header(8) | pixel strip | BitsPerSample array | IFD
    strip_off = 8
    bits_off = strip_off + len(pixels)
    ifd_off = bits_off + 2 * c
    tags = [
        (_TAG_WIDTH, 4, 1, w),
        (_TAG_HEIGHT, 4, 1, h),
        (
            _TAG_BITS,
            3,
            c,
            8 if c == 1 else bits_off,  # inline when it fits, else offset
        ),
        (_TAG_COMPRESSION, 3, 1, 1),
        (_TAG_PHOTOMETRIC, 3, 1, 1 if c == 1 else 2),
        (_TAG_STRIP_OFFSETS, 4, 1, strip_off),
        (_TAG_SAMPLES, 3, 1, c),
        (_TAG_ROWS_PER_STRIP, 4, 1, h),
        (_TAG_STRIP_COUNTS, 4, 1, len(pixels)),
        (_TAG_PLANAR, 3, 1, 1),
    ]
    if c in (1, 2):
        # BitsPerSample fits inline (≤ 4 bytes) — pack values directly
        tags[2] = (_TAG_BITS, 3, c, 8 if c == 1 else (8 | (8 << 16)))
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += pixels
    out += struct.pack(f"<{c}H", *([8] * c))
    out += struct.pack("<H", len(tags))
    for tag, typ, count, val in sorted(tags):
        out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)
