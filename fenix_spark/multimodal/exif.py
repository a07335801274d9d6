"""EXIF metadata — the JPEG APP1 segment carries a little TIFF file
(Exif 2.3 spec, itself public): IFD0 with camera make/model/
orientation/datetime plus pointers to the Exif sub-IFD (exposure,
ISO, pixel dims) and the GPS IFD. Crawl pipelines need three things
from it, all covered here:

- ``parse_exif``: never-raise extraction of the useful scalar tags
  from JPEG or raw-TIFF bytes (both byte orders, bounds-checked —
  crawl EXIF is exactly as adversarial as the other containers).
- ``apply_orientation``: the 8 EXIF orientations as numpy dihedral
  transforms — applied BEFORE perceptual hashing, a camera-rotated
  re-upload otherwise defeats dHash near-dup entirely.
- ``image_exif``: the Arrow-batched Spark surface (one row per image,
  typed columns, NULLs for absent tags).

``write_exif_app1`` builds a real APP1 segment (used by the tests to
splice EXIF into the repo's own JPEG encoder output — and usable to
stamp provenance into generated fixtures).
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_exif", "apply_orientation", "image_exif", "write_exif_app1"]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

# tag ids (Exif 2.3 tables 4/7/8)
_ORIENTATION = 274
_MAKE, _MODEL, _DATETIME = 271, 272, 306
_EXIF_IFD, _GPS_IFD = 0x8769, 0x8825
_EXPOSURE, _FNUMBER, _ISO = 33434, 33437, 34855
_DT_ORIGINAL, _FOCAL = 36867, 37386
_PIX_X, _PIX_Y = 40962, 40963


def _read_ifd(data: bytes, off: int, fmt: str) -> tuple[dict, int]:
    """One IFD → ({tag: python value}, next_ifd_offset); skips
    malformed entries instead of raising (crawl EXIF discipline)."""
    if off + 2 > len(data):
        return {}, 0
    (n,) = struct.unpack_from(fmt + "H", data, off)
    if off + 2 + 12 * n + 4 > len(data):
        return {}, 0
    out: dict[int, object] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(fmt + "HHI", data, base)
        size = _TYPE_SIZES.get(typ)
        if size is None or count > len(data):
            continue
        total = size * count
        voff = base + 8 if total <= 4 else struct.unpack_from(fmt + "I", data, base + 8)[0]
        if voff + total > len(data):
            continue
        if typ == 2:  # ASCII, NUL-terminated
            raw = data[voff : voff + count]
            out[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 3:
            vals = struct.unpack_from(f"{fmt}{count}H", data, voff)
            out[tag] = vals[0] if count == 1 else list(vals)
        elif typ == 4:
            vals = struct.unpack_from(f"{fmt}{count}I", data, voff)
            out[tag] = vals[0] if count == 1 else list(vals)
        elif typ == 5:  # unsigned rational
            num, den = struct.unpack_from(fmt + "II", data, voff)
            out[tag] = (num / den) if den else None
        elif typ == 10:  # signed rational
            num, den = struct.unpack_from(fmt + "ii", data, voff)
            out[tag] = (num / den) if den else None
    (nxt,) = struct.unpack_from(fmt + "I", data, off + 2 + 12 * n)
    return out, nxt


def _find_tiff(data: bytes) -> bytes | None:
    """JPEG → the APP1 Exif TIFF blob; raw TIFF passes through."""
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return data
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            return None
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(data):
            return None
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return data[pos + 10 : pos + 2 + seglen]
        if marker == 0xDA:  # scan data — no EXIF past this point
            return None
        pos += 2 + seglen
    return None


def parse_exif(data: bytes) -> dict:
    """Useful EXIF scalars from JPEG or TIFF bytes; ``{}`` when absent
    or malformed — NEVER raises."""
    try:
        tiff = _find_tiff(bytes(data))
        if tiff is None or len(tiff) < 8:
            return {}
        if tiff[:2] == b"II":
            fmt = "<"
        elif tiff[:2] == b"MM":
            fmt = ">"
        else:
            return {}
        (ifd0_off,) = struct.unpack_from(fmt + "I", tiff, 4)
        ifd0, _ = _read_ifd(tiff, ifd0_off, fmt)
        sub: dict = {}
        if isinstance(ifd0.get(_EXIF_IFD), int):
            sub, _ = _read_ifd(tiff, ifd0[_EXIF_IFD], fmt)
        out = {
            "orientation": ifd0.get(_ORIENTATION),
            "make": ifd0.get(_MAKE),
            "model": ifd0.get(_MODEL),
            "datetime": ifd0.get(_DATETIME),
            "datetime_original": sub.get(_DT_ORIGINAL),
            "exposure_time": sub.get(_EXPOSURE),
            "f_number": sub.get(_FNUMBER),
            "focal_length": sub.get(_FOCAL),
            "iso": sub.get(_ISO),
            "pixel_x": sub.get(_PIX_X),
            "pixel_y": sub.get(_PIX_Y),
            "has_gps": isinstance(ifd0.get(_GPS_IFD), int),
        }
        return {k: v for k, v in out.items() if v is not None}
    except Exception:  # noqa: BLE001 - adversarial bytes, never raise
        return {}


def apply_orientation(img: np.ndarray, orientation: int | None) -> np.ndarray:
    """Upright image from a camera-stored one, per the 8 EXIF
    orientation codes (same transforms as PIL's exif_transpose).
    Unknown/absent codes return the input unchanged."""
    o = orientation or 1
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1]
    if o == 5:
        return img.swapaxes(0, 1)
    if o == 6:
        return np.rot90(img, -1)
    if o == 7:
        return img.swapaxes(0, 1)[::-1, ::-1]
    if o == 8:
        return np.rot90(img, 1)
    return img


def image_exif(
    df: DataFrame, id_col: str = "media_id", data_col: str = "data"
) -> DataFrame:
    """One typed row per image payload: the parse_exif fields, NULL
    where absent. Arrow-batched; payload bytes never leave the scan."""
    import pandas as pd

    fields = [
        ("orientation", "Int64"),
        ("make", "string"),
        ("model", "string"),
        ("datetime", "string"),
        ("datetime_original", "string"),
        ("exposure_time", "Float64"),
        ("f_number", "Float64"),
        ("focal_length", "Float64"),
        ("iso", "Int64"),
        ("pixel_x", "Int64"),
        ("pixel_y", "Int64"),
    ]

    def gen(batches):
        for pdf in batches:
            cols: dict[str, list] = {"id": list(pdf["__id"])}
            metas = [parse_exif(bytes(b) if b is not None else b"") for b in pdf["__data"]]
            for name, dtype in fields:
                cols[name] = pd.array([m.get(name) for m in metas], dtype=dtype)
            cols["has_gps"] = [bool(m.get("has_gps", False)) for m in metas]
            yield pd.DataFrame(cols)

    src = df.select(F.col(id_col).alias("__id"), F.col(data_col).alias("__data"))
    return src.mapInPandas(
        gen,
        "id bigint, orientation bigint, make string, model string, "
        "datetime string, datetime_original string, exposure_time double, "
        "f_number double, focal_length double, iso bigint, "
        "pixel_x bigint, pixel_y bigint, has_gps boolean",
    )


def _ascii(v: str) -> bytes:
    return v.encode("ascii") + b"\x00"


def write_exif_app1(
    orientation: int = 1,
    make: str | None = None,
    model: str | None = None,
    datetime_original: str | None = None,
    exposure_time: tuple[int, int] | None = None,
    iso: int | None = None,
    gps: bool = False,
) -> bytes:
    """A real APP1 Exif segment (marker + length + 'Exif\\0\\0' + a
    little-endian TIFF with IFD0 → Exif sub-IFD [→ empty GPS IFD]).
    Splice after the SOI of any JPEG."""
    # assemble (tag, type, count, value-bytes) entries, then lay out
    ifd0: list[tuple[int, int, int, bytes]] = [
        (_ORIENTATION, 3, 1, struct.pack("<H", orientation)),
    ]
    if make:
        ifd0.append((_MAKE, 2, len(_ascii(make)), _ascii(make)))
    if model:
        ifd0.append((_MODEL, 2, len(_ascii(model)), _ascii(model)))
    sub: list[tuple[int, int, int, bytes]] = []
    if datetime_original:
        v = _ascii(datetime_original)
        sub.append((_DT_ORIGINAL, 2, len(v), v))
    if exposure_time:
        sub.append((_EXPOSURE, 5, 1, struct.pack("<II", *exposure_time)))
    if iso is not None:
        sub.append((_ISO, 3, 1, struct.pack("<H", iso)))

    def layout(entries, ifd_off, extra_ptrs):
        """One IFD: returns (ifd_bytes, overflow_bytes); overflow data
        lands immediately after the IFD."""
        entries = sorted(entries + extra_ptrs)
        n = len(entries)
        table = struct.pack("<H", n)
        overflow = b""
        data_off = ifd_off + 2 + 12 * n + 4
        for tag, typ, count, val in entries:
            if len(val) <= 4:
                table += struct.pack("<HHI", tag, typ, count) + val.ljust(4, b"\x00")
            else:
                table += struct.pack("<HHII", tag, typ, count, data_off + len(overflow))
                overflow += val
        table += struct.pack("<I", 0)  # no next IFD
        return table + overflow

    # compute IFD offsets: IFD0 at 8; sub-IFD after IFD0; GPS after sub
    def ifd_size(entries, n_ptrs):
        n = len(entries) + n_ptrs
        return 2 + 12 * n + 4 + sum(len(v) for _, _, _, v in entries if len(v) > 4)

    ifd0_off = 8
    n_ptr0 = 1 + (1 if gps else 0)
    sub_off = ifd0_off + ifd_size(ifd0, n_ptr0)
    gps_off = sub_off + ifd_size(sub, 0)
    ptrs = [(_EXIF_IFD, 4, 1, struct.pack("<I", sub_off))]
    if gps:
        ptrs.append((_GPS_IFD, 4, 1, struct.pack("<I", gps_off)))
    tiff = b"II*\x00" + struct.pack("<I", ifd0_off)
    tiff += layout(ifd0, ifd0_off, ptrs)
    tiff += layout(sub, sub_off, [])
    if gps:
        tiff += layout([], gps_off, [])
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
