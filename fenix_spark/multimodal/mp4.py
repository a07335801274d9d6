"""MP4/ISO-BMFF container metadata parsing — REAL box-structure
parsing with the stdlib (the format is a length-prefixed atom tree;
no codec needed to read it), so video columns get typed metadata
(duration, track count/kinds, resolution, codecs) without decoding a
single frame. Frame DECODE remains the documented codec-library
boundary (``media.decode_payload``); this module is the metadata tier
a curation pipeline actually needs for filtering/bucketing video at
scale (drop sub-second clips, split by resolution, route by codec).

Spec anchors (ISO/IEC 14496-12): box = u32 size + 4cc type (+ u64
largesize when size == 1); ``mvhd`` v0/v1 carries timescale +
duration; ``tkhd`` carries per-track width/height as 16.16 fixed
point; ``hdlr`` the track kind; ``stsd``'s first child 4cc names the
sample entry (codec).

Spark shape: ``video_metadata`` runs the parser in one Arrow-batched
``mapInPandas`` over the binary column — bytes stay executor-side,
output is a small typed struct per row.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex"}


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the sibling boxes in
    [start, end); tolerant of truncation (stops at the first
    malformed/overrunning box rather than raising — crawl data)."""
    off = start
    while off + 8 <= end:
        size, typ = struct.unpack_from(">I4s", data, off)
        body = off + 8
        if size == 1:
            if off + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, off + 8)
            body = off + 16
        elif size == 0:  # box extends to EOF
            size = end - off
        if size < (body - off) or off + size > end:
            return
        yield typ, body, off + size
        off += size


def parse_mp4_metadata(data: bytes) -> dict:
    """Parse one ISO-BMFF blob → dict(ok, brand, duration_s,
    timescale, n_tracks, track_kinds, codecs, width, height).
    Never raises on malformed input: ``ok=False`` with partial
    fields (curation must not die on a bad crawl blob)."""
    out = {
        "ok": False,
        "brand": None,
        "duration_s": None,
        "timescale": None,
        "n_tracks": 0,
        "track_kinds": [],
        "codecs": [],
        "width": None,
        "height": None,
    }

    def walk(start: int, end: int) -> None:
        for typ, b, e in _iter_boxes(data, start, end):
            if typ == b"ftyp" and e - b >= 4:
                out["brand"] = data[b : b + 4].decode("ascii", "replace")
            elif typ == b"mvhd" and e - b >= 20:
                ver = data[b]
                if ver == 1:
                    # v1: u64 creation + u64 modification, then u32
                    # timescale + u64 duration. A TRUNCATED v1 box must
                    # yield no duration — falling back to the v0 layout
                    # would read creation-time bytes as timescale
                    if e - b < 32:
                        continue
                    (ts,) = struct.unpack_from(">I", data, b + 20)
                    (dur,) = struct.unpack_from(">Q", data, b + 24)
                else:
                    ts, dur = struct.unpack_from(">II", data, b + 12)
                out["timescale"] = ts
                if ts:
                    out["duration_s"] = round(dur / ts, 6)
            elif typ == b"tkhd" and e - b >= 84:
                ver = data[b]
                # width/height at the version-fixed spec offsets
                # (body+76 for v0, body+88 for v1; 16.16 fixed point).
                # Reading "the last 8 bytes of the box" instead would
                # misread any tkhd with trailing padding/extensions.
                o = b + (88 if ver else 76)
                if o + 8 <= e:
                    w, h = struct.unpack_from(">II", data, o)
                    if w and h:
                        out["width"] = w >> 16
                        out["height"] = h >> 16
            elif typ == b"hdlr" and e - b >= 12:
                kind = data[b + 8 : b + 12].decode("ascii", "replace")
                out["track_kinds"].append(kind)
            elif typ == b"stsd" and e - b >= 16:
                # full box (4) + entry_count (4) + first entry size (4) + 4cc
                codec = data[b + 12 : b + 16].decode("ascii", "replace")
                out["codecs"].append(codec)
            elif typ == b"trak":
                out["n_tracks"] += 1
                walk(b, e)
            elif typ in _CONTAINERS:
                walk(b, e)

    try:
        walk(0, len(data))
        out["ok"] = out["brand"] is not None or out["timescale"] is not None
    except Exception:  # noqa: BLE001 - malformed crawl bytes: partial out
        pass
    return out


def encode_minimal_mp4(
    duration_s: float,
    timescale: int = 1000,
    width: int = 640,
    height: int = 360,
    codec: str = "avc1",
) -> bytes:
    """A structurally-valid minimal MP4 (ftyp + moov[mvhd,
    trak[tkhd, mdia[hdlr, minf[stbl[stsd]]]]]) for testing the parser
    and exercising pipeline plumbing — no media samples (mdat absent),
    exactly like the synthesized BMP/WAV fixtures."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    dur = int(round(duration_s * timescale))
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # v0 + flags
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    hdlr = box(
        b"hdlr",
        b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00",
    )
    entry = struct.pack(">I", 16) + codec.encode("ascii") + b"\x00" * 8
    stsd = box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
    stbl = box(b"stbl", stsd)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov


def video_metadata(
    df: DataFrame, data_col: str = "data", id_col: str = "id"
) -> DataFrame:
    """(id, ok, brand, duration_s, …) — parse every blob's box tree
    in Arrow batches; bytes never leave the executor. The id column
    keeps ITS OWN type (string keys from the webdataset source work
    as well as bigint ids)."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"id {id_type}, ok boolean, brand string, duration_s double, "
        "timescale bigint, n_tracks int, track_kinds array<string>, "
        "codecs array<string>, width int, height int"
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf["id"], pdf[data_col]):
                m = parse_mp4_metadata(bytes(blob) if blob is not None else b"")
                rows.append({"id": rid, **m})
            yield pd.DataFrame(rows)

    from pyspark.sql import functions as F

    return df.select(F.col(id_col).alias("id"), data_col).mapInPandas(gen, schema)
