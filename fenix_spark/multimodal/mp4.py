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
from pyspark.sql import functions as F

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


# ----------------------------------------------------------- samples
# Sample-table extraction: encoded frame BYTE RANGES from pure box
# math (stsz sizes, stco/co64 chunk offsets, stsc chunk mapping, stss
# sync marks) — no codec anywhere. This is the real half of video
# frame sampling: exact per-frame payload access for hashing/dedup of
# encoded frames; pixel DECODE of those payloads remains the
# documented media.decode_payload boundary.


def mp4_sample_ranges(data: bytes) -> list:
    """Per-track sample tables: ``[{kind, codec, samples:
    [(offset, size), ...], sync: set[int] (1-based)}]``. Tolerant of
    truncation — samples whose range overruns the blob are dropped and
    counted in ``clipped``; never raises on crawl garbage."""
    tracks: list[dict] = []

    def trak_tables(s: int, e: int) -> dict:
        t = {"kind": None, "codec": None, "stsz": None, "stco": None,
             "stsc": None, "stss": None}

        def walk(s2: int, e2: int) -> None:
            for typ, b, ee in _iter_boxes(data, s2, e2):
                if typ in _CONTAINERS:
                    walk(b, ee)
                elif typ == b"hdlr" and ee - b >= 12:
                    t["kind"] = data[b + 8 : b + 12].decode("ascii", "replace")
                elif typ == b"stsd" and ee - b >= 16:
                    t["codec"] = data[b + 12 : b + 16].decode("ascii", "replace")
                elif typ == b"stsz" and ee - b >= 12:
                    fixed, count = struct.unpack_from(">II", data, b + 4)
                    if fixed:
                        t["stsz"] = [fixed] * count
                    elif b + 12 + 4 * count <= ee:
                        t["stsz"] = list(
                            struct.unpack_from(f">{count}I", data, b + 12)
                        )
                elif typ == b"stco" and ee - b >= 8:
                    (count,) = struct.unpack_from(">I", data, b + 4)
                    if b + 8 + 4 * count <= ee:
                        t["stco"] = list(
                            struct.unpack_from(f">{count}I", data, b + 8)
                        )
                elif typ == b"co64" and ee - b >= 8:
                    (count,) = struct.unpack_from(">I", data, b + 4)
                    if b + 8 + 8 * count <= ee:
                        t["stco"] = list(
                            struct.unpack_from(f">{count}Q", data, b + 8)
                        )
                elif typ == b"stsc" and ee - b >= 8:
                    (count,) = struct.unpack_from(">I", data, b + 4)
                    if b + 8 + 12 * count <= ee:
                        t["stsc"] = [
                            struct.unpack_from(">III", data, b + 8 + 12 * i)
                            for i in range(count)
                        ]
                elif typ == b"stss" and ee - b >= 8:
                    (count,) = struct.unpack_from(">I", data, b + 4)
                    if b + 8 + 4 * count <= ee:
                        t["stss"] = set(
                            struct.unpack_from(f">{count}I", data, b + 8)
                        )

        walk(s, e)
        return t

    def top(s: int, e: int) -> None:
        for typ, b, ee in _iter_boxes(data, s, e):
            if typ == b"trak":
                tracks.append(trak_tables(b, ee))
            elif typ in _CONTAINERS:
                top(b, ee)

    out: list[dict] = []
    try:
        top(0, len(data))
        for t in tracks:
            sizes, chunks, stsc = t["stsz"], t["stco"], t["stsc"]
            if not sizes or not chunks or not stsc:
                continue
            # samples-per-chunk for chunk i (1-based): the stsc run
            # whose first_chunk is the largest one <= i
            per_chunk: list[int] = []
            runs = sorted(stsc)
            for ci in range(1, len(chunks) + 1):
                spc = 0
                for first, n, _desc in runs:
                    if first <= ci:
                        spc = n
                    else:
                        break
                per_chunk.append(spc)
            samples: list[tuple[int, int]] = []
            clipped = 0
            si = 0
            for ci, coff in enumerate(chunks):
                off = coff
                for _ in range(per_chunk[ci]):
                    if si >= len(sizes):
                        break
                    sz = sizes[si]
                    if off + sz <= len(data):
                        samples.append((off, sz))
                    else:
                        clipped += 1
                    off += sz
                    si += 1
            sync = t["stss"] if t["stss"] is not None else set(
                range(1, len(sizes) + 1)
            )
            out.append(
                {
                    "kind": t["kind"],
                    "codec": t["codec"],
                    "samples": samples,
                    "sync": sync,
                    "clipped": clipped,
                }
            )
    except Exception:  # noqa: BLE001 - malformed crawl bytes
        return out
    return out


def encode_mp4_with_samples(
    samples: list,
    chunking: tuple = (3,),
    sync: tuple = (1,),
    timescale: int = 1000,
    codec: str = "avc1",
    moov_first: bool = False,
) -> bytes:
    """A structurally-valid MP4 CARRYING the given sample payloads
    with real stts/stsc/stsz/stco/stss tables. Default layout is
    ``[ftyp][mdat][moov]`` (chunk offsets known before moov is
    built); ``moov_first=True`` writes the progressive-download
    ("faststart") ``[ftyp][moov][mdat]`` layout — moov is built twice,
    once with dummy offsets to learn its (offset-independent) size.
    ``chunking`` gives samples-per-chunk, last entry repeats;
    ``sync`` lists 1-based sync samples."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = box(b"mdat", b"".join(bytes(s) for s in samples))

    spc_list: list[int] = []
    left = len(samples)
    i = 0
    while left > 0:
        spc = chunking[min(i, len(chunking) - 1)]
        spc = min(spc, left)
        spc_list.append(spc)
        left -= spc
        i += 1

    def offsets_from(pos: int) -> list[int]:
        out, si = [], 0
        for spc in spc_list:
            out.append(pos)
            for _ in range(spc):
                pos += len(samples[si])
                si += 1
        return out

    # stsc runs, compressed: (first_chunk, samples_per_chunk, desc=1)
    runs = []
    for ci, spc in enumerate(spc_list, start=1):
        if not runs or runs[-1][1] != spc:
            runs.append((ci, spc, 1))

    n = len(samples)
    full0 = b"\x00\x00\x00\x00"

    def make_moov(chunk_offsets: list[int]) -> bytes:
        stts = box(
            b"stts",
            full0 + struct.pack(">I", 1) + struct.pack(">II", n, timescale // 25 or 1),
        )
        stsc = box(
            b"stsc",
            full0 + struct.pack(">I", len(runs))
            + b"".join(struct.pack(">III", *r) for r in runs),
        )
        stsz = box(
            b"stsz",
            full0 + struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(bytes(s))) for s in samples),
        )
        stco = box(
            b"stco",
            full0 + struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
        stss = box(
            b"stss",
            full0 + struct.pack(">I", len(sync))
            + b"".join(struct.pack(">I", s) for s in sync),
        )
        entry = struct.pack(">I", 16) + codec.encode("ascii") + b"\x00" * 8
        stsd = box(b"stsd", full0 + struct.pack(">I", 1) + entry)
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
        hdlr = box(b"hdlr", full0 + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr + minf)
        dur = n * (timescale // 25 or 1)
        tkhd = box(
            b"tkhd",
            b"\x00\x00\x00\x07" + struct.pack(">II", 0, 0) + struct.pack(">I", 1)
            + b"\x00" * 4 + struct.pack(">I", dur) + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", 640 << 16, 360 << 16),
        )
        mvhd = box(
            b"mvhd",
            full0 + struct.pack(">II", 0, 0) + struct.pack(">II", timescale, dur)
            + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + b"\x00" * 10
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24 + struct.pack(">I", 2),
        )
        return box(b"moov", mvhd + box(b"trak", tkhd + mdia))

    if moov_first:
        dummy = make_moov(offsets_from(0))
        moov = make_moov(offsets_from(len(ftyp) + len(dummy) + 8))
        assert len(moov) == len(dummy)
        return ftyp + moov + mdat
    moov = make_moov(offsets_from(len(ftyp) + 8))
    return ftyp + mdat + moov


def sample_encoded_frames(
    df: DataFrame,
    id_col: str = "media_id",
    data_col: str = "data",
    every_n: int = 1,
    sync_only: bool = False,
) -> DataFrame:
    """Explode video tracks' ENCODED samples to rows: ``(id, track,
    frame_idx, is_sync, frame binary)`` — every ``every_n``-th sample
    (``sync_only`` keeps keyframes only). Pure byte math in one
    Arrow-batched pass; undecodable blobs emit nothing. The frame
    column feeds exact/fuzzy dedup of encoded frames directly; pixel
    decode of a frame stays the documented codec boundary."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["__id"], pdf["__data"]):
                if blob is None:
                    continue
                data = bytes(blob)
                for ti, tr in enumerate(mp4_sample_ranges(data)):
                    if tr["kind"] != "vide":
                        continue
                    for si, (off, sz) in enumerate(tr["samples"]):
                        is_sync = (si + 1) in tr["sync"]
                        if sync_only and not is_sync:
                            continue
                        if si % every_n:
                            continue
                        rows.append(
                            (int(mid), ti, si, is_sync,
                             bytearray(data[off : off + sz]))
                        )
            yield pd.DataFrame(
                rows, columns=["id", "track", "frame_idx", "is_sync", "frame"]
            )

    src = df.select(F.col(id_col).alias("__id"), F.col(data_col).alias("__data"))
    return src.mapInPandas(
        gen, "id bigint, track int, frame_idx int, is_sync boolean, frame binary"
    )


def video_frame_dedup_pairs(
    frames: DataFrame,
    min_shared_fraction: float = 0.5,
    max_group: int = 1024,
) -> DataFrame:
    """Video pairs sharing ENCODED frames byte-for-byte: ``(id_a,
    id_b, shared_frames, frac_a, frac_b)`` over a
    ``sample_encoded_frames`` output — re-muxed/trimmed re-uploads of
    the same encode share their sample payloads exactly, so an md5
    equi-join finds them with no codec anywhere. Same mega-group
    discipline as the CDC/LSH joins: a frame payload shared by more
    than ``max_group`` videos (black frames, standard padding) is
    dropped from pair generation. Fractions are over DISTINCT frame
    contents per video."""
    hashed = frames.select(
        "id", F.md5(F.col("frame")).alias("fhash")
    ).distinct()
    per_vid = hashed.groupBy("id").agg(F.count(F.lit(1)).alias("n_frames"))
    grp = hashed.groupBy("fhash").agg(F.count(F.lit(1)).alias("grp"))
    sized = hashed.join(grp.where(F.col("grp") <= max_group), "fhash")
    a = sized.select(F.col("id").alias("id_a"), "fhash")
    b = sized.select(F.col("id").alias("id_b"), "fhash")
    pairs = (
        a.join(b, "fhash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_frames"))
    )
    na = per_vid.select(F.col("id").alias("id_a"), F.col("n_frames").alias("na"))
    nb = per_vid.select(F.col("id").alias("id_b"), F.col("n_frames").alias("nb"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("frac_a", F.col("shared_frames") / F.col("na"))
        .withColumn("frac_b", F.col("shared_frames") / F.col("nb"))
        .where(F.greatest("frac_a", "frac_b") >= min_shared_fraction)
        .select("id_a", "id_b", "shared_frames", "frac_a", "frac_b")
    )
