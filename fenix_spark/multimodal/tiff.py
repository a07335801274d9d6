"""TIFF codec — container walk + strip/tile decode, pure stdlib+numpy.

Derived from the public TIFF 6.0 specification. The r11 revision
retires most of the old NotImplementedError surface with REAL,
library-free decodes:

- compression: none (1), LZW (5 — the TIFF flavor: MSB-first,
  early code-width change; implemented here, not borrowed from gif's
  LSB-first LZW), Deflate (8/32946 — stdlib zlib), PackBits (32773),
  and JPEG-in-TIFF (7 — each strip/tile is a JFIF stream decoded by
  multimodal/jpeg.py, shared JPEGTables honored);
- layout: strips AND tiles (TileWidth/TileLength/TileOffsets),
  chunky AND planar (PlanarConfiguration=2) sample organization;
- horizontal predictor (317 = 2), the default companion of LZW and
  Deflate files, and (r12) the FLOATING-POINT predictor (317 = 3,
  TIFF Technical Note 3): MSB-first byte-plane split + stride byte
  differencing per scanline, byte-stream pinned against an
  independent loop-written reference encoder in tests;
- sample types u8/u16/i16/u32/f32 (SampleFormat honored), any layout
  × compression combination, native-endian results from II or MM.

Still raising by name: CCITT fax codings (their Huffman code BOOKS
are tabulated constants from T.4/T.6 with no independent
implementation in the image to verify against) — the honest swap-in
boundary.

- ``parse_tiff_metadata``: endianness, IFD chain walk (page count),
  first-page width/height/channels/bits/compression/strip layout.
  NEVER raises on malformed bytes (``ok=False`` — fuzz-tested).
- ``decode_tiff``: (h, w) or (h, w, c) uint8 from strip/tile data.
- ``encode_tiff``: little-endian writer for every decodable layout
  (compression=/planar=/predictor=/tile= knobs) — the round-trip
  partner for tests and planted corpora.
"""

from __future__ import annotations

import struct
import zlib

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
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_JPEG_TABLES = 347

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


# ------------------------------------------------- compression primitives


def _packbits_decode(data: bytes) -> bytes:
    """TIFF 6.0 PackBits RLE (Apple flavor)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i < n:
                out += bytes([data[i]]) * (257 - b)
                i += 1
        # b == 128: noop
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find a repeat run
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:  # run of length j-i+1 >= 2
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
            continue
        # literal stretch until the next >=3 repeat (2-runs aren't worth
        # breaking a literal for)
        j = i
        while (
            j + 1 <= n
            and j - i < 127
            and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-flavor LZW (spec section 13): MSB-first bit packing,
    ClearCode=256, EOI=257, EARLY code-width change (at table sizes
    511/1023/2047) — both points where it differs from GIF's LZW."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = n_acc = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        n_acc += 8
        while n_acc >= width:
            code = (acc >> (n_acc - width)) & ((1 << width) - 1)
            n_acc -= width
            if code == 256:  # Clear
                reset()
                prev = None
                continue
            if code == 257:  # EOI
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("tiff lzw: code beyond table")
            out += entry
            prev = entry
            # early change: width bumps when the NEXT code could overflow
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW encoder (the decoder's round-trip partner)."""
    out = _BitPackerMSB()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out.write(256, width)  # leading Clear, per spec
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        out.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # early change mirrors the decoder
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: Clear and restart
            out.write(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        out.write(table[cur], width)
    out.write(257, width)  # EOI
    return out.flush()


class _BitPackerMSB:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.n += width
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = self.n = 0
        return bytes(self.buf)


def _decompress(chunk: bytes, comp: int, jpeg_tables: bytes | None) -> bytes:
    if comp == 1:
        return chunk
    if comp in (8, 32946):  # Deflate (Adobe) / Deflate (old code)
        return zlib.decompress(chunk)
    if comp == 32773:
        return _packbits_decode(chunk)
    if comp == 5:
        return _lzw_decode(chunk)
    if comp == 7:  # JPEG-in-TIFF: each chunk is a JFIF/abbreviated stream
        from fenix_spark.multimodal.jpeg import decode_jpeg

        if jpeg_tables and chunk[:2] == b"\xff\xd8" and b"\xff\xdb" not in chunk[:64]:
            # abbreviated stream: splice the shared tables (sans their
            # own SOI/EOI) after this chunk's SOI
            tables = jpeg_tables
            if tables[:2] == b"\xff\xd8":
                tables = tables[2:]
            if tables[-2:] == b"\xff\xd9":
                tables = tables[:-2]
            chunk = chunk[:2] + tables + chunk[2:]
        img = decode_jpeg(chunk)
        return np.ascontiguousarray(img).tobytes()
    raise NotImplementedError(
        f"tiff compression {_COMPRESSION_NAMES.get(comp, comp)!r} needs a "
        "tabulated code book (CCITT) — not decodable here"
    )


def _undo_predictor(rows: np.ndarray) -> np.ndarray:
    """Horizontal differencing predictor (tag 317 = 2): cumulative sum
    along the row per sample channel, modulo 2^bits. ``rows`` is
    (n_rows, width, channels) of an unsigned integer dtype."""
    return np.cumsum(rows.astype(np.uint64), axis=1).astype(rows.dtype)


def _undo_float_predictor(
    raw: bytes, n_rows: int, width: int, spp: int, dtype: np.dtype
) -> np.ndarray:
    """Floating-point predictor (tag 317 = 3, TIFF Technical Note 3):
    per scanline the encoder (a) splits every sample into bytes and
    regroups them into byte PLANES, most-significant plane first —
    regardless of the file's byte order — then (b) applies byte-wise
    horizontal differencing with stride = samples-per-pixel as ONE
    continuous run over the whole reordered row (plane boundaries are
    crossed, same as predictor 2's per-channel stride walk). Decode
    inverts: stride cumulative sum mod 256, then byte-plane transpose
    back into big-endian floats. Returns (n_rows, width, spp)."""
    k = dtype.itemsize
    rowbytes = width * spp * k
    need = n_rows * rowbytes
    b = np.frombuffer(raw[:need].ljust(need, b"\0"), np.uint8).reshape(
        n_rows, rowbytes
    )
    # stride accumulation: column j of the (rowbytes/spp, spp) view is
    # one stride-walk; cumsum in uint64 then cast back = mod 256
    acc = np.cumsum(
        b.reshape(n_rows, rowbytes // spp, spp), axis=1, dtype=np.uint64
    ).astype(np.uint8)
    planes = acc.reshape(n_rows, k, width * spp)
    be = np.ascontiguousarray(np.transpose(planes, (0, 2, 1)))
    return np.frombuffer(be.tobytes(), dtype.newbyteorder(">")).reshape(
        n_rows, width, spp
    )


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF → (h, w) gray or (h, w, c), native-endian. Sample types:
    uint8/uint16/int16/uint32 and float32 (SampleFormat=3). Decodes
    uncompressed, LZW, Deflate, PackBits and JPEG-in-TIFF chunks,
    strip or tile layout, chunky or planar organization, with the
    horizontal predictor (2, unsigned samples) and the floating-point
    predictor (3, float samples — TechNote 3). CCITT codings and other
    sample types raise by name; shape still reports through
    parse_tiff_metadata."""
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
    predictor = (entries.get(_TAG_PREDICTOR) or [1])[0]
    sfmt = (entries.get(_TAG_SAMPLE_FORMAT) or [1])[0]
    if len(set(bits)) != 1:
        raise NotImplementedError(f"tiff mixed bits-per-sample {bits}")
    b0 = bits[0]
    if (b0, sfmt) == (8, 1):
        dtype = np.dtype("u1")
    elif (b0, sfmt) == (16, 1):
        dtype = np.dtype(fmt + "u2")
    elif (b0, sfmt) == (16, 2):
        dtype = np.dtype(fmt + "i2")
    elif (b0, sfmt) == (32, 1):
        dtype = np.dtype(fmt + "u4")
    elif (b0, sfmt) == (32, 3):
        dtype = np.dtype(fmt + "f4")
    else:
        raise NotImplementedError(
            f"tiff bits-per-sample {bits} / sample-format {sfmt} unsupported "
            "(u8/u16/i16/u32/f32 only)"
        )
    itemsize = dtype.itemsize
    if predictor not in (1, 2, 3):
        raise NotImplementedError(f"tiff predictor {predictor} (1/2/3 only)")
    if predictor == 2 and dtype.kind != "u":
        raise NotImplementedError(
            "tiff horizontal predictor (2) is defined for unsigned integer "
            "samples; floating-point data uses predictor 3"
        )
    if predictor == 3 and dtype.kind != "f":
        raise NotImplementedError(
            "tiff floating-point predictor (3) on non-float samples"
        )
    if comp == 7 and b0 != 8:
        raise NotImplementedError("jpeg-in-tiff is 8-bit only")
    if not (0 < w <= 65535 and 0 < h <= 65535 and 1 <= c <= 8):
        raise ValueError(f"tiff: implausible dims {w}x{h}x{c}")
    jpeg_tables = None
    if _TAG_JPEG_TABLES in entries:
        jpeg_tables = bytes(entries[_TAG_JPEG_TABLES])

    def chunk_bytes(o: int, n: int) -> bytes:
        if o + n > len(data):
            raise ValueError("tiff: strip/tile beyond EOF")
        return data[o : o + n]

    tiled = _TAG_TILE_OFFSETS in entries
    # each PLANE decodes independently; chunky is the 1-plane-of-c case
    n_planes = c if planar == 2 else 1
    spp = 1 if planar == 2 else c  # samples per pixel within a chunk
    planes: list[np.ndarray] = []

    if tiled:
        tw = (entries.get(_TAG_TILE_WIDTH) or [0])[0]
        tl = (entries.get(_TAG_TILE_LENGTH) or [0])[0]
        offs = entries.get(_TAG_TILE_OFFSETS) or []
        cnts = entries.get(_TAG_TILE_COUNTS) or []
        if not tw or not tl or len(offs) != len(cnts):
            raise ValueError("tiff: missing tile layout")
        tiles_x = -(-w // tw)
        tiles_y = -(-h // tl)
        per_plane = tiles_x * tiles_y
        if len(offs) != per_plane * n_planes:
            raise ValueError("tiff: tile count mismatch")
        for p in range(n_planes):
            plane = np.zeros((tiles_y * tl, tiles_x * tw, spp), dtype)
            for t in range(per_plane):
                raw = _decompress(
                    chunk_bytes(offs[p * per_plane + t], cnts[p * per_plane + t]),
                    comp, jpeg_tables,
                )
                if predictor == 3:
                    tile = _undo_float_predictor(raw, tl, tw, spp, dtype)
                else:
                    need = tl * tw * spp * itemsize
                    tile = np.frombuffer(raw[:need].ljust(need, b"\0"), dtype)
                    tile = tile.reshape(tl, tw, spp)
                    if predictor == 2:
                        tile = _undo_predictor(tile)
                ty, tx = divmod(t, tiles_x)
                plane[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = tile
            planes.append(plane[:h, :w])
    else:
        offs = entries.get(_TAG_STRIP_OFFSETS) or []
        cnts = entries.get(_TAG_STRIP_COUNTS) or []
        if not offs or len(offs) != len(cnts):
            raise ValueError("tiff: missing strip layout")
        rps = (entries.get(_TAG_ROWS_PER_STRIP) or [h])[0] or h
        strips_per_plane = -(-h // rps)
        if planar == 2 and len(offs) != strips_per_plane * n_planes:
            raise ValueError("tiff: planar strip count mismatch")
        for p in range(n_planes):
            rows_out: list[np.ndarray] = []
            for s in range(strips_per_plane if planar == 2 else len(offs)):
                idx = p * strips_per_plane + s if planar == 2 else s
                raw = _decompress(chunk_bytes(offs[idx], cnts[idx]), comp, jpeg_tables)
                n_rows = min(rps, h - s * rps)
                need = n_rows * w * spp * itemsize
                if len(raw) < need:
                    raise ValueError(
                        f"tiff: strip holds {len(raw)} bytes, need {need}"
                    )
                if predictor == 3:
                    rows = _undo_float_predictor(raw, n_rows, w, spp, dtype)
                else:
                    rows = np.frombuffer(raw[:need], dtype).reshape(n_rows, w, spp)
                    if predictor == 2:
                        rows = _undo_predictor(rows)
                rows_out.append(rows)
            planes.append(np.concatenate(rows_out, axis=0)[:h])
    if planar == 2:
        img = np.concatenate(planes, axis=2)
    else:
        img = planes[0]
    img = np.ascontiguousarray(img.astype(dtype.newbyteorder("="), copy=False))
    return img[..., 0] if c == 1 else img


_COMPRESSION_CODES = {"none": 1, "lzw": 5, "jpeg": 7, "deflate": 8, "packbits": 32773}


def _apply_predictor(rows: np.ndarray) -> np.ndarray:
    """Horizontal differencing (mod 2^bits) along the row per channel —
    the encoder inverse of :func:`_undo_predictor`."""
    diffs = (rows[:, 1:].astype(np.int64) - rows[:, :-1].astype(np.int64)).astype(rows.dtype)
    return np.concatenate([rows[:, :1], diffs], axis=1)


def _apply_float_predictor(rows: np.ndarray) -> bytes:
    """Encoder inverse of :func:`_undo_float_predictor`: big-endian
    byte-plane split (MSB plane first) then stride byte differencing,
    per scanline. ``rows`` is (n_rows, width, spp) float."""
    n_rows, width, spp = rows.shape
    k = rows.dtype.itemsize
    be = np.ascontiguousarray(rows.astype(rows.dtype.newbyteorder(">")))
    b = np.frombuffer(be.tobytes(), np.uint8).reshape(n_rows, width * spp, k)
    planes = np.transpose(b, (0, 2, 1)).reshape(n_rows, width * spp * k)
    m = planes.reshape(n_rows, (width * spp * k) // spp, spp).astype(np.int16)
    d = np.concatenate([m[:, :1], m[:, 1:] - m[:, :-1]], axis=1).astype(np.uint8)
    return np.ascontiguousarray(d).tobytes()


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    planar: bool = False,
    predictor: bool = False,
    rows_per_strip: int | None = None,
    tile: int | None = None,
) -> bytes:
    """(h, w) gray or (h, w, c≤4) uint8 → little-endian TIFF in any
    layout ``decode_tiff`` reads: strips (``rows_per_strip``) or
    square ``tile``s, chunky or ``planar`` organization,
    ``compression`` in none/lzw/deflate/packbits, optional horizontal
    ``predictor``. The round-trip partner for tests and planted
    corpora."""
    _SFMT = {"u": 1, "i": 2, "f": 3}
    if img.ndim not in (2, 3) or img.dtype not in (
        np.uint8, np.uint16, np.int16, np.uint32, np.float32,
    ):
        raise ValueError(
            "encode_tiff needs (h, w[, c]) of u8/u16/i16/u32/f32"
        )
    img = np.ascontiguousarray(img, dtype=img.dtype.newbyteorder("<"))
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if not 1 <= c <= 4:
        raise ValueError("encode_tiff supports 1..4 channels")
    comp = _COMPRESSION_CODES.get(compression)
    if comp is None:
        raise ValueError(f"compression {compression!r} not in {sorted(_COMPRESSION_CODES)}")
    if comp == 7 and (predictor or planar or c == 2 or img.dtype != np.uint8):
        raise ValueError(
            "jpeg-in-tiff chunks are chunky 1/3-channel uint8, no predictor"
        )
    if predictor and img.dtype.kind not in ("u", "f"):
        raise ValueError(
            "the horizontal predictor needs unsigned samples (float "
            "samples take the floating-point predictor, tag value 3)"
        )

    def pack(chunk_rows: np.ndarray) -> bytes:
        if comp == 7:  # each chunk is its own JFIF stream (lossy)
            from fenix_spark.multimodal.jpeg import encode_jpeg

            arr = chunk_rows[..., 0] if chunk_rows.shape[2] == 1 else chunk_rows
            return encode_jpeg(arr, quality=90)
        if predictor and chunk_rows.dtype.kind == "f":
            raw = _apply_float_predictor(chunk_rows)
        else:
            if predictor:
                chunk_rows = _apply_predictor(chunk_rows)
            raw = np.ascontiguousarray(chunk_rows).tobytes()
        if comp == 1:
            return raw
        if comp == 5:
            return _lzw_encode(raw)
        if comp == 8:
            return zlib.compress(raw)
        return _packbits_encode(raw)

    planes = [img[:, :, p : p + 1] for p in range(c)] if planar else [img]
    chunks: list[bytes] = []
    tags_extra: list[tuple[int, int, int, int | list[int]]] = []
    if tile:
        tiles_x, tiles_y = -(-w // tile), -(-h // tile)
        for plane in planes:
            padded = np.zeros((tiles_y * tile, tiles_x * tile, plane.shape[2]), plane.dtype)
            padded[:h, :w] = plane
            for t in range(tiles_y * tiles_x):
                ty, tx = divmod(t, tiles_x)
                chunks.append(
                    pack(padded[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile])
                )
        tags_extra += [
            (_TAG_TILE_WIDTH, 4, 1, tile),
            (_TAG_TILE_LENGTH, 4, 1, tile),
            (_TAG_TILE_OFFSETS, 4, len(chunks), None),   # filled below
            (_TAG_TILE_COUNTS, 4, len(chunks), None),
        ]
    else:
        rps = rows_per_strip or h
        for plane in planes:
            for s in range(-(-h // rps)):
                chunks.append(pack(plane[s * rps : s * rps + rps]))
        tags_extra += [
            (_TAG_ROWS_PER_STRIP, 4, 1, rps),
            (_TAG_STRIP_OFFSETS, 4, len(chunks), None),
            (_TAG_STRIP_COUNTS, 4, len(chunks), None),
        ]

    # layout: header(8) | chunks | external arrays | IFD
    pos = 8
    offsets = []
    for ch in chunks:
        offsets.append(pos)
        pos += len(ch)
    counts = [len(ch) for ch in chunks]
    external = bytearray()

    def arr_value(values: list[int], typ: int) -> int | list[int]:
        """Inline when it fits in 4 bytes, else append to the external
        area and return its offset (resolved against ``pos``)."""
        size = {3: 2, 4: 4}[typ]
        if len(values) * size <= 4:
            # little-endian inline packing
            v = 0
            for i, x in enumerate(values):
                v |= x << (8 * size * i)
            return v
        off = pos + len(external)
        external.extend(struct.pack(f"<{len(values)}{'H' if typ == 3 else 'I'}", *values))
        return off

    nbits = img.dtype.itemsize * 8
    tags: list[tuple[int, int, int, int]] = [
        (_TAG_WIDTH, 4, 1, w),
        (_TAG_HEIGHT, 4, 1, h),
        (_TAG_BITS, 3, c, arr_value([nbits] * c, 3)),
        (_TAG_COMPRESSION, 3, 1, comp),
        (_TAG_PHOTOMETRIC, 3, 1, 1 if c == 1 else 2),
        (_TAG_SAMPLES, 3, 1, c),
        (_TAG_PLANAR, 3, 1, 2 if planar else 1),
    ]
    if img.dtype.kind != "u":
        tags.append(
            (_TAG_SAMPLE_FORMAT, 3, c, arr_value([_SFMT[img.dtype.kind]] * c, 3))
        )
    if predictor:
        tags.append((_TAG_PREDICTOR, 3, 1, 3 if img.dtype.kind == "f" else 2))
    for tag, typ, count, val in tags_extra:
        if val is None:
            vals = offsets if tag in (_TAG_TILE_OFFSETS, _TAG_STRIP_OFFSETS) else counts
            val = arr_value(vals, typ)
        tags.append((tag, typ, count, val))

    ifd_off = pos + len(external)
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    for ch in chunks:
        out += ch
    out += external
    out += struct.pack("<H", len(tags))
    for tag, typ, count, val in sorted(tags):
        out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)
