"""GIF (87a/89a) — container metadata + full first-frame decode,
pure stdlib, from the public GIF specification.

GIF is palette + LZW with variable code width — self-contained, no
codec library. The decoder handles the global/local color tables,
interlacing (the 4-pass row shuffle), and the 89a graphic-control
transparency index (output becomes RGBA when set). Animation decodes
the FIRST frame (the thumbnail/dedup-relevant one); frame count and
animation flags report through the metadata tier.

- ``parse_gif_metadata``: version, canvas dims, frame count,
  animation/loop detection. NEVER raises on malformed bytes.
- ``decode_gif``: (h, w, 3) RGB or (h, w, 4) RGBA uint8 first frame.
- ``encode_gif``: minimal non-animated GIF87a writer (≤256 distinct
  colors, full LZW with code-width growth and dictionary reset) —
  the round-trip partner for tests and planted corpora.
"""

from __future__ import annotations

import struct

import numpy as np


def _skip_blocks(data: bytes, pos: int) -> int:
    """Skip a sub-block chain; returns position after the terminator."""
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n
    return pos


def parse_gif_metadata(data: bytes) -> dict:
    out: dict = {
        "ok": False,
        "version": None,
        "width": None,
        "height": None,
        "n_frames": 0,
        "animated": False,
        "has_transparency": False,
        "has_global_palette": None,
    }
    try:
        if len(data) < 13 or data[:3] != b"GIF" or data[3:6] not in (b"87a", b"89a"):
            return out
        out["version"] = data[3:6].decode()
        w, h, flags = struct.unpack_from("<HHB", data, 6)
        out["width"], out["height"] = w, h
        out["has_global_palette"] = bool(flags & 0x80)
        pos = 13
        if flags & 0x80:
            pos += 3 * (2 << (flags & 7))
        while pos < len(data):
            b = data[pos]
            pos += 1
            if b == 0x3B:  # trailer
                break
            if b == 0x2C:  # image descriptor
                if pos + 9 > len(data):
                    break
                iflags = data[pos + 8]
                pos += 9
                if iflags & 0x80:
                    pos += 3 * (2 << (iflags & 7))
                if pos >= len(data):
                    break
                pos += 1  # LZW min code size
                pos = _skip_blocks(data, pos)
                out["n_frames"] += 1
            elif b == 0x21:  # extension
                if pos >= len(data):
                    break
                label = data[pos]
                pos += 1
                if label == 0xF9 and pos + 2 <= len(data) and data[pos] >= 4:
                    out["has_transparency"] = out["has_transparency"] or bool(
                        data[pos + 1] & 1
                    )
                if label == 0xFF and pos + 12 <= len(data):
                    if data[pos + 1 : pos + 12].startswith(b"NETSCAPE2.0"):
                        out["animated"] = True
                pos = _skip_blocks(data, pos)
            else:
                break  # unknown block: stop the walk, keep what we have
        out["animated"] = out["animated"] or out["n_frames"] > 1
        out["ok"] = out["n_frames"] > 0 or out["width"] is not None
    except Exception:  # noqa: BLE001 - malformed bytes: partial out
        pass
    return out


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    out = bytearray()
    acc = n = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << n
        n += 8
        while n >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            n -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return list(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("gif: invalid LZW code")
            out += entry
            if len(out) > max_pixels:
                raise ValueError("gif: LZW output exceeds frame size")
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    return list(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """First frame → (h, w, 3) RGB, or (h, w, 4) RGBA when the frame
    has a transparency index. Pixels outside the frame rectangle take
    palette entry 0 (background)."""
    if len(data) < 13 or data[:3] != b"GIF" or data[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    if not (0 < w <= 16384 and 0 < h <= 16384):
        raise ValueError("gif: implausible dims")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
        if len(gct) < 3 * n:
            raise ValueError("gif: truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            label = data[pos]
            pos += 1
            if label == 0xF9 and pos + 5 <= len(data) and data[pos] >= 4:
                if data[pos + 1] & 1:
                    transparent = data[pos + 4]
            pos = _skip_blocks(data, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
        if pos + 9 > len(data):
            raise ValueError("gif: truncated image descriptor")
        fx, fy, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
            if len(pal) < 3 * n:
                raise ValueError("gif: truncated local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("gif: no color table")
        if pos >= len(data):
            raise ValueError("gif: truncated frame")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"gif: bad LZW min code size {min_code}")
        chunks = bytearray()
        while pos < len(data):
            n = data[pos]
            pos += 1
            if n == 0:
                break
            chunks += data[pos : pos + n]
            pos += n
        idx = _lzw_decode(min_code, bytes(chunks), fw * fh)
        if len(idx) < fw * fh:
            raise ValueError(f"gif: LZW yielded {len(idx)} of {fw * fh} pixels")
        frame = np.array(idx[: fw * fh], dtype=np.int64).reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = []
            for start, step in _INTERLACE_PASSES:
                order += list(range(start, fh, step))
            deinterlaced = np.empty_like(frame)
            deinterlaced[order] = frame
            frame = deinterlaced
        frame = np.clip(frame, 0, len(pal) - 1)
        canvas = np.zeros((h, w), dtype=np.int64)
        y1, x1 = min(fy + fh, h), min(fx + fw, w)
        canvas[fy:y1, fx:x1] = frame[: y1 - fy, : x1 - fx]
        rgb = pal[canvas]
        if transparent is None:
            return rgb.astype(np.uint8)
        alpha = np.where(canvas == transparent, 0, 255).astype(np.uint8)
        return np.dstack([rgb, alpha]).astype(np.uint8)
    raise ValueError("gif: no image data")


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB with ≤256 distinct colors → GIF87a."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_gif needs (h, w, 3) uint8")
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"encode_gif: {len(colors)} colors > 256 (quantize first)")
    depth = max(1, int(len(colors) - 1).bit_length())
    table_n = 1 << depth
    pal = np.zeros((table_n, 3), np.uint8)
    pal[: len(colors)] = colors
    out = bytearray()
    out += b"GIF87a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, depth)
    out.append(min_code)
    out += _lzw_encode(min_code, idx.astype(np.int64).tolist())
    out += b"\x00\x3b"
    return bytes(out)


def _lzw_encode(min_code_size: int, pixels: list[int]) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1

    bits = bytearray()
    acc = n = 0

    def emit(code: int, size: int):
        nonlocal acc, n
        acc |= code << n
        n += size
        while n >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    run = b""
    for p in pixels:
        cand = run + bytes([p])
        if cand in table:
            run = cand
            continue
        emit(table[run], code_size)
        if next_code < 4096:
            table[cand] = next_code
            # GIF writers grow the code width when the NEXT code would
            # not fit; decoders mirror this exactly
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        run = bytes([p])
    if run:
        emit(table[run], code_size)
    emit(end, code_size)
    if n:
        bits.append(acc & 0xFF)
    # wrap in ≤255-byte sub-blocks
    out = bytearray()
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out.append(len(chunk))
        out += chunk
    return bytes(out)
