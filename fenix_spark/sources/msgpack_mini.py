"""Minimal msgpack encoder/decoder — just the subset the reference's
Arrow extension-type payloads use (ref: src/fenix/ex/arrow/tensor/
tensor.py:15-23 encodes a shape tuple; quint8/quint8.py:67-80 encodes
``{"shape": tuple, "scale": float, "shift": int}``). Implemented from
the PUBLIC msgpack format specification (msgpack.org); neither the
``msgpack`` nor ``msgspec`` package ships in this environment, and the
payloads are a few dozen bytes, so a dependency would be all cost.

Supported types: None, bool, int (full 64-bit signed/unsigned range),
float (encoded as float64, the msgspec default for Python floats;
float32 accepted on decode), str, bytes, list/tuple, dict with any
supported keys. Everything else raises.
"""

from __future__ import annotations

import struct

__all__ = ["packb", "unpackb"]


def packb(obj) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes((0xD9, n))
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += bytes((0xC4, n))
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += obj
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for v in obj:
            _pack(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"msgpack_mini cannot encode {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v <= 0x7F:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v <= 0xFF:
        out += bytes((0xCC, v))
    elif 0 <= v <= 0xFFFF:
        out.append(0xCD)
        out += struct.pack(">H", v)
    elif 0 <= v <= 0xFFFFFFFF:
        out.append(0xCE)
        out += struct.pack(">I", v)
    elif 0 <= v <= 0xFFFFFFFFFFFFFFFF:
        out.append(0xCF)
        out += struct.pack(">Q", v)
    elif -0x80 <= v < 0:
        out.append(0xD0)
        out += struct.pack(">b", v)
    elif -0x8000 <= v < 0:
        out.append(0xD1)
        out += struct.pack(">h", v)
    elif -0x80000000 <= v < 0:
        out.append(0xD2)
        out += struct.pack(">i", v)
    elif -0x8000000000000000 <= v < 0:
        out.append(0xD3)
        out += struct.pack(">q", v)
    else:
        raise OverflowError(f"int out of msgpack 64-bit range: {v}")


def unpackb(data: bytes):
    if not data:
        raise ValueError("empty msgpack payload")
    obj, pos = _unpack(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes after msgpack value ({len(data) - pos})")
    return obj


def _unpack(mv: memoryview, pos: int):
    b = mv[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0xA0 <= b <= 0xBF:  # fixstr
        n = b & 0x1F
        return bytes(mv[pos : pos + n]).decode("utf-8"), pos + n
    if 0x90 <= b <= 0x9F:  # fixarray
        return _unpack_array(mv, pos, b & 0x0F)
    if 0x80 <= b <= 0x8F:  # fixmap
        return _unpack_map(mv, pos, b & 0x0F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:  # bin8
        n = mv[pos]
        return bytes(mv[pos + 1 : pos + 1 + n]), pos + 1 + n
    if b == 0xC5:  # bin16
        (n,) = struct.unpack_from(">H", mv, pos)
        return bytes(mv[pos + 2 : pos + 2 + n]), pos + 2 + n
    if b == 0xC6:  # bin32
        (n,) = struct.unpack_from(">I", mv, pos)
        return bytes(mv[pos + 4 : pos + 4 + n]), pos + 4 + n
    if b == 0xCA:  # float32
        (v,) = struct.unpack_from(">f", mv, pos)
        return v, pos + 4
    if b == 0xCB:  # float64
        (v,) = struct.unpack_from(">d", mv, pos)
        return v, pos + 8
    if b == 0xCC:
        return mv[pos], pos + 1
    if b == 0xCD:
        return struct.unpack_from(">H", mv, pos)[0], pos + 2
    if b == 0xCE:
        return struct.unpack_from(">I", mv, pos)[0], pos + 4
    if b == 0xCF:
        return struct.unpack_from(">Q", mv, pos)[0], pos + 8
    if b == 0xD0:
        return struct.unpack_from(">b", mv, pos)[0], pos + 1
    if b == 0xD1:
        return struct.unpack_from(">h", mv, pos)[0], pos + 2
    if b == 0xD2:
        return struct.unpack_from(">i", mv, pos)[0], pos + 4
    if b == 0xD3:
        return struct.unpack_from(">q", mv, pos)[0], pos + 8
    if b == 0xD9:  # str8
        n = mv[pos]
        return bytes(mv[pos + 1 : pos + 1 + n]).decode("utf-8"), pos + 1 + n
    if b == 0xDA:  # str16
        (n,) = struct.unpack_from(">H", mv, pos)
        return bytes(mv[pos + 2 : pos + 2 + n]).decode("utf-8"), pos + 2 + n
    if b == 0xDB:  # str32
        (n,) = struct.unpack_from(">I", mv, pos)
        return bytes(mv[pos + 4 : pos + 4 + n]).decode("utf-8"), pos + 4 + n
    if b == 0xDC:  # array16
        (n,) = struct.unpack_from(">H", mv, pos)
        return _unpack_array(mv, pos + 2, n)
    if b == 0xDD:  # array32
        (n,) = struct.unpack_from(">I", mv, pos)
        return _unpack_array(mv, pos + 4, n)
    if b == 0xDE:  # map16
        (n,) = struct.unpack_from(">H", mv, pos)
        return _unpack_map(mv, pos + 2, n)
    if b == 0xDF:  # map32
        (n,) = struct.unpack_from(">I", mv, pos)
        return _unpack_map(mv, pos + 4, n)
    raise ValueError(f"msgpack_mini cannot decode type byte 0x{b:02x}")


def _unpack_array(mv: memoryview, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _unpack(mv, pos)
        out.append(v)
    return out, pos


def _unpack_map(mv: memoryview, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _unpack(mv, pos)
        v, pos = _unpack(mv, pos)
        out[k] = v
    return out, pos
