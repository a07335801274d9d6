"""Optional ctypes binding to the SYSTEM libwebp shared library.

No package install: if ``libwebp.so.7`` (or a sibling) is loadable,
this exposes lossless RGBA encode/decode; otherwise every entry raises
``RuntimeError`` and callers fall back to the pure-Python VP8L decoder
(``multimodal/vp8l.py``). Tests use the system library as the GOLDEN
reference for the pure decoder; ``media.decode_payload`` uses it as the
fast path when present.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = ["libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib"]
    found = ctypes.util.find_library("webp")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            _LIB = lib
            return _LIB
        except OSError:
            continue
    return None


def available() -> bool:
    return _load() is not None


def decode_rgba(data: bytes) -> np.ndarray:
    """WebP bytes (full RIFF container) → (h, w, 4) uint8 RGBA."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp failed to decode payload")
    try:
        n = w.value * h.value * 4
        out = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return out.reshape(h.value, w.value, 4)


def encode_lossless_rgba(img: np.ndarray) -> bytes:
    """(h, w, 4) uint8 RGBA → lossless WebP bytes (RIFF container,
    VP8L inside)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 4:
        raise ValueError("encode_lossless_rgba needs (h, w, 4) uint8")
    h, w, _ = img.shape
    buf = np.ascontiguousarray(img).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGBA(buf, w, h, w * 4, ctypes.byref(out))
    if size == 0 or not out:
        raise ValueError("libwebp failed to encode")
    try:
        return bytes(bytearray(np.ctypeslib.as_array(out, shape=(size,))))
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def encode_lossy_rgba(img: np.ndarray, quality: float = 80.0) -> bytes:
    """(h, w, 4) uint8 RGBA → LOSSY WebP bytes (RIFF container, VP8
    inside) — the payload kind the pure-Python tier cannot decode, so
    this exists to exercise the ctypes lossy-decode path end-to-end on
    images where the system lib is present."""
    lib = _load()
    if lib is None:
        raise RuntimeError("system libwebp not available")
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 4:
        raise ValueError("encode_lossy_rgba needs (h, w, 4) uint8")
    h, w, _ = img.shape
    buf = np.ascontiguousarray(img).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGBA(
        buf, w, h, w * 4, ctypes.c_float(float(quality)), ctypes.byref(out)
    )
    if size == 0 or not out:
        raise ValueError("libwebp failed to encode")
    try:
        return bytes(bytearray(np.ctypeslib.as_array(out, shape=(size,))))
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
