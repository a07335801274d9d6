"""Pure-Python VP8L (lossless WebP) ENCODER — the round-trip partner
of ``multimodal/vp8l.py``, same pattern as the repo's other codecs
(encode_bmp/encode_png/encode_jpeg/encode_wav): a deterministic,
dependency-free writer used by fixtures and planted corpora.

Deliberately minimal but SPEC-CONFORMANT output: no transforms, no
color cache, one prefix-code group, literal-only coding (no LZ77) —
every pixel is (green, red, blue, alpha) symbols under four canonical
prefix codes built from the image's channel histograms (simple 1-2
symbol codes when a channel is nearly constant, normal length-limited
codes otherwise). Unused distance codes are written as a 1-symbol
simple code. Compression is modest (entropy coding only) — the point
is correctness and determinism, not ratio.

Correctness evidence (tests/test_vp8l.py): encoder output decodes
byte-identically through BOTH this repo's pure decoder AND the system
libwebp decoder when present — conformance is checked against the
reference implementation in each direction.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_LEN = 15  # symbol code-length limit
_MAX_CL_LEN = 7  # code-length-code lengths are 3-bit fields


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, count: int) -> None:
        """LSB-first within bytes (VP8L convention)."""
        self.acc |= (value & ((1 << count) - 1)) << self.n
        self.n += count
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, value: int, length: int) -> None:
        """Prefix codes are written MSB-first."""
        for i in range(length - 1, -1, -1):
            self.bits((value >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


def _huffman_lengths(counts: dict[int, int], limit: int) -> dict[int, int]:
    """OPTIMAL length-limited code lengths via package-merge (Larmore
    & Hirschberg 1990) — always Kraft-COMPLETE (the decoder rejects
    incomplete codes) and depth ≤ limit by construction. The r6 first
    cut capped depths then 'repaired' Kraft by deepening the SHORTEST
    symbol — a step of 2^-(l+1) against a 2^-15 excess, overshooting
    to kraft<1 and emitting streams both decoders reject (review
    finding, reproduced with a Fibonacci-distributed histogram)."""
    syms = sorted(counts)
    if len(syms) == 1:
        return {syms[0]: 1}
    if len(syms) > (1 << limit):
        raise ValueError(f"alphabet {len(syms)} too large for depth {limit}")
    # coins: each symbol at each level, weight = its count; ties broken
    # by symbol tuple for determinism
    items = sorted((counts[s], (s,)) for s in syms)
    prev = list(items)
    for _ in range(limit - 1):
        packaged = []
        for i in range(0, len(prev) - 1, 2):
            w1, s1 = prev[i]
            w2, s2 = prev[i + 1]
            packaged.append((w1 + w2, s1 + s2))
        prev = sorted(packaged + items)
    lengths = dict.fromkeys(syms, 0)
    for _, ss in prev[: 2 * len(syms) - 2]:
        for s in ss:
            lengths[s] += 1
    # invariant: package-merge yields a complete code
    assert sum(1 << (limit - l) for l in lengths.values()) == 1 << limit
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Symbol → (code, length), deflate-style canonical assignment."""
    codes = {}
    code = 0
    prev = 0
    for length, sym in sorted((l, s) for s, l in lengths.items() if l > 0):
        code <<= length - prev
        prev = length
        codes[sym] = (code, length)
        code += 1
    return codes


_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _write_code(bw: _BitWriter, lengths: dict[int, int], alphabet_size: int):
    """Write one prefix-code header; returns symbol→(code,len)."""
    nz = [s for s, l in lengths.items() if l > 0]
    if len(nz) == 1:
        s = nz[0]
        bw.bits(1, 1)  # simple
        bw.bits(0, 1)  # one symbol
        if s < 2:
            bw.bits(0, 1)  # 1-bit symbol
            bw.bits(s, 1)
        else:
            bw.bits(1, 1)  # 8-bit symbol
            bw.bits(s, 8)
        return {s: (0, 0)}
    if len(nz) == 2 and all(lengths[s] == 1 for s in nz) and max(nz) < 256:
        s0, s1 = sorted(nz)
        bw.bits(1, 1)  # simple
        bw.bits(1, 1)  # two symbols
        if s0 < 2:
            bw.bits(0, 1)
            bw.bits(s0, 1)
        else:
            bw.bits(1, 1)
            bw.bits(s0, 8)
        bw.bits(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    # normal form: code lengths themselves prefix-coded. No RLE codes
    # (16/17/18 unused) — each symbol's length is one cl symbol; zeros
    # included, so the cl histogram covers every alphabet slot.
    bw.bits(0, 1)
    sym_lengths = [lengths.get(s, 0) for s in range(alphabet_size)]
    # trailing zeros can be dropped via the max_symbol field — keep it
    # simple and emit all (max_symbol bit = 0 → alphabet_size symbols)
    cl_counts: dict[int, int] = {}
    for l in sym_lengths:
        cl_counts[l] = cl_counts.get(l, 0) + 1
    cl_lengths = _huffman_lengths(cl_counts, _MAX_CL_LEN)
    cl_codes = _canonical_codes(cl_lengths)
    bw.bits(19 - 4, 4)  # num_code_lengths = 19 (all, in order)
    for s in _CODE_LENGTH_ORDER:
        bw.bits(cl_lengths.get(s, 0), 3)
    bw.bits(0, 1)  # no explicit max_symbol
    single_cl = len([s for s, l in cl_lengths.items() if l > 0]) == 1
    for l in sym_lengths:
        if not single_cl:
            c, ln = cl_codes[l]
            bw.code(c, ln)
        # a single-symbol cl code is zero bits: nothing to write
    return _canonical_codes(lengths)


def encode_vp8l(img: np.ndarray) -> bytes:
    """(h, w, 4) uint8 RGBA → full lossless WebP file bytes
    (RIFF container with one VP8L chunk)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 4:
        raise ValueError("encode_vp8l needs (h, w, 4) uint8 RGBA")
    h, w, _ = img.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("vp8l dims must be 1..16384")
    r = img[..., 0].ravel().tolist()
    g = img[..., 1].ravel().tolist()
    b = img[..., 2].ravel().tolist()
    a = img[..., 3].ravel().tolist()

    bw = _BitWriter()
    bw.bits(0x2F, 8)  # signature
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1 if (img[..., 3] != 255).any() else 0, 1)  # alpha hint
    bw.bits(0, 3)  # version
    bw.bits(0, 1)  # no transforms
    bw.bits(0, 1)  # no color cache
    bw.bits(0, 1)  # no meta prefix image

    def hist(vals):
        c: dict[int, int] = {}
        for v in vals:
            c[v] = c.get(v, 0) + 1
        return c

    green_codes = _write_code(
        bw, _huffman_lengths(hist(g), _MAX_LEN), 256 + 24
    )
    red_codes = _write_code(bw, _huffman_lengths(hist(r), _MAX_LEN), 256)
    blue_codes = _write_code(bw, _huffman_lengths(hist(b), _MAX_LEN), 256)
    alpha_codes = _write_code(bw, _huffman_lengths(hist(a), _MAX_LEN), 256)
    _write_code(bw, {0: 1}, 40)  # distance code: unused 1-symbol

    for i in range(w * h):
        c, ln = green_codes[g[i]]
        bw.code(c, ln)
        c, ln = red_codes[r[i]]
        bw.code(c, ln)
        c, ln = blue_codes[b[i]]
        bw.code(c, ln)
        c, ln = alpha_codes[a[i]]
        bw.code(c, ln)

    payload = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
