"""Progressive JPEG (SOF2, r11 — multimodal/jpeg.py): spectral
selection + successive approximation per ITU-T T.81 G.1.2.

The load-bearing equivalence: ``encode_jpeg_progressive`` quantizes to
the SAME final coefficients as ``encode_jpeg``, so the progressive
stream must decode PIXEL-IDENTICAL to the baseline stream of the same
image — any scan mis-parse, refinement bit slip, or EOB-run botch
breaks bit equality somewhere in the matrix below. EOBn>0 runs (which
the encoder deliberately never emits — Annex-K tables carry no EOBn
codes) are exercised by a hand-assembled stream with a custom DHT,
which also redefines the AC table BETWEEN scans."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fenix_spark.multimodal.jpeg import (
    _BitWriter,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _img(shape, seed=7):
    rng = np.random.default_rng(seed)
    return rng.normal(128, 48, shape).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "shape,kw",
    [
        ((24, 33), {}),                                       # gray, odd dims
        ((24, 33, 3), {}),                                    # 4:4:4
        ((31, 18, 3), {"subsample": True}),                   # 4:2:0, odd dims
        ((40, 56, 3), {"subsample": True, "restart_interval": 3}),
        ((8, 8), {}),                                         # single block
        ((9, 9), {"restart_interval": 1}),                    # restart every MCU
        ((64, 48, 3), {"quality": 40}),                       # coarse quant
    ],
)
def test_progressive_decodes_pixel_identical_to_baseline(shape, kw):
    kw = dict(kw)
    q = kw.pop("quality", 85)
    img = _img(shape)
    base = decode_jpeg(encode_jpeg(img, quality=q, **kw))
    prog_bytes = encode_jpeg_progressive(img, quality=q, **kw)
    assert prog_bytes[2:4] != b"\xff\xc0"
    assert b"\xff\xc2" in prog_bytes[:200]  # SOF2
    prog = decode_jpeg(prog_bytes)
    assert np.array_equal(base, prog)


def test_progressive_stream_has_the_full_scan_script():
    data = encode_jpeg_progressive(_img((16, 16, 3)))
    n_sos = data.count(b"\xff\xda")
    # DC first + per-comp (2 AC bands + 2 refines) * 3 comps + DC refine
    assert n_sos == 2 + 3 * 4


def _hand_built_eobn_stream() -> tuple[bytes, dict]:
    """16x16 grayscale progressive stream using EOB1 in the AC-first
    scan and EOB2 in the AC-refine scan — plus a between-scan DHT
    REDEFINITION of AC table 0. Quant table is all-ones so the
    expected coefficients read directly as dequantized values."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    # SOF2: 8-bit, 16x16, 1 component, 1x1 sampling, qtable 0
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 16, 16, 1) + bytes([1, 0x11, 0])
    # DC table 0: standard luma
    from fenix_spark.multimodal.jpeg import _DC_LUMA

    bits, vals = _DC_LUMA
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([0x00]) + bytes(bits) + bytes(vals)

    def dht_ac(values):  # all codes at length 3 (then 4, ...)
        bits = [0] * 16
        if len(values) <= 8:
            bits[2] = len(values)
        else:
            raise AssertionError("keep the toy table <= 8 codes")
        return b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([0x10]) + bytes(bits) + bytes(values)

    def codes3(values):
        return {sym: (i, 3) for i, sym in enumerate(values)}

    from fenix_spark.multimodal.jpeg import _build_codes

    dc_codes = _build_codes(*_DC_LUMA)

    # ---- scan 1: DC first (Al=0), 4 blocks raster: values 5 0 -3 2
    bw = _BitWriter()
    prev = 0
    for v in (5, 0, -3, 2):
        diff = v - prev
        prev = v
        size = int(abs(diff)).bit_length()
        bw.write(*dc_codes[size])
        if size:
            bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    bw.flush()
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0x00])
    out += bytes(bw.buf)

    # ---- AC table v1: 0x00 EOB0, 0x10 EOB1, 0x01 (r0,s1), 0x11 (r1,s1)
    ac1_vals = [0x00, 0x10, 0x01, 0x11]
    out += dht_ac(ac1_vals)
    ac1 = codes3(ac1_vals)
    # ---- scan 2: AC first Ss=1 Se=63 Al=1
    # block0: coef k=1 -> +1 (so stored 1<<1 = 2); then EOB1 + extra
    # bit 1 -> eobrun = (1<<1)-1+1 = 2 -> blocks 1 and 2 skipped
    # block3: (r1,s1) -> k=2 value -1 (stored -2); then EOB0
    bw = _BitWriter()
    bw.write(*ac1[0x01]); bw.write(1, 1)        # +1 at k=1
    bw.write(*ac1[0x10]); bw.write(1, 1)        # EOB1, extra bit 1
    bw.write(*ac1[0x11]); bw.write(0, 1)        # -1 at k=2 (skip k=1)
    bw.write(*ac1[0x00])                        # EOB0
    bw.flush()
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0x01])
    out += bytes(bw.buf)

    # ---- REDEFINE AC table 0 between scans: now carries EOB2 (0x20)
    ac2_vals = [0x20, 0x00, 0x01, 0x11]
    out += dht_ac(ac2_vals)
    ac2 = codes3(ac2_vals)
    # ---- scan 3: AC refine Ss=1 Se=63 Ah=1 Al=0
    # one EOB2 (eobrun = 1<<2 = 4) covers all four blocks' tail walks;
    # correction bits follow in walk order: block0 k=1 (bit 1: 2 -> 3),
    # block3 k=2 (bit 1: -2 -> -3)
    bw = _BitWriter()
    bw.write(*ac2[0x20])
    bw.write(1, 1)  # block0 k=1 correction
    bw.write(1, 1)  # block3 k=2 correction
    bw.flush()
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0x10])
    out += bytes(bw.buf)
    out += b"\xff\xd9"

    expected = {
        "dc": [5, 0, -3, 2],
        "k1_block0": 3,     # zigzag k=1
        "k2_block3": -3,    # zigzag k=2
    }
    return bytes(out), expected


def test_hand_built_eobn_runs_and_interscan_dht():
    data, exp = _hand_built_eobn_stream()
    got = decode_jpeg(data)
    assert got.shape == (16, 16)

    # reconstruct the expected pixels from the intended coefficients
    # through the module's own IDCT path
    from fenix_spark.multimodal.jpeg import _reconstruct

    store = np.zeros((2, 2, 64), dtype=np.int64)
    for i, v in enumerate(exp["dc"]):
        store[divmod(i, 2)][0] = v
    store[0, 0][1] = exp["k1_block0"]
    store[1, 1][2] = exp["k2_block3"]
    frame = (16, 16, [(1, 1, 1, 0)])
    want = _reconstruct(frame, [store], {0: np.ones(64)})
    assert np.array_equal(got, want)


def test_progressive_dispatches_through_decode_payload():
    from fenix_spark.multimodal.media import decode_payload

    img = _img((16, 24, 3))
    data = encode_jpeg_progressive(img, quality=90)
    out = decode_payload(data, "jpeg", (16, 24, 3))
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out, decode_jpeg(data))
