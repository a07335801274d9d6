"""Multimodal tests: REAL stdlib codecs (24-bit BMP, PCM WAV) are
round-trip tested; for codec-lib formats the decode step is a
documented stub, so the rest pins what IS real — schemas, mapInPandas
batch flow, determinism, frame explosion shapes, resize byte layout.
"""

from __future__ import annotations

import pytest

from fenix_spark.multimodal import (
    audio_features,
    decode_payload,
    image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        synthesize_media(spark, 48).collect(), schema=synthesize_media(spark, 1).schema
    )
    return df.repartition(4).cache()


def test_unknown_format_raises_not_implemented():
    # webp/tiff/gif graduated to real decoders in r6; exr remains a
    # genuinely absent codec
    with pytest.raises(NotImplementedError, match="codec"):
        decode_payload(b"\x00\x01", "exr", (2, 1))


def test_webp_garbage_raises_value_error():
    with pytest.raises(ValueError):
        decode_payload(b"\x00\x01", "webp", (2, 1))


def test_image_features_schema_and_determinism(spark, media):
    feats = image_features(media)
    assert feats.schema.simpleString() == "struct<media_id:bigint,features:array<double>>"
    rows1 = {r.media_id: r.features for r in feats.collect()}
    rows2 = {r.media_id: r.features for r in image_features(media).collect()}
    assert rows1 == rows2
    n_images = media.where("kind = 'image'").count()
    assert len(rows1) == n_images
    # 3 means + 3 stds + aspect ratio
    assert all(len(v) == 7 for v in rows1.values())
    assert all(0.0 <= x <= 1.0 for v in rows1.values() for x in v[:6])


def test_audio_features_values(spark, media):
    rows = {r.media_id: r for r in audio_features(media).collect()}
    assert len(rows) == media.where("kind = 'audio'").count()
    from fenix_spark.multimodal import decode_audio

    meta = {
        r.media_id: len(decode_audio(bytes(r.data), r.meta["format"])[0])
        for r in media.where("kind='audio'").collect()
    }
    for mid, r in rows.items():
        assert r.n_samples == meta[mid]
        assert r.rms > 0
        assert 0.0 <= r.zcr <= 1.0


def test_resize_preserves_schema_and_byte_layout(spark, media):
    out = resize_images(media, 8, 6)
    assert out.schema == media.schema
    rows = out.collect()
    assert len(rows) == media.where("kind = 'image'").count()
    for r in rows:
        assert r.meta.width == 8 and r.meta.height == 6
        assert len(bytes(r.data)) == 8 * 6 * 3


def test_resize_is_identity_at_same_size(spark, media):
    one = media.where("kind = 'image'").limit(1)
    src = one.collect()[0]
    out = resize_images(one, src.meta.width, src.meta.height).collect()[0]
    assert bytes(out.data) == bytes(src.data)


def test_frame_sampling_counts_and_sizes(spark, media):
    frames = sample_frames(media, every_n=2)
    rows = frames.collect()
    vids = {r.media_id: r.meta.n_frames for r in media.where("kind='video'").collect()}
    per_vid: dict[int, list[int]] = {}
    for r in rows:
        per_vid.setdefault(r.media_id, []).append(r.frame_idx)
        assert len(bytes(r.frame)) == 8 * 8 * 3
    for mid, idxs in per_vid.items():
        assert sorted(idxs) == list(range(0, vids[mid], 2))
    assert set(per_vid) == set(vids)


def test_bmp_roundtrip_exact():
    """encode→decode is the identity on pixels, including non-multiple-
    of-4 widths (padded rows)."""
    import numpy as np

    from fenix_spark.multimodal import encode_bmp
    from fenix_spark.multimodal.media import _decode_bmp

    rng = np.random.default_rng(7)
    for w, h in ((5, 3), (16, 12), (1, 1), (7, 2)):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (_decode_bmp(encode_bmp(img)) == img).all()


def test_wav_roundtrip_16_and_8_bit():
    import numpy as np

    from fenix_spark.multimodal import decode_audio, encode_wav

    sig16 = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int64)
    x, sr = decode_audio(encode_wav(sig16, 8000), "wav")
    assert sr == 8000 and (x == sig16.astype(float)).all()
    sig8 = np.array([0, 128, 255], dtype=np.int64)
    x8, _ = decode_audio(encode_wav(sig8, 4000, sampwidth=1), "wav")
    assert (x8 == np.array([-128.0, 0.0, 127.0])).all()


def test_real_wav_audio_features_match_numpy(spark, media):
    """Rows whose payload is a real WAV must produce rms/zcr equal to
    computing directly on the known synthesized signal."""
    import numpy as np

    from fenix_spark.multimodal import decode_audio

    rows = {r.media_id: r for r in media.where("meta.format = 'wav'").collect()}
    assert rows, "synthesize_media must emit real wav rows"
    got = {
        r.media_id: r
        for r in audio_features(media).collect()
        if r.media_id in rows
    }
    for mid, src in rows.items():
        x, _ = decode_audio(bytes(src.data), "wav")
        assert got[mid].n_samples == len(x)
        assert abs(got[mid].rms - round(float(np.sqrt(np.mean(x * x))), 9)) < 1e-9


def test_real_bmp_image_features_and_resize(spark, media):
    """BMP rows flow through feature extraction and resize exactly like
    raw rows — decode is real, downstream identical."""
    import numpy as np

    from fenix_spark.multimodal.media import _decode_bmp

    bmp_rows = {r.media_id: r for r in media.where("meta.format = 'bmp'").collect()}
    assert bmp_rows, "synthesize_media must emit real bmp rows"
    feats = {
        r.media_id: r.features
        for r in image_features(media).collect()
        if r.media_id in bmp_rows
    }
    for mid, src in bmp_rows.items():
        img = _decode_bmp(bytes(src.data))
        want_mean = img.mean(axis=(0, 1)) / 255.0
        assert np.allclose(feats[mid][:3], want_mean, atol=1e-8)
    resized = resize_images(media, 8, 8).where("meta.format = 'bmp'").collect()
    assert resized and all(len(bytes(r.data)) == 8 * 8 * 3 for r in resized)


def test_png_roundtrip_rgb_and_rgba():
    import numpy as np

    from fenix_spark.multimodal.media import _decode_png, encode_png

    rng = np.random.default_rng(11)
    for c in (3, 4):
        img = rng.integers(0, 256, size=(21, 17, c), dtype=np.uint8)
        assert np.array_equal(_decode_png(encode_png(img)), img)


def test_png_decode_all_filter_types():
    """Our encoder emits filter 0 only; a spec-compliant decoder must
    reverse Sub/Up/Average/Paeth too — build a PNG by hand with each
    filter applied per line and check exact recovery."""
    import struct
    import zlib

    import numpy as np

    from fenix_spark.multimodal.media import _PNG_SIG, _decode_png, _png_chunk

    rng = np.random.default_rng(12)
    h, w, c = 5, 9, 3
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    lines = []
    for r, kind in enumerate([0, 1, 2, 3, 4]):
        cur = flat[r]
        prev = flat[r - 1] if r > 0 else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for i in range(stride):
            a = cur[i - c] if i >= c else 0
            b = prev[i]
            cd = prev[i - c] if i >= c else 0
            if kind == 0:
                pred = 0
            elif kind == 1:
                pred = a
            elif kind == 2:
                pred = b
            elif kind == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cd
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cd)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cd)
            enc[i] = (cur[i] - pred) & 0xFF
        lines.append(bytes([kind]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(_decode_png(payload), img)


def test_png_unsupported_variants_raise():
    import struct

    import numpy as np
    import pytest

    from fenix_spark.multimodal.media import (
        _PNG_SIG,
        _decode_png,
        _png_chunk,
        decode_payload,
        encode_png,
    )

    # palette PNGs are SUPPORTED since r11 — one without PLTE is
    # corrupt, not unimplemented
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    bad = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="missing PLTE"):
        _decode_png(bad)
    # interlace method 2 does not exist; depth-4 RGB is illegal
    for ihdr_bad in (
        struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 2),
        struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0),
    ):
        blob = _PNG_SIG + _png_chunk(b"IHDR", ihdr_bad) + _png_chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError, match="PNG variant"):
            _decode_png(blob)
    with pytest.raises(ValueError, match="not a PNG"):
        _decode_png(b"JUNK")
    # decode_payload dispatch
    img = np.zeros((4, 4, 3), np.uint8)
    out = decode_payload(encode_png(img), "png", (4, 4, 3))
    assert out.shape == (4, 4, 3)


def test_png_grayscale_roundtrip():
    import numpy as np

    from fenix_spark.multimodal.media import _decode_png, encode_png

    img = np.random.default_rng(5).integers(0, 256, size=(9, 13, 1), dtype=np.uint8)
    assert np.array_equal(_decode_png(encode_png(img)), img)


# ------------------------------------------------------------------ jpeg


def _smooth_rgb(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / max(w - 1, 1),
            yy * 255 / max(h - 1, 1),
            127 + 120 * np.sin(xx / 9.0) * np.cos(yy / 7.0),
        ],
        axis=-1,
    ).astype(np.uint8)


import numpy as np  # noqa: E402  (shared by the jpeg tests below)


def test_jpeg_roundtrip_444_and_420_error_bounds():
    from fenix_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _smooth_rgb(41, 57)  # non-multiple-of-8/16 dims on purpose
    d444 = decode_jpeg(encode_jpeg(img, quality=95))
    assert d444.shape == img.shape and d444.dtype == np.uint8
    err444 = np.abs(d444.astype(int) - img.astype(int))
    assert err444.max() <= 12 and err444.mean() < 2.0

    d420 = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert d420.shape == img.shape
    err420 = np.abs(d420.astype(int) - img.astype(int))
    assert err420.max() <= 40 and err420.mean() < 5.0  # chroma halved


def test_jpeg_uniform_block_near_exact():
    from fenix_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = np.full((16, 24, 3), [90, 160, 200], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_grayscale_roundtrip():
    from fenix_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:30, 0:22]
    g = (127 + 100 * np.sin(xx / 5.0) * np.cos(yy / 4.0)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4


def test_jpeg_restart_markers_do_not_change_pixels():
    from fenix_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _smooth_rgb(48, 80)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    for ri in (1, 3, 7):
        d = encode_jpeg(img, quality=90, subsample=True, restart_interval=ri)
        assert b"\xff\xdd" in d  # DRI segment present
        assert np.array_equal(decode_jpeg(d), base)


def test_jpeg_quality_monotone_size():
    from fenix_spark.multimodal.jpeg import encode_jpeg

    img = _smooth_rgb(40, 40)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (10, 50, 90)]
    assert sizes == sorted(sizes)


def test_jpeg_unsupported_variants_raise():
    import struct

    import pytest

    from fenix_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"JUNKJUNK")
    good = encode_jpeg(_smooth_rgb(16, 16))
    sof0 = good.find(b"\xff\xc0")
    # SOF2 is SUPPORTED since r11 — splicing it onto a stream whose
    # scan header is baseline-shaped (Ss=0, Se=63) must now fail as a
    # CORRUPT progressive stream, not as unimplemented
    bad = good[:sof0] + b"\xff\xc2" + good[sof0 + 2 :]
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(bad)
    # lossless SOF3 stays an honest NotImplementedError by name
    bad3 = good[:sof0] + b"\xff\xc3" + good[sof0 + 2 :]
    with pytest.raises(NotImplementedError, match="0xc3"):
        decode_jpeg(bad3)
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), np.float64))


def test_jpeg_decode_payload_dispatch_and_features():
    from fenix_spark.multimodal.jpeg import encode_jpeg
    from fenix_spark.multimodal.media import decode_payload

    img = _smooth_rgb(24, 32)
    data = encode_jpeg(img, quality=95)
    out = decode_payload(data, "jpeg", (24, 32, 3))
    assert out.shape == (24, 32, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0
    # meta-shape mismatch is a loud error, not silent reshaping
    import pytest

    with pytest.raises(ValueError, match="decodes to"):
        decode_payload(data, "jpeg", (32, 24, 3))


# ------------------------------------------------------------- r11:
# PNG variants — palette, gray+alpha, 16-bit, sub-byte gray, Adam7


def test_png_full_variant_matrix_roundtrips():
    """8/16-bit x 1/2/3/4 channels x plain/Adam7 all round-trip exact;
    the Adam7 table is verified to PARTITION the plane (each pixel in
    exactly one pass — the classic bug is a wrong offset table that
    still self-round-trips if shared, so partition-ness is the real
    spec check)."""
    from fenix_spark.multimodal.media import _ADAM7, _decode_png, encode_png

    cover = np.zeros((16, 16), int)
    for x0, y0, dx, dy in _ADAM7:
        cover[y0::dy, x0::dx] += 1
    assert (cover == 1).all()
    rng = np.random.default_rng(23)
    for dt, hi in ((np.uint8, 256), (np.uint16, 1 << 16)):
        for c in (1, 2, 3, 4):
            img = rng.integers(0, hi, (21, 13, c)).astype(dt)
            for il in (False, True):
                back = _decode_png(encode_png(img, interlace=il))
                assert back.dtype == dt and np.array_equal(back, img), (dt, c, il)


def test_png_palette_depths_and_trns():
    from fenix_spark.multimodal.media import _decode_png, encode_png_palette

    rng = np.random.default_rng(24)
    for ncol in (2, 4, 13, 200):
        pal = np.unique(
            rng.integers(0, 256, (ncol * 3, 3)).astype(np.uint8), axis=0
        )[:ncol]
        idx = rng.integers(0, len(pal), (17, 29))
        img = pal[idx]
        back = _decode_png(encode_png_palette(img))
        assert np.array_equal(back, img), ncol
        # tRNS: alpha is per UNIQUE color in the written palette
        colors = np.unique(img.reshape(-1, 3), axis=0)
        alpha = rng.integers(0, 256, len(colors)).astype(np.uint8)
        back_a = _decode_png(encode_png_palette(img, alpha=alpha))
        assert back_a.shape == img.shape[:2] + (4,)
        assert np.array_equal(back_a[:, :, :3], img)
        lut = {tuple(c): a for c, a in zip(colors, alpha)}
        want_a = np.array(
            [[lut[tuple(px)] for px in row] for row in img], np.uint8
        )
        assert np.array_equal(back_a[:, :, 3], want_a)


def test_png_subbyte_gray_hand_fixture():
    """Depth-2 grayscale, hand-assembled (no encoder path for sub-byte
    gray): 4 pixels/byte MSB-first, scaled to full range on decode
    like every viewer renders it."""
    import struct as _s
    import zlib as _z

    from fenix_spark.multimodal.media import _PNG_SIG, _decode_png, _png_chunk

    # 2x5 image, values 0..3 -> bytes: row0 = 0b00_01_10_11, 0b11_000000
    raw = b"\x00" + bytes([0b00011011, 0b11000000]) + b"\x00" + bytes([0b10101010, 0b01000000])
    ihdr = _s.pack(">IIBBBBB", 5, 2, 2, 0, 0, 0, 0)
    data = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got = _decode_png(data)
    scale = [0, 85, 170, 255]  # v * 255 // 3
    want = np.array(
        [[scale[v] for v in (0, 1, 2, 3, 3)], [scale[v] for v in (2, 2, 2, 2, 1)]],
        np.uint8,
    )[:, :, None]
    assert np.array_equal(got, want)
