"""Media operators over binary columns.

Data model: one row per media object —

    media_id bigint, kind string,           -- 'image' | 'audio' | 'video'
    data binary,                            -- encoded payload (opaque)
    meta struct<format string, width int, height int, channels int,
                sample_rate int, n_frames int>

At 100 TB the payloads dominate: operators therefore (a) never collect
binaries to the driver, (b) stream them through ``mapInPandas`` in
Arrow batches sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``
(set it low — e.g. 64 — when rows are multi-MB so a batch fits in
executor memory), and (c) project early so scans of feature outputs
never re-read payload bytes (parquet column pruning).

DECODERS: ``wav`` (8/16-bit PCM, stdlib ``wave``), ``bmp`` (24-bit
uncompressed, stdlib ``struct``), ``png`` (gray/gray+alpha/RGB/RGBA/
palette, depths 1-16, plain AND Adam7 interlaced, all five scanline
filters — stdlib ``zlib`` + ``struct``) and ``jpeg`` (baseline
sequential DCT, 4:4:4/4:2:2/4:2:0, restart markers, AND progressive
SOF2 — numpy codec in ``multimodal/jpeg.py``) are REAL
codecs — bytes in, samples/pixels out, round-trip tested against
their encoders. Formats that need external libs (mp3/mp4/webp) raise
NotImplementedError at the single swap-in point (``decode_payload`` /
``decode_audio``); the ``raw*`` pseudo-formats remain as deterministic
fakes for synthetic benchmarks. Swapping in ``soundfile.read`` /
``av`` changes ONLY those two functions — every operator downstream
consumes the decoded ndarray and is already real.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, data binary, "
    "meta struct<format string, width int, height int, channels int, "
    "sample_rate int, n_frames int>"
)

_FAKE_FORMATS = {"rawimg", "rawpcm", "rawvid"}


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up, BGR,
    4-byte-padded rows) from an (h, w, 3) uint8 RGB array."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp needs (h, w, 3) RGB")
    row_bytes = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = img[r, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (row_bytes - len(row))
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 14 + 40 + len(body), 0, 0, 14 + 40,
        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + bytes(body)


def _decode_bmp(data: bytes) -> np.ndarray:
    """Real BMP decode: 24-bit BI_RGB, top-down or bottom-up, padded
    rows → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP variant bpp={bpp} compression={comp}")
    bottom_up, h = h > 0, abs(h)
    row_bytes = (w * 3 + 3) // 4 * 4
    img = np.empty((h, w, 3), np.uint8)
    for r in range(h):
        row = np.frombuffer(data, np.uint8, w * 3, pixel_off + r * row_bytes)
        img[h - 1 - r if bottom_up else r] = row.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return img


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """PNG writer (filter 0 per scanline, one zlib IDAT) — pure stdlib.
    (h, w, c) with c = 1 (gray) / 2 (gray+alpha) / 3 (RGB) / 4 (RGBA);
    uint8 → depth 8, uint16 → depth 16 (big-endian samples, per spec).
    ``interlace=True`` writes Adam7 (seven independently-filtered
    sub-images)."""
    import zlib as _z

    h, w, c = img.shape
    if c not in (1, 2, 3, 4):
        raise ValueError("encode_png needs (h, w, 1|2|3|4)")
    if img.dtype == np.uint8:
        depth = 8
    elif img.dtype == np.uint16:
        depth = 16
        img = img.astype(">u2")
    else:
        raise ValueError("encode_png needs uint8 or uint16")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(
                    b"".join(b"\x00" + sub[r].tobytes() for r in range(sub.shape[0]))
                )
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(img: np.ndarray, alpha: np.ndarray | None = None) -> bytes:
    """Palette PNG (color type 3) from an (h, w, 3) uint8 image with
    ≤ 256 distinct colors; bit depth auto-selected (1/2/4/8 — the
    smallest that fits), MSB-first packed indices, optional per-color
    ``alpha`` (tRNS)."""
    import zlib as _z

    h, w, c = img.shape
    if c != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png_palette needs (h, w, 3) uint8")
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"palette PNG holds <= 256 colors, image has {len(colors)}")
    depth = next(d for d in (1, 2, 4, 8) if (1 << d) >= len(colors))
    idx = idx.reshape(h, w).astype(np.uint8)
    lines = []
    for r in range(h):
        if depth == 8:
            lines.append(b"\x00" + idx[r].tobytes())
        else:
            bits = np.unpackbits(idx[r][:, None], axis=1)[:, 8 - depth :]
            packed = np.packbits(bits.reshape(-1))
            lines.append(b"\x00" + packed.tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", colors.tobytes())
    if alpha is not None:
        if len(alpha) != len(colors):
            raise ValueError("alpha must have one entry per palette color")
        out += _png_chunk(b"tRNS", np.asarray(alpha, np.uint8).tobytes())
    return out + _png_chunk(b"IDAT", _z.compress(b"".join(lines), 9)) + _png_chunk(b"IEND", b"")


def _png_unfilter(kind: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """One scanline of PNG filter reversal (spec §6: None/Sub/Up/
    Average/Paeth). Sub/Average/Paeth carry left-pixel state, so they
    run as a short python loop over the line — fine for decode tests
    and Arrow-batch feature extraction at sane image sizes."""
    out = cur.astype(np.int32)
    if kind == 0:
        return out.astype(np.uint8)
    if kind == 2:
        return ((out + prev) & 0xFF).astype(np.uint8)
    res = np.zeros_like(out)
    for i in range(len(cur)):
        a = int(res[i - bpp]) if i >= bpp else 0  # left
        b = int(prev[i])  # up
        if kind == 1:
            res[i] = (out[i] + a) & 0xFF
        elif kind == 3:
            res[i] = (out[i] + ((a + b) >> 1)) & 0xFF
        elif kind == 4:
            cdiag = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - cdiag
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cdiag)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cdiag)
            res[i] = (out[i] + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter {kind}")
    return res.astype(np.uint8)


# Adam7 interlace passes: (x0, y0, dx, dy) per PNG spec §8.2 — the
# 8x8 tile reads  1 6 4 6 2 6 4 6 / 7... row-wise.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_read_subimage(raw: bytes, off: int, pw: int, ph: int, c: int, d: int):
    """Unfilter one (sub)image of ``ph`` scanlines: returns the
    unfiltered byte matrix (ph, stride) and the bytes consumed. PNG
    filters operate on BYTES whatever the bit depth (spec §6)."""
    stride = -(-pw * c * d // 8)
    bpp = max(1, c * d // 8)
    out = np.empty((ph, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for r in range(ph):
        base = off + r * (stride + 1)
        kind = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1)
        prev = _png_unfilter(kind, line, prev, bpp)
        out[r] = prev
    return out, ph * (stride + 1)


def _png_bytes_to_samples(rows: np.ndarray, pw: int, c: int, d: int) -> np.ndarray:
    """(ph, stride) unfiltered bytes → (ph, pw, c) samples (uint8, or
    uint16 for depth 16). Sub-byte depths unpack MSB-first."""
    ph = rows.shape[0]
    if d == 8:
        return rows[:, : pw * c].reshape(ph, pw, c)
    if d == 16:
        be = rows[:, : pw * c * 2].reshape(ph, pw * c, 2).astype(np.uint16)
        return (be[:, :, 0] * 256 + be[:, :, 1]).reshape(ph, pw, c)
    # d in (1, 2, 4): single-channel (gray or palette index), grouped
    # d bits at a time MSB-first within each byte
    bits = np.unpackbits(rows, axis=1)
    grouped = bits.reshape(ph, -1, d)
    weights = (1 << np.arange(d - 1, -1, -1)).astype(np.uint8)
    vals = (grouped * weights[None, None, :]).sum(axis=2).astype(np.uint8)
    return vals[:, :pw].reshape(ph, pw, 1)


def _decode_png(data: bytes) -> np.ndarray:
    """Real PNG decode — color types 0 (gray, depth 1/2/4/8/16),
    2 (RGB, 8/16), 3 (palette, 1/2/4/8, with tRNS alpha), 4
    (gray+alpha, 8/16), 6 (RGBA, 8/16); non-interlaced AND Adam7;
    all five scanline filters. Returns uint8 (uint16 for depth-16
    files); sub-byte gray scales to full range like every viewer."""
    import zlib as _z

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = len(_PNG_SIG), b"", None
    plte = trns = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = meta
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    ok_depths = {
        0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
        4: (8, 16), 6: (8, 16),
    }.get(color_type, ())
    if channels is None or depth not in ok_depths or comp or filt or interlace > 1:
        raise NotImplementedError(
            f"PNG variant depth={depth} color={color_type} interlace={interlace}"
        )
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    raw = _z.decompress(idat)
    sdtype = np.uint16 if depth == 16 else np.uint8

    if interlace:  # Adam7: seven independently-filtered sub-images
        img = np.zeros((h, w, channels), sdtype)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, used = _png_read_subimage(raw, off, pw, ph, channels, depth)
            off += used
            img[y0::dy, x0::dx] = _png_bytes_to_samples(rows, pw, channels, depth)
    else:
        rows, _ = _png_read_subimage(raw, 0, w, h, channels, depth)
        img = _png_bytes_to_samples(rows, w, channels, depth)

    if color_type == 3:
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette PNG: index beyond PLTE")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        return rgb
    if color_type == 0 and depth < 8:
        # scale sub-byte gray to full range (0..2^d-1 → 0..255)
        img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    return img


def encode_wav(samples: np.ndarray, sample_rate: int, sampwidth: int = 2) -> bytes:
    """PCM WAV bytes from a 1-D mono signal (int16 for sampwidth=2,
    uint8 for sampwidth=1)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        dt = np.uint8 if sampwidth == 1 else np.dtype("<i2")
        w.writeframes(np.asarray(samples).astype(dt).tobytes())
    return buf.getvalue()


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Real WAV decode via stdlib ``wave``: 8-bit (unsigned) or 16-bit
    (signed LE) PCM → (centered float64 mono signal, sample_rate).
    Multi-channel input is downmixed by mean — features below describe
    the clip, not a channel."""
    with wave.open(io.BytesIO(data), "rb") as w:
        nch, sw, sr = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    else:
        raise NotImplementedError(f"WAV sample width {sw} bytes")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


def decode_audio(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """Audio payload → (centered float64 mono samples, sample_rate).
    REAL for ``wav``; deterministic fake for ``rawpcm`` (bytes as
    unsigned 8-bit samples); NotImplementedError is the swap-in point
    for codec-lib formats (mp3/flac/ogg)."""
    if fmt == "wav":
        return _decode_wav(data)
    if fmt == "rawpcm":
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        return x, 0
    raise NotImplementedError(
        f"no audio codec for format {fmt!r} in this environment; "
        "decode_audio is the single swap-in point for real PCM codecs "
        "(mp3 CONTAINER metadata — duration/bitrate/rate/channels/VBR "
        "— is already real without any codec: multimodal/mp3.py)"
    )


def _decode_webp(data: bytes) -> np.ndarray:
    """WebP pixel decode: system libwebp (ctypes fast path — covers
    lossy VP8 too) when loadable, else the pure-Python VP8L decoder
    (multimodal/vp8l.py — lossless only, golden-tested byte-identical
    to libwebp). Lossy VP8 without libwebp raises (full DCT codec)."""
    from fenix_spark.multimodal import libwebp

    if libwebp.available():
        return libwebp.decode_rgba(data)
    from fenix_spark.multimodal.vp8l import decode_webp_lossless

    return decode_webp_lossless(data)


def decode_payload(data: bytes, fmt: str, shape: tuple[int, ...]) -> np.ndarray:
    """Pixel-payload decoder. REAL for ``bmp``, ``png`` (stdlib codecs
    above), ``jpeg``/``jpg`` (baseline AND progressive/SOF2 numpy
    codec, multimodal/jpeg.py), ``webp`` (lossless VP8L pure-Python decoder in
    multimodal/vp8l.py, system-libwebp fast path when loadable),
    ``gif`` (palette+LZW incl. interlace/transparency, multimodal/
    gif.py) and ``tiff``/``tif`` (baseline uncompressed, multimodal/
    tiff.py); deterministic fake for the ``raw*`` pseudo-formats
    (payload bytes tiled to ``shape``, uint8); NotImplementedError is
    the swap-in point for the remaining codec-lib formats (exr;
    compressed TIFF; lossy VP8 without libwebp)."""
    if fmt in ("bmp", "png", "jpeg", "jpg", "webp", "gif", "tiff", "tif"):
        if fmt == "bmp":
            img = _decode_bmp(data)
        elif fmt == "png":
            img = _decode_png(data)
        elif fmt == "webp":
            img = _decode_webp(data)
        elif fmt == "gif":
            from fenix_spark.multimodal.gif import decode_gif

            img = decode_gif(data)
        elif fmt in ("tiff", "tif"):
            from fenix_spark.multimodal.tiff import decode_tiff

            img = decode_tiff(data)
        else:
            from fenix_spark.multimodal.jpeg import decode_jpeg

            img = decode_jpeg(data)
        if shape and tuple(img.shape) != tuple(shape):
            raise ValueError(f"{fmt} decodes to {img.shape}, meta says {shape}")
        return img
    if fmt not in _FAKE_FORMATS:
        raise NotImplementedError(
            f"no codec for format {fmt!r} in this environment; "
            "decode_payload is the single swap-in point for real codecs "
            "(CONTAINER metadata is already real without any codec: "
            "mp4 duration/tracks/codecs/dims in multimodal/mp4.py)"
        )
    n = int(np.prod(shape))
    buf = np.frombuffer(data, dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = -(-n // len(buf))  # ceil-divide, then truncate
    return np.tile(buf, reps)[:n].reshape(shape)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests/bench: payload bytes derive
    from a seeded RNG per media_id.

    Every other image/audio row carries a REAL encoded payload
    (bmp/wav) so the stdlib codecs are exercised end-to-end; the rest
    use the raw* fakes. Video stays raw* (no stdlib container codec).
    """
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        real = (i // 3) % 2 == 0
        if kind == "image":
            w, h, c, sr, nf = 16 + (i % 4) * 8, 12 + (i % 3) * 4, 3, 0, 0
            pixels = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
            if real:
                fmt, payload = "bmp", encode_bmp(pixels)
            else:
                fmt, payload = "rawimg", pixels.tobytes()
        elif kind == "audio":
            w, h, c, sr, nf = 0, 0, 1, 8000, 0
            n_samp = 4000 + (i % 5) * 800
            if real:
                fmt = "wav"
                payload = encode_wav(
                    rng.integers(-(2**15), 2**15, size=n_samp, dtype=np.int64),
                    sr,
                )
            else:
                fmt = "rawpcm"
                payload = rng.integers(0, 256, size=n_samp, dtype=np.uint8).tobytes()
        else:
            w, h, c, sr, nf, fmt = 8, 8, 3, 0, 6 + (i % 4), "rawvid"
            payload = rng.integers(
                0, 256, size=8 * 8 * 3 * nf, dtype=np.uint8
            ).tobytes()
        rows.append((i, kind, bytearray(payload), (fmt, w, h, c, sr, nf)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def image_features(df: DataFrame) -> DataFrame:
    """Per-image channel statistics as an ``array<double>`` feature
    column: [mean_c..., std_c..., aspect_ratio]. One Arrow batch in,
    one out; payloads never leave the executor."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data, meta in zip(pdf["media_id"], pdf["data"], pdf["meta"]):
                h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
                img = decode_payload(bytes(data), meta["format"], (h, w, c))
                feat = np.concatenate(
                    [
                        img.mean(axis=(0, 1)) / 255.0,
                        img.std(axis=(0, 1)) / 255.0,
                        [w / h if h else 0.0],
                    ]
                )
                out.append((int(mid), [round(float(x), 9) for x in feat]))
            yield pd.DataFrame(out, columns=["media_id", "features"])

    src = df.where(F.col("kind") == "image").select("media_id", "data", "meta")
    return src.mapInPandas(gen, "media_id bigint, features array<double>")


def audio_features(df: DataFrame, frame: int = 400) -> DataFrame:
    """Per-clip stats over fixed windows: n_samples, rms, zero-crossing
    rate (computed on the centered signal)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data, meta in zip(pdf["media_id"], pdf["data"], pdf["meta"]):
                x, _sr = decode_audio(bytes(data), meta["format"])
                rms = float(np.sqrt(np.mean(x * x)))
                zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
                out.append((int(mid), len(x), round(rms, 9), round(zc, 9)))
            yield pd.DataFrame(out, columns=["media_id", "n_samples", "rms", "zcr"])

    src = df.where(F.col("kind") == "audio").select("media_id", "data", "meta")
    return src.mapInPandas(gen, "media_id bigint, n_samples bigint, rms double, zcr double")


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize: emits new payload + updated meta.
    Downstream operators can't tell a stub resized it — schema and
    byte layout are exactly what a real resize produces."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data, meta in zip(pdf["media_id"], pdf["data"], pdf["meta"]):
                h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
                img = decode_payload(bytes(data), meta["format"], (h, w, c))
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = img[yi][:, xi]
                out.append(
                    (
                        int(mid),
                        "image",
                        bytearray(resized.tobytes()),
                        {
                            "format": meta["format"],
                            "width": out_w,
                            "height": out_h,
                            "channels": c,
                            "sample_rate": 0,
                            "n_frames": 0,
                        },
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "kind", "data", "meta"])

    src = df.where(F.col("kind") == "image").select("media_id", "data", "meta")
    return src.mapInPandas(gen, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: explode every ``every_n``-th frame to its
    own row (media_id, frame_idx, frame binary). Output rows carry
    single frames — the unit downstream image ops consume."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data, meta in zip(pdf["media_id"], pdf["data"], pdf["meta"]):
                h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
                nf = int(meta["n_frames"])
                vid = decode_payload(bytes(data), meta["format"], (nf, h, w, c))
                for idx in range(0, nf, every_n):
                    out.append((int(mid), idx, bytearray(vid[idx].tobytes())))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    src = df.where(F.col("kind") == "video").select("media_id", "data", "meta")
    return src.mapInPandas(gen, "media_id bigint, frame_idx int, frame binary")
