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

DECODE STUB — READ THIS: real decoding needs codec libs absent from
this container. ``decode_payload`` fakes it deterministically: the
payload bytes are interpreted as the raw sample/pixel buffer
(repeated/truncated to the metadata-implied size). Swapping in a real
decoder (``PIL.Image.open``/``soundfile.read``/``av``) changes ONLY
that function — every operator downstream consumes the decoded
ndarray and is already real. Unknown formats raise NotImplementedError
exactly where a real codec would.
"""

from __future__ import annotations

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


def decode_payload(data: bytes, fmt: str, shape: tuple[int, ...]) -> np.ndarray:
    """STUB decoder: deterministic fake for the ``raw*`` pseudo-formats
    (payload bytes tiled to ``shape``, uint8). A real build replaces
    this body with the codec call; the NotImplementedError branch is
    where e.g. ``PIL.Image.open(io.BytesIO(data))`` would go."""
    if fmt not in _FAKE_FORMATS:
        raise NotImplementedError(
            f"no codec for format {fmt!r} in this environment; "
            "decode_payload is the single swap-in point for real codecs"
        )
    n = int(np.prod(shape))
    buf = np.frombuffer(data, dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = -(-n // len(buf))  # ceil-divide, then truncate
    return np.tile(buf, reps)[:n].reshape(shape)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench: payload bytes
    derive from a seeded RNG per media_id."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h, c, sr, nf, fmt = 16 + (i % 4) * 8, 12 + (i % 3) * 4, 3, 0, 0, "rawimg"
            nbytes = w * h * c
        elif kind == "audio":
            w, h, c, sr, nf, fmt = 0, 0, 1, 8000, 0, "rawpcm"
            nbytes = 4000 + (i % 5) * 800
        else:
            w, h, c, sr, nf, fmt = 8, 8, 3, 0, 6 + (i % 4), "rawvid"
            nbytes = 8 * 8 * 3 * nf
        payload = rng.integers(0, 256, size=nbytes, dtype=np.uint8).tobytes()
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
                buf = decode_payload(bytes(data), meta["format"], (len(bytes(data)),))
                x = buf.astype(np.float64) - 128.0
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
