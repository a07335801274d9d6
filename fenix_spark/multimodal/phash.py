"""Perceptual image hashing + image near-duplicate detection — the
visual analog of the text dedup family: re-encodes, resizes, and mild
edits of the same picture survive as NEAR hashes (small Hamming
distance), where byte-level dedup sees unrelated blobs.

dHash (difference hash, the robust/cheap member of the pHash family):

    grayscale → mean-pool to 9×8 → 64 horizontal-gradient sign bits.

Pooling averages away resampling and compression noise; the gradient
SIGN is invariant to global brightness/contrast shifts. Two encodings
of one image land within a few bits; unrelated images are ~32 bits
apart (independent coin flips).

Pipeline shape (mirrors the text side exactly):

- ``image_dhashes``: decode (the real BMP/PNG/JPEG codecs in
  multimodal/media.py) + hash per Arrow batch — image bytes never
  leave the executor; output is (id, dhash) — 16 bytes a row.
- ``image_neardup_pairs``: the SimHash pigeonhole trick generalized
  to 64 bits: split into ``max_hamming+1`` disjoint bands — any pair
  within the radius agrees EXACTLY on ≥1 band (pigeonhole, so recall
  is provably 1.0, not probabilistic), band equi-join, then exact
  ``bit_count(xor)`` verification for precision. All native
  expressions after the hash column; the band join is the only
  shuffle and it carries (id, 8-byte hash) rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRID_W, _GRID_H = 9, 8  # 8 horizontal gradients × 8 rows = 64 bits


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash of an (h, w[, c]) uint8 image."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)  # luminance-ish: plain channel mean
    h, w = a.shape
    if h == 0 or w == 0:
        raise ValueError("dhash64: empty image")
    # sub-grid images (tracker pixels, tiny thumbnails) would leave
    # empty pooling cells (NaN means → a degenerate hash-0 attractor
    # that glues unrelated tiny images); nearest-neighbor upsample to
    # at least the grid first
    if h < _GRID_H or w < _GRID_W:
        a = np.repeat(
            np.repeat(a, -(-_GRID_H // h), axis=0), -(-_GRID_W // w), axis=1
        )
        h, w = a.shape
    # mean-pool onto the 9×8 grid with edge-aligned bucket boundaries
    ys = np.linspace(0, h, _GRID_H + 1).round().astype(int)
    xs = np.linspace(0, w, _GRID_W + 1).round().astype(int)
    grid = np.empty((_GRID_H, _GRID_W))
    for r in range(_GRID_H):
        for c in range(_GRID_W):
            cell = a[ys[r] : max(ys[r + 1], ys[r] + 1), xs[c] : max(xs[c + 1], xs[c] + 1)]
            grid[r, c] = cell.mean()
    bits = (grid[:, 1:] > grid[:, :-1]).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def image_dhashes(
    df: DataFrame,
    id_col: str = "media_id",
    data_col: str = "data",
    fmt_col: str = "fmt",
    shape_cols: tuple[str, str, str] = ("height", "width", "channels"),
    exif_orientation: bool = False,
) -> DataFrame:
    """(id, dhash) per decodable image row; rows whose payload fails
    to decode get a NULL dhash (counted by callers, never a crash —
    crawl media is dirty). With ``exif_orientation=True`` the EXIF
    orientation tag (when present in the payload) is applied before
    hashing, so a camera-rotated re-upload of the same photo hashes
    with its upright original — rotation otherwise defeats dHash
    completely (``test_exif.py::test_orientation_fix_rescues_...``)."""
    import pandas as pd

    from fenix_spark.multimodal.media import decode_payload

    hc, wc, cc = shape_cols

    def gen(batches):
        for pdf in batches:
            ids, hashes = [], []
            for i in range(len(pdf)):
                ids.append(pdf["__id"].iloc[i])
                try:
                    shape = (
                        int(pdf["__h"].iloc[i]),
                        int(pdf["__w"].iloc[i]),
                        int(pdf["__c"].iloc[i]),
                    )
                    raw = bytes(pdf["__data"].iloc[i])
                    img = decode_payload(raw, pdf["__fmt"].iloc[i], shape)
                    if exif_orientation:
                        from fenix_spark.multimodal.exif import (
                            apply_orientation,
                            parse_exif,
                        )

                        img = apply_orientation(
                            img, parse_exif(raw).get("orientation")
                        )
                    hashes.append(np.int64(np.uint64(dhash64(img)) - (1 << 63)))
                except Exception:  # noqa: BLE001 - undecodable crawl blob
                    hashes.append(None)
            yield pd.DataFrame({"id": ids, "dhash": pd.array(hashes, dtype="Int64")})

    # ALIAS every input: nested refs like "meta.format" resolve in
    # select() but arrive in pandas under the LEAF name — fixed names
    # make the lookup correct for flat and nested columns alike
    src = df.select(
        F.col(id_col).alias("__id"),
        F.col(data_col).alias("__data"),
        F.col(fmt_col).alias("__fmt"),
        F.col(hc).alias("__h"),
        F.col(wc).alias("__w"),
        F.col(cc).alias("__c"),
    )
    return src.mapInPandas(gen, "id bigint, dhash bigint")


def _band_expr(dhash: Column, band: int, n_bands: int) -> Column:
    """Disjoint bit-slice ``band`` of the 64-bit hash (bands differ by
    ≤1 bit in width)."""
    base, extra = divmod(64, n_bands)
    start = band * base + min(band, extra)
    width = base + (1 if band < extra else 0)
    shifted = F.shiftrightunsigned(dhash, start)
    if width >= 64:
        # single 64-bit band (max_hamming=0): the all-ones mask does
        # not fit a positive int64 literal, and masking is a no-op
        return shifted
    # bitwiseAND, not `&`: Python `&` on Columns is logical AND
    return shifted.bitwiseAND(F.lit((1 << width) - 1))


def image_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 4
) -> DataFrame:
    """(id_a, id_b, hamming) for pairs within ``max_hamming`` bits —
    EXACT recall by pigeonhole over ``max_hamming+1`` bands, exact
    precision by the xor popcount verify. Null hashes are excluded."""
    if not 0 <= max_hamming <= 16:
        raise ValueError(f"max_hamming {max_hamming} outside [0, 16]")
    n_bands = max_hamming + 1
    h = hashes.where(F.col("dhash").isNotNull()).select("id", "dhash")
    banded = h.select(
        "id",
        "dhash",
        F.posexplode(
            F.array(*[_band_expr(F.col("dhash"), b, n_bands) for b in range(n_bands)])
        ).alias("band", "key"),
    )
    l = banded.select(
        F.col("id").alias("id_a"), F.col("dhash").alias("h_a"), "band", "key"
    )
    r = banded.select(
        F.col("id").alias("id_b"), F.col("dhash").alias("h_b"), "band", "key"
    )
    cand = (
        l.join(r, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
