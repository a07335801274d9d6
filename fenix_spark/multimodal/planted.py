"""Planted media corpora for dedup evaluation — deterministic
generators producing REAL encoded payloads (BMP/PNG/JPEG, WAV) with
labeled duplicate groups, shared by the recall report
(`scripts/media_recall.py`) and the pinned floor tests.

Design notes:

- images are BILINEAR-smooth (nonzero gradients almost everywhere —
  the regime dHash is built for; blocky repeat-upsampling would leave
  equal-mean neighbor cells whose gradient sign is a coin flip under
  any perturbation).
- audio bases are TEXTURED: tone sweeps + amplitude-modulated
  broadband noise baked into the signal. Pure sweeps are pathological
  for Haitsma-Kalker hashing — their band-difference derivatives sit
  near zero, so every bit is fragile and even 0.1% perturbations
  produce BER ~0.25; with broadband texture the fingerprint behaves
  exactly as published (transcode ~0.00, unrelated ~0.5), and
  perturbation strengths below are calibrated to spread across the
  interesting BER band (requant/crop ~0.00, 3-tap lowpass ~0.05,
  10% noise ~0.22, unrelated ~0.5, 1.8 s-splice confusers ~0.38).
"""

from __future__ import annotations

import numpy as np

SR = 8000
H = W = 32


def smooth_image(rng: np.random.Generator) -> np.ndarray:
    """Bilinear-smooth RGB uint8 image from a 5×5 control grid."""
    small = rng.uniform(20, 235, (5, 5, 3))
    sh, sw = 5, 5
    ys = np.linspace(0, sh - 1, H)
    xs = np.linspace(0, sw - 1, W)
    y0 = np.floor(ys).astype(int)
    y1 = np.minimum(y0 + 1, sh - 1)
    wy = (ys - y0)[:, None, None]
    x0 = np.floor(xs).astype(int)
    x1 = np.minimum(x0 + 1, sw - 1)
    wx = (xs - x0)[None, :, None]
    a = small[y0][:, x0]
    b = small[y0][:, x1]
    c = small[y1][:, x0]
    d = small[y1][:, x1]
    out = (
        a * (1 - wy) * (1 - wx)
        + b * (1 - wy) * wx
        + c * wy * (1 - wx)
        + d * wy * wx
    )
    return out.astype(np.uint8)


def image_corpus(spark, n_base: int, seed: int = 7):
    """(df, truth_pairs): one 6-clique per base — BMP, PNG, JPEG q85,
    lossless WEBP (VP8L, r6), +12 brightness, σ=4 noise. Unrelated
    bases are distractors. The webp variant rides as RGBA with opaque
    alpha: dHash grayscales by plain channel mean, and a constant
    alpha is an affine map of the RGB mean — gradient SIGNS (the hash
    bits) are preserved exactly, so cross-format pairs still match."""
    from fenix_spark.multimodal.jpeg import encode_jpeg
    from fenix_spark.multimodal.media import encode_bmp, encode_png
    from fenix_spark.multimodal.vp8l_enc import encode_vp8l

    rng = np.random.default_rng(seed)
    rows, truth = [], []
    mid = 0
    for _ in range(n_base):
        img = smooth_image(rng)
        bright = np.clip(img.astype(np.int32) + 12, 0, 255).astype(np.uint8)
        noisy = np.clip(
            img.astype(np.float64) + rng.normal(0, 4, img.shape), 0, 255
        ).astype(np.uint8)
        rgba = np.concatenate(
            [img, np.full((H, W, 1), 255, dtype=np.uint8)], axis=2
        )
        variants = [
            (encode_bmp(img), "bmp", 3),
            (encode_png(img), "png", 3),
            (encode_jpeg(img, quality=85), "jpeg", 3),
            (encode_vp8l(rgba), "webp", 4),
            (encode_png(bright), "png", 3),
            (encode_png(noisy), "png", 3),
        ]
        group = []
        for data, fmt, nch in variants:
            rows.append((mid, data, fmt, H, W, nch))
            group.append(mid)
            mid += 1
        truth += [(a, b) for i, a in enumerate(group) for b in group[i + 1 :]]
    df = spark.createDataFrame(
        rows,
        "media_id bigint, data binary, fmt string, "
        "height int, width int, channels int",
    )
    return df, truth


def tone_mix(rng: np.random.Generator, seconds: float = 8.0) -> np.ndarray:
    """Evolving narrowband sweep mix (the PATHOLOGICAL case for H-K
    bits — kept for stress tests; prefer :func:`textured_track`)."""
    t = np.arange(int(SR * seconds)) / SR
    x = np.zeros_like(t)
    for _ in range(6):
        f0, f1 = rng.uniform(300, 1900, 2)
        sweep = f0 + (f1 - f0) * t / t[-1]
        x += rng.uniform(0.3, 1.0) * np.sin(
            2 * np.pi * sweep * t + rng.uniform(0, 6)
        )
    return (x / np.abs(x).max() * 2**14).astype(np.int64)


def textured_track(rng: np.random.Generator, seconds: float = 8.0) -> np.ndarray:
    """Sweeps + amplitude-modulated broadband texture — realistic
    band-energy structure with robust H-K decision margins."""
    x = tone_mix(rng, seconds=seconds).astype(np.float64)
    tex = rng.normal(0, 1, len(x))
    env = 1 + 0.5 * np.sin(
        2 * np.pi * np.arange(len(x)) / SR * rng.uniform(0.3, 2)
    )
    x = x + 0.08 * np.abs(x).max() * tex * env
    return (x / np.abs(x).max() * 2**14).astype(np.int64)


def audio_corpus(spark, n_base: int, n_confusers: int, seed: int = 17):
    """(df, truth_pairs, confuser_ids): one 5-clique per base —
    original, gain+requant "transcode", 8-hop crop, 3-tap lowpass
    (crude codec), 10% noise — plus snippet confusers sharing only a
    spliced ~1.8 s run with one base (true NON-duplicates)."""
    from fenix_spark.multimodal.media import encode_wav

    rng = np.random.default_rng(seed)
    rows, truth = [], []
    mid = 0
    bases = []
    for _ in range(n_base):
        x = textured_track(rng)
        bases.append(x)
        mx = np.abs(x).max()
        requant = (x * 0.25).astype(np.int64)
        crop = x[1024 * 8 :]
        lowpass = np.convolve(x, np.ones(3) / 3, mode="same").astype(np.int64)
        noisy = (x + rng.normal(0, mx * 0.10, x.shape)).astype(np.int64)
        group = []
        for sig in (x, requant, crop, lowpass, noisy):
            rows.append((mid, encode_wav(sig, SR), "wav"))
            group.append(mid)
            mid += 1
        truth += [(a, b) for i, a in enumerate(group) for b in group[i + 1 :]]
    confusers = []
    for j in range(n_confusers):
        y = textured_track(rng)
        src = bases[j % n_base]
        s, n = 1024 * 10, 1024 * 14
        y[s : s + n] = src[s : s + n]
        rows.append((mid, encode_wav(y, SR), "wav"))
        confusers.append(mid)
        mid += 1
    df = spark.createDataFrame(rows, "media_id bigint, data binary, fmt string")
    return df, truth, confusers


def clique_expand(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Transitive closure of a pair list into all intra-component
    pairs — how dedup pipelines actually CONSUME pair output
    (connected components → keep lists)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    groups: dict[int, list[int]] = {}
    for x in list(parent):
        groups.setdefault(find(x), []).append(x)
    out = []
    for members in groups.values():
        ms = sorted(members)
        out += [(a, b) for i, a in enumerate(ms) for b in ms[i + 1 :]]
    return out
