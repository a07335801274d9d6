"""Perceptual image hash tests: invariance properties of dHash
(brightness shift, re-encode, resize), separation of unrelated
images, exact-recall pigeonhole pairs vs brute force, dirty-blob
tolerance, end-to-end over real codecs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.multimodal.media import encode_bmp, encode_png
from fenix_spark.multimodal.phash import dhash64, image_dhashes, image_neardup_pairs


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _img(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # smooth-ish image: random low-res upsampled, so pooling is stable
    # bounded range so a +40 brightness shift cannot clip (clipping
    # at 255 would legitimately flip saturated-region gradients)
    small = rng.integers(20, 200, size=(6, 8, 3))
    return np.repeat(np.repeat(small, h // 6, axis=0), w // 8, axis=1).astype(np.uint8)


def test_dhash_invariances():
    img = _img(3)
    base = dhash64(img)
    # global brightness shift: gradient signs unchanged
    brighter = np.clip(img.astype(int) + 40, 0, 255).astype(np.uint8)
    assert _ham(base, dhash64(brighter)) == 0
    # 2x upscale: pooling recovers the same grid
    # 2x upscale: grid bucket boundaries round differently at 2x
    # resolution, so a few edge cells shift — small, not zero
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    assert _ham(base, dhash64(up)) <= 4
    # mild noise: few bits flip
    noisy = np.clip(
        img.astype(int) + np.random.default_rng(0).integers(-8, 9, img.shape), 0, 255
    ).astype(np.uint8)
    assert _ham(base, dhash64(noisy)) <= 6


def test_unrelated_images_are_far():
    dists = [
        _ham(dhash64(_img(a)), dhash64(_img(b)))
        for a, b in [(1, 2), (3, 4), (5, 6), (7, 8)]
    ]
    assert min(dists) > 10  # ~32 expected for independent images


def test_pairs_exact_recall_vs_brute_force(spark):
    rng = np.random.default_rng(9)
    base_imgs = [_img(s) for s in range(12)]
    rows = []
    for i, img in enumerate(base_imgs):
        rows.append((2 * i, int(np.int64(np.uint64(dhash64(img)) - (1 << 63)))))
        # a near-variant within the radius
        noisy = np.clip(img.astype(int) + rng.integers(-6, 7, img.shape), 0, 255).astype(np.uint8)
        rows.append((2 * i + 1, int(np.int64(np.uint64(dhash64(noisy)) - (1 << 63)))))
    hashes = spark.createDataFrame(rows, "id bigint, dhash bigint")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in image_neardup_pairs(hashes, max_hamming=6).collect()
    }
    # brute force over all pairs
    want = {}
    vals = dict(rows)
    ids = sorted(vals)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin((vals[ids[i]] ^ vals[ids[j]]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                want[(ids[i], ids[j])] = d
    assert got == want  # pigeonhole bands: EXACT recall and precision
    assert all((2 * i, 2 * i + 1) in got for i in range(12))


def test_end_to_end_over_real_codecs(spark):
    img = _img(21)
    rows = [
        (0, encode_bmp(img), "bmp", img.shape[0], img.shape[1], 3),
        (1, encode_png(img), "png", img.shape[0], img.shape[1], 3),
        (2, b"corrupt blob", "png", 4, 4, 3),
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, data binary, fmt string, height int, width int, channels int"
    )
    got = {r.id: r.dhash for r in image_dhashes(df).collect()}
    # lossless codecs: identical pixels → identical hash
    assert got[0] == got[1] and got[0] is not None
    assert got[2] is None  # dirty blob → null, not a crash

    pairs = image_neardup_pairs(
        spark.createDataFrame(
            [(k, v) for k, v in got.items() if v is not None], "id bigint, dhash bigint"
        ),
        max_hamming=2,
    ).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(0, 1, 0)]


def test_tiny_images_hash_distinctly():
    # sub-grid images (tracker pixels) must not collapse to hash 0
    a = np.arange(20, dtype=np.uint8).reshape(4, 5)
    b = (255 - np.arange(20, dtype=np.uint8)).reshape(4, 5)
    ha, hb = dhash64(a), dhash64(b)
    assert ha != 0 or hb != 0
    assert _ham(ha, hb) > 8  # opposite gradients → far apart
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty image"):
        dhash64(np.zeros((0, 5), dtype=np.uint8))


def test_planted_corpus_floor(spark):
    """Pinned floor on the planted image corpus (the RECALL.md
    evaluation at smaller size): at max_hamming=4, component-level
    precision is perfect and recall ≥ 0.95."""
    from fenix_spark.multimodal.planted import (
        clique_expand,
        image_corpus,
    )
    from fenix_spark.operators.dedup import dedup_eval

    df, truth = image_corpus(spark, n_base=12)
    hashes = image_dhashes(df)
    pred = [
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(hashes, max_hamming=4)
        .select("id_a", "id_b")
        .collect()
    ]
    truth_df = spark.createDataFrame(truth, "id_l bigint, id_r bigint")
    pred_df = spark.createDataFrame(
        clique_expand(pred) or [(-1, -2)], "id_a bigint, id_b bigint"
    )
    m = dedup_eval(pred_df, truth_df, ("id_a", "id_b"), ("id_l", "id_r"))
    assert m["precision"] == 1.0
    assert m["recall"] >= 0.95
