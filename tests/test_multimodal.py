"""Multimodal plumbing tests: the decode step is a documented stub,
so these pin what IS real — schemas, mapInPandas batch flow,
determinism, frame explosion shapes, and resize byte layout.
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
    with pytest.raises(NotImplementedError, match="codec"):
        decode_payload(b"\x00\x01", "jpeg", (2, 1))


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
    meta = {r.media_id: len(bytes(r.data)) for r in media.where("kind='audio'").collect()}
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
