"""MP4 sample-table extraction: byte-exact round trips through the
sample-carrying fixture writer, truncation tolerance, the Spark
surface, and never-raise fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from fenix_spark.multimodal.mp4 import (
    encode_mp4_with_samples,
    mp4_sample_ranges,
    parse_mp4_metadata,
    sample_encoded_frames,
)


def _samples(rng, n=8):
    return [rng.integers(0, 256, int(sz), dtype=np.uint8).tobytes()
            for sz in rng.integers(40, 400, n)]


def test_roundtrip_multi_chunk():
    rng = np.random.default_rng(3)
    samples = _samples(rng, 8)
    data = encode_mp4_with_samples(samples, chunking=(3, 2), sync=(1, 4, 7))
    tracks = mp4_sample_ranges(data)
    assert len(tracks) == 1
    t = tracks[0]
    assert t["kind"] == "vide" and t["codec"] == "avc1" and t["clipped"] == 0
    got = [data[o : o + s] for o, s in t["samples"]]
    assert got == samples
    assert t["sync"] == {1, 4, 7}
    # the same fixture still parses as ordinary metadata
    meta = parse_mp4_metadata(data)
    assert meta["ok"] and meta["codecs"] == ["avc1"]


def test_single_sample_and_uniform_chunking():
    rng = np.random.default_rng(4)
    samples = _samples(rng, 1)
    data = encode_mp4_with_samples(samples, chunking=(1,), sync=(1,))
    t = mp4_sample_ranges(data)[0]
    assert [data[o : o + s] for o, s in t["samples"]] == samples


def test_truncated_mdat_clips_not_raises():
    rng = np.random.default_rng(5)
    samples = _samples(rng, 6)
    # faststart layout: moov precedes mdat, so a partially-downloaded
    # blob keeps its tables while tail samples overrun EOF — exactly
    # the crawl case the clipping path exists for
    data = encode_mp4_with_samples(samples, chunking=(2,), moov_first=True)
    cut = data[:-300]
    tracks = mp4_sample_ranges(cut)
    # offsets now overrun for the tail samples only
    assert tracks and tracks[0]["clipped"] >= 1
    t = tracks[0]
    for o, s in t["samples"]:
        assert o + s <= len(cut)


def test_sample_encoded_frames_spark(spark):
    rng = np.random.default_rng(6)
    s1 = _samples(rng, 6)
    rows = [
        (1, bytearray(encode_mp4_with_samples(s1, chunking=(2,), sync=(1, 5)))),
        (2, bytearray(b"garbage")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, data binary")
    got = sample_encoded_frames(df).collect()
    assert {r["id"] for r in got} == {1}
    assert [bytes(r["frame"]) for r in sorted(got, key=lambda r: r["frame_idx"])] == s1
    assert [r["is_sync"] for r in sorted(got, key=lambda r: r["frame_idx"])] == [
        True, False, False, False, True, False,
    ]
    sync = sample_encoded_frames(df, sync_only=True).collect()
    assert sorted(r["frame_idx"] for r in sync) == [0, 4]
    every2 = sample_encoded_frames(df, every_n=2).collect()
    assert sorted(r["frame_idx"] for r in every2) == [0, 2, 4]


def test_fuzz_never_raises():
    rng = np.random.default_rng(7)
    valid = encode_mp4_with_samples(_samples(rng, 5), chunking=(2,))
    for _ in range(120):
        buf = bytearray(valid)
        for _ in range(rng.integers(1, 8)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        out = mp4_sample_ranges(bytes(buf[: rng.integers(1, len(buf))]))
        assert isinstance(out, list)
    for _ in range(40):
        out = mp4_sample_ranges(rng.integers(0, 256, 512, dtype=np.uint8).tobytes())
        assert isinstance(out, list)


def test_moov_first_layout_roundtrips():
    rng = np.random.default_rng(8)
    samples = _samples(rng, 7)
    data = encode_mp4_with_samples(samples, chunking=(4, 2), sync=(1,), moov_first=True)
    t = mp4_sample_ranges(data)[0]
    assert t["clipped"] == 0
    assert [data[o : o + s] for o, s in t["samples"]] == samples


def test_video_frame_dedup_pairs(spark):
    """A trimmed re-upload (same encode, frames dropped) and an exact
    re-mux (different chunking!) both pair with the original; an
    unrelated video does not."""
    from fenix_spark.multimodal.mp4 import video_frame_dedup_pairs

    rng = np.random.default_rng(10)
    frames = _samples(rng, 10)
    other = _samples(rng, 8)
    rows = [
        (1, bytearray(encode_mp4_with_samples(frames, chunking=(3,)))),
        (2, bytearray(encode_mp4_with_samples(frames[2:], chunking=(2,)))),  # trim
        (3, bytearray(encode_mp4_with_samples(frames, chunking=(5,), moov_first=True))),  # re-mux
        (4, bytearray(encode_mp4_with_samples(other, chunking=(3,)))),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, data binary")
    fr = sample_encoded_frames(df)
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_frames"]
        for r in video_frame_dedup_pairs(fr).collect()
    }
    assert pairs[(1, 3)] == 10  # re-mux: all frames shared
    assert pairs[(1, 2)] == 8   # trim: the kept frames
    assert pairs[(2, 3)] == 8
    assert not any(4 in p for p in pairs)
