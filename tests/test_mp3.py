"""MPEG audio frame-header parsing tests: encoder/parser round-trip,
ID3v2 synchsafe skip, VBR detection from a hand-built mixed-bitrate
stream, Xing tag reading, malformed-input tolerance, and the Spark
mapInPandas wrapper."""

from __future__ import annotations

import struct

from fenix_spark.multimodal.mp3 import (
    encode_silent_mp3,
    mp3_metadata,
    parse_mp3_metadata,
)


def test_roundtrip_cbr():
    blob = encode_silent_mp3(2.0, bitrate_kbps=128, sample_rate=44100)
    m = parse_mp3_metadata(blob)
    assert m["ok"]
    assert m["version"] == "MPEG1"
    assert m["layer"] == 3
    assert m["sample_rate"] == 44100
    assert m["channels"] == 1
    assert m["bitrate_kbps"] == 128.0
    assert m["vbr"] is False
    # duration from COUNTED frames: n = round(2s * 44100 / 1152)
    assert m["n_frames"] == round(2.0 * 44100 / 1152)
    assert abs(m["duration_s"] - 2.0) < 0.02


def test_id3v2_skip():
    plain = parse_mp3_metadata(encode_silent_mp3(1.0))
    tagged = parse_mp3_metadata(encode_silent_mp3(1.0, with_id3=True))
    assert tagged["ok"]
    assert tagged["n_frames"] == plain["n_frames"]
    assert tagged["duration_s"] == plain["duration_s"]


def test_vbr_mixed_bitrates():
    a = encode_silent_mp3(0.5, bitrate_kbps=128)
    b = encode_silent_mp3(0.5, bitrate_kbps=192)
    m = parse_mp3_metadata(a + b)
    assert m["ok"]
    assert m["vbr"] is True
    assert m["bitrate_kbps"] == 160.0  # mean of the observed set
    na = parse_mp3_metadata(a)["n_frames"]
    nb = parse_mp3_metadata(b)["n_frames"]
    assert m["n_frames"] == na + nb


def test_xing_frame_count():
    # hand-place a Xing tag after the 17-byte mono MPEG1 side info
    blob = bytearray(encode_silent_mp3(1.0))
    at = 4 + 17
    blob[at : at + 4] = b"Xing"
    blob[at + 4 : at + 8] = struct.pack(">I", 1)  # flags: frames present
    blob[at + 8 : at + 12] = struct.pack(">I", 1234)
    m = parse_mp3_metadata(bytes(blob))
    assert m["ok"]
    assert m["xing_frames"] == 1234


def test_malformed_inputs_never_raise():
    for blob in (
        b"",
        b"\x00" * 100,
        b"\xff" * 100,  # sync-like but reserved fields
        b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f",  # ID3 size overruns buffer
        encode_silent_mp3(1.0)[:100],  # truncated mid-frame
    ):
        m = parse_mp3_metadata(blob)
        assert isinstance(m, dict)
    # truncation mid-frame still locks onto the full frames present
    two = encode_silent_mp3(1.0)
    m = parse_mp3_metadata(two[: len(two) // 2])
    assert m["ok"]
    assert m["n_frames"] >= 1


def test_resync_bound_rejects_garbage_prefix():
    noise = bytes((i * 37) % 251 for i in range(70000))
    m = parse_mp3_metadata(noise + encode_silent_mp3(1.0), max_resync=1024)
    assert m["ok"] is False  # sync hunt is bounded, not unbounded scan


def test_mp3_metadata_over_spark(spark):
    rows = [
        (0, encode_silent_mp3(1.0, bitrate_kbps=128)),
        (1, encode_silent_mp3(3.0, bitrate_kbps=192, with_id3=True)),
        (2, b"not audio at all"),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, data binary")
    got = {r.id: r for r in mp3_metadata(df).collect()}
    assert got[0].ok and got[0].bitrate_kbps == 128.0
    assert got[1].ok and abs(got[1].duration_s - 3.0) < 0.02
    assert got[2].ok is False


def test_vbr_bitrate_is_frame_weighted():
    # 2:1 frame ratio between the rates → weighted mean, not set mean
    a = encode_silent_mp3(1.0, bitrate_kbps=128)
    b = encode_silent_mp3(0.5, bitrate_kbps=192)
    m = parse_mp3_metadata(a + b)
    na = parse_mp3_metadata(a)["n_frames"]
    nb = parse_mp3_metadata(b)["n_frames"]
    want = round((na * 128 + nb * 192) / (na + nb), 3)
    assert m["bitrate_kbps"] == want
    assert m["bitrate_kbps"] != 160.0  # the set mean would say 160


def test_xing_frame_excluded_from_count_and_duration():
    """The Xing/Info frame carries no audio — a tagged stream must
    report one FEWER frame than the raw walk (ADVICE r5 off-by-one)."""
    plain = parse_mp3_metadata(encode_silent_mp3(1.0))
    blob = bytearray(encode_silent_mp3(1.0))
    at = 4 + 17  # after mono MPEG1 side info of frame 1
    blob[at : at + 4] = b"Xing"
    blob[at + 4 : at + 8] = struct.pack(">I", 1)
    blob[at + 8 : at + 12] = struct.pack(">I", plain["n_frames"] - 1)
    tagged = parse_mp3_metadata(bytes(blob))
    assert tagged["ok"]
    assert tagged["n_frames"] == plain["n_frames"] - 1
    assert tagged["duration_s"] < plain["duration_s"]
    assert tagged["xing_frames"] == plain["n_frames"] - 1


def test_id3v2_roundtrip_v23_and_v24():
    from fenix_spark.multimodal.mp3 import parse_id3v2, write_id3v2

    tags = dict(title="Søng Tïtle", artist="The Band", album="LP",
                year="1999", genre="Rock", track="7/12")
    for ver in (3, 4):
        blob = write_id3v2(version=ver, **tags) + b"\xff\xfbrest-of-stream"
        got = parse_id3v2(blob)
        assert got.pop("id3_version") == f"2.{ver}"
        assert got == tags


def test_id3v2_tolerates_garbage_and_absence():
    from fenix_spark.multimodal.mp3 import parse_id3v2, write_id3v2

    import numpy as np

    assert parse_id3v2(b"") == {}
    assert parse_id3v2(b"\xff\xfb\x90\x00audio") == {}
    assert parse_id3v2(b"ID3\x03\x00\x00\x7f\x7f\x7f\x7f") == {}  # size > data
    rng = np.random.default_rng(3)
    valid = write_id3v2(version=4, title="x", artist="y")
    for _ in range(150):
        buf = bytearray(valid)
        for _ in range(rng.integers(1, 6)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        out = parse_id3v2(bytes(buf))
        assert isinstance(out, dict)


def test_id3v2_coexists_with_frame_walk():
    """A tagged stream still parses its audio frames: the walker skips
    the tag, the tag parser reads it — two views of one blob."""
    from fenix_spark.multimodal.mp3 import (
        encode_silent_mp3,
        parse_id3v2,
        parse_mp3_metadata,
        write_id3v2,
    )

    audio = encode_silent_mp3(0.3)
    blob = write_id3v2(version=3, title="T", artist="A") + audio
    meta = parse_mp3_metadata(blob)
    assert meta["ok"] and meta["n_frames"] > 0
    tags = parse_id3v2(blob)
    assert tags["title"] == "T" and tags["artist"] == "A"
