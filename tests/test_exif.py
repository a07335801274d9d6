"""EXIF: APP1 writer ↔ parser round-trip over the repo's own JPEG
codec, the 8 orientation transforms as a dihedral group, the Spark
surface, and never-raise fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from fenix_spark.multimodal.exif import (
    apply_orientation,
    image_exif,
    parse_exif,
    write_exif_app1,
)
from fenix_spark.multimodal.jpeg import encode_jpeg


def _jpeg_with_exif(**kw) -> bytes:
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    j = encode_jpeg(img, quality=85)
    assert j[:2] == b"\xff\xd8"
    return j[:2] + write_exif_app1(**kw) + j[2:]


def test_roundtrip_through_own_jpeg():
    data = _jpeg_with_exif(
        orientation=6,
        make="ACME",
        model="Cam 3000",
        datetime_original="2021:07:04 12:00:00",
        exposure_time=(1, 250),
        iso=400,
        gps=True,
    )
    got = parse_exif(data)
    assert got["orientation"] == 6
    assert got["make"] == "ACME"
    assert got["model"] == "Cam 3000"
    assert got["datetime_original"] == "2021:07:04 12:00:00"
    assert got["exposure_time"] == pytest.approx(1 / 250)
    assert got["iso"] == 400
    assert got["has_gps"] is True


def test_minimal_segment_and_missing_fields():
    data = _jpeg_with_exif(orientation=3)
    got = parse_exif(data)
    assert got["orientation"] == 3
    assert "make" not in got and "iso" not in got
    assert got["has_gps"] is False


def test_no_exif_returns_empty():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert parse_exif(encode_jpeg(img)) == {}
    assert parse_exif(b"") == {}
    assert parse_exif(b"\xff\xd8\xff") == {}


def test_big_endian_tiff_parses():
    # raw big-endian TIFF header with one IFD0 orientation entry
    import struct

    ifd = struct.pack(">H", 1)
    ifd += struct.pack(">HHI", 274, 3, 1) + struct.pack(">H", 8) + b"\x00\x00"
    ifd += struct.pack(">I", 0)
    tiff = b"MM\x00*" + struct.pack(">I", 8) + ifd
    assert parse_exif(tiff)["orientation"] == 8


def test_orientation_transforms_are_the_dihedral_group():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    seen = set()
    for o in range(1, 9):
        stored = apply_orientation(img, inverse[o])
        up = apply_orientation(stored, o)
        np.testing.assert_array_equal(up, img)
        seen.add(apply_orientation(img, o).tobytes())
    assert len(seen) == 8  # all eight transforms are distinct
    # rotated storage changes shape; correction restores it
    assert apply_orientation(img, 6).shape == (9, 6, 3)
    np.testing.assert_array_equal(apply_orientation(img, None), img)


def test_orientation_fix_rescues_perceptual_hash():
    """A camera-rotated re-upload defeats dHash unless orientation is
    applied first — the pipeline reason this module exists."""
    from fenix_spark.multimodal.phash import dhash64

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    stored = apply_orientation(img, 8)  # as a rotate-90-CW camera stores it
    assert dhash64(stored) != dhash64(img)
    np.testing.assert_array_equal(apply_orientation(stored, 6), img)
    assert dhash64(apply_orientation(stored, 6)) == dhash64(img)


def test_image_exif_spark(spark):
    rows = [
        (1, bytearray(_jpeg_with_exif(orientation=6, make="ACME", iso=200))),
        (2, bytearray(_jpeg_with_exif(orientation=1))),
        (3, bytearray(b"not an image")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, data binary")
    got = {r["id"]: r for r in image_exif(df).collect()}
    assert got[1]["orientation"] == 6 and got[1]["make"] == "ACME"
    assert got[1]["iso"] == 200
    assert got[2]["orientation"] == 1 and got[2]["make"] is None
    assert got[3]["orientation"] is None and got[3]["has_gps"] is False
    assert got[4]["orientation"] is None


def test_fuzz_never_raises():
    rng = np.random.default_rng(9)
    valid = _jpeg_with_exif(orientation=6, make="ACME", gps=True)
    for _ in range(150):
        buf = bytearray(valid)
        for _ in range(rng.integers(1, 10)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        out = parse_exif(bytes(buf))
        assert isinstance(out, dict)
    for _ in range(50):
        n = int(rng.integers(0, 400))
        out = parse_exif(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        assert isinstance(out, dict)
        out = parse_exif(b"\xff\xd8" + rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        assert isinstance(out, dict)


def test_image_dhashes_exif_orientation_groups_rotated_reupload(spark):
    """End-to-end through the Spark hasher: a camera-rotated re-upload
    (rotated pixels + orientation tag) hashes with its upright
    original only when exif_orientation=True."""
    from fenix_spark.multimodal.phash import image_dhashes

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    stored = apply_orientation(img, 8)  # pixels as a 90°-CW camera stores them
    up_j = encode_jpeg(img, quality=95)
    rot_j = encode_jpeg(np.ascontiguousarray(stored), quality=95)
    rot_j = rot_j[:2] + write_exif_app1(orientation=6) + rot_j[2:]
    rows = [
        (1, bytearray(up_j), "jpeg", 32, 48, 3),
        (2, bytearray(rot_j), "jpeg", 48, 32, 3),
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, data binary, fmt string, height int, width int, channels int"
    )
    plain = {r["id"]: r["dhash"] for r in image_dhashes(df).collect()}
    fixed = {
        r["id"]: r["dhash"]
        for r in image_dhashes(df, exif_orientation=True).collect()
    }
    assert plain[1] != plain[2]  # rotation defeats dHash
    # after orientation fix the two differ only by jpeg requantization
    # of the SAME upright content — identical or nearly so
    assert bin(fixed[1] ^ fixed[2]).count("1") <= 4
    assert fixed[1] == plain[1]  # untagged rows are untouched
