"""Fuzz the container parsers: arbitrary bytes must never raise and
must terminate promptly — crawl media is adversarial by default, and
a parser that dies inside mapInPandas kills the whole task. Three
input classes per parser: pure random bytes, random bytes with a
valid magic prefix grafted on, and truncations/mutations of valid
fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import numpy as np

from fenix_spark.multimodal.gif import encode_gif, parse_gif_metadata
from fenix_spark.multimodal.mp3 import encode_silent_mp3, parse_mp3_metadata
from fenix_spark.multimodal.mp4 import encode_minimal_mp4, parse_mp4_metadata
from fenix_spark.multimodal.tiff import encode_tiff, parse_tiff_metadata
from fenix_spark.multimodal.webp import encode_minimal_webp, parse_webp_metadata

_rng = np.random.default_rng(0)
_pal = np.unique(_rng.integers(0, 256, (9, 3), dtype=np.uint8), axis=0)

VALID = {
    "mp3": encode_silent_mp3(0.5),
    "mp4": encode_minimal_mp4(1.0),
    "webp": encode_minimal_webp(32, 32),
    "gif": encode_gif(_pal[_rng.integers(0, len(_pal), (16, 17))]),
    "tiff": encode_tiff(_rng.integers(0, 256, (12, 13, 3), dtype=np.uint8)),
}
MAGIC = {
    "mp3": b"\xff\xfb",
    "mp4": b"\x00\x00\x00\x18ftyp",
    "webp": b"RIFF\x20\x00\x00\x00WEBP",
    "gif": b"GIF89a",
    "tiff": b"II\x2a\x00",
}
PARSERS = {
    "mp3": parse_mp3_metadata,
    "mp4": parse_mp4_metadata,
    "webp": parse_webp_metadata,
    "gif": parse_gif_metadata,
    "tiff": parse_tiff_metadata,
}


@settings(max_examples=200, deadline=2000)
@given(
    kind=st.sampled_from(sorted(PARSERS)),
    blob=st.binary(max_size=4096),
    prefix_magic=st.booleans(),
)
def test_random_bytes_never_raise(kind, blob, prefix_magic):
    data = (MAGIC[kind] + blob) if prefix_magic else blob
    out = PARSERS[kind](data)
    assert isinstance(out, dict)
    assert "ok" in out


@settings(max_examples=200, deadline=2000)
@given(
    kind=st.sampled_from(sorted(PARSERS)),
    cut=st.integers(min_value=0, max_value=400),
    flips=st.lists(
        st.tuples(st.integers(min_value=0, max_value=399), st.integers(0, 255)),
        max_size=4,
    ),
)
def test_mutated_fixtures_never_raise(kind, cut, flips):
    base = bytearray(VALID[kind])
    for pos, val in flips:
        if pos < len(base):
            base[pos] = val
    data = bytes(base[: max(0, len(base) - cut)])
    out = PARSERS[kind](data)
    assert isinstance(out, dict)
