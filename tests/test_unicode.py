"""Unicode hygiene (functions/unicode.py): normalization identity
pairs, invisible stripping native parity, conservative mojibake
repair (fixes the classics, never touches clean text — fuzzed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.functions.unicode import (
    fix_mojibake,
    fix_mojibake_py,
    normalize_text,
    strip_invisible,
    unicode_stats,
)


def _one(spark, expr_fn, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(expr_fn(F.col("t")).alias("o")).first()["o"]


def test_normalize_nfc_collapses_composed_decomposed(spark):
    composed = "café"
    decomposed = "café"
    assert composed != decomposed
    assert _one(spark, normalize_text, composed) == composed
    assert _one(spark, normalize_text, decomposed) == composed
    # dedup consequence: one distinct content after normalization
    df = spark.createDataFrame([(1, composed), (2, decomposed)], "id int, t string")
    n = (
        df.select(normalize_text(F.col("t")).alias("t"))
        .select(F.countDistinct("t"))
        .first()[0]
    )
    assert n == 1


def test_normalize_nfkc_folds_compatibility_forms(spark):
    def nfkc(c):
        return normalize_text(c, "NFKC")

    assert _one(spark, nfkc, "ﬁle") == "file"  # fi ligature
    assert _one(spark, nfkc, "Ｈｉ") == "Hi"  # fullwidth
    assert _one(spark, nfkc, "x²") == "x2"  # superscript
    # NFC does NOT fold these
    assert _one(spark, normalize_text, "ﬁle") == "ﬁle"
    with pytest.raises(ValueError, match="form"):
        normalize_text(F.col("t"), "NFX")


def test_strip_invisible_native_and_stats(spark):
    dirty = "a​b­c‮d﻿e\x07f"
    assert _one(spark, strip_invisible, dirty) == "abcdef"
    # \t \n \r survive
    assert _one(spark, strip_invisible, "a\tb\nc\rd") == "a\tb\nc\rd"
    s = _one(spark, unicode_stats, dirty + "�")
    assert s["n_invisible"] == 5 and s["n_replacement"] == 1
    assert s["n_chars"] == len(dirty) + 1
    clean = _one(spark, unicode_stats, "just text")
    assert clean["n_invisible"] == 0 and clean["n_mojibake_markers"] == 0
    moji = _one(spark, unicode_stats, "cafÃ© â€™tis")
    assert moji["n_mojibake_markers"] >= 2


MOJIBAKE_PAIRS = [
    ("cafÃ©", "café"),
    ("naÃ¯ve", "naïve"),
    ("â€™tis", "’tis"),  # right single quote
    ("â€œquotedâ€", "“quoted”"),
    (
        "SÃ£o Paulo â€“ Brasil",
        "São Paulo – Brasil",
    ),
    ("MÃ¼nchen", "München"),
]


def test_fix_mojibake_repairs_the_classics(spark):
    for broken, fixed in MOJIBAKE_PAIRS:
        assert fix_mojibake_py(broken) == fixed, broken
    df = spark.createDataFrame(
        [(i, b) for i, (b, _) in enumerate(MOJIBAKE_PAIRS)], "i int, t string"
    )
    got = {
        r["i"]: r["o"]
        for r in df.select("i", fix_mojibake(F.col("t")).alias("o")).collect()
    }
    assert got == {i: f for i, (_, f) in enumerate(MOJIBAKE_PAIRS)}


def test_fix_mojibake_never_touches_clean_text(spark):
    clean = [
        "plain ascii",
        "café déjà vu",  # real accents, no markers
        "Ã tergo",  # lone leading marker, no valid repair
        "â€œquotedâ€",  # TRUNCATED mojibake (lost byte): no valid
        # utf-8 re-decode exists — conservatism leaves it alone
        "日本語のテキスト",
        "emoji \U0001f389 stays",
        "",
        None,
    ]
    for t in clean:
        assert fix_mojibake_py(t) == t, t


def test_fix_mojibake_conservative_under_fuzz():
    """Property: for ANY string, the repair either returns the input
    unchanged or strictly shrinks it via a lossless reverse
    transcode — and never raises."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def prop(t):
        out = fix_mojibake_py(t)
        assert out is not None
        if out != t:
            # a repair always strictly shrinks, and re-mangling the
            # output reproduces the input (it really was mojibake)
            assert len(out) < len(t)
            from fenix_spark.functions.unicode import _encode_cp1252_total
            assert _encode_cp1252_total(t) == out.encode("utf-8")

    prop()


def test_fix_mojibake_roundtrip_of_generated_mangles():
    """Generate mojibake by construction (utf-8 bytes decoded as
    cp1252, the real-world fault) and verify the repair inverts it."""
    import random

    rng = random.Random(13)
    alphabet = "aeé漢ü–“”’€ñçøβ plain"
    for _ in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 30)))
        try:
            broken = s.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue  # some byte runs are not valid cp1252 text
        assert fix_mojibake_py(broken) == s, (s, broken)
