"""Gopher repetition signals: hand-computed fractions on crafted
documents, the no-double-count contract for overlapping duplicated
n-grams, Spark==pure-python parity on real documents, and the filter's
threshold semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.functions.repetition import (
    GOPHER_THRESHOLDS,
    gopher_repetition_filter,
    repetition_signals,
    repetition_signals_py,
)


def test_dup_line_fractions_hand_computed():
    text = "aaa\nbbb\naaa\nccc\naaa"  # 'aaa' ×3 → 2 extra of 5 lines
    s = repetition_signals_py(text)
    assert s["dup_line_frac"] == pytest.approx(2 / 5)
    assert s["dup_line_char_frac"] == pytest.approx(2 * 3 / len(text))
    clean = repetition_signals_py("one\ntwo\nthree")
    assert clean["dup_line_frac"] == 0.0


def test_top_ngram_char_fraction_hand_computed():
    # 'the cat' appears 3×: 6 alpha chars each over total chars
    text = "the cat sat and the cat ran and the cat hid"
    s = repetition_signals_py(text)
    assert s["top2gram_char_frac"] == pytest.approx(3 * len("thecat") / len(text))
    # a singleton top n-gram contributes 0 (nothing is repeated)
    s2 = repetition_signals_py("all words here are fully unique tokens")
    assert s2["top2gram_char_frac"] == 0.0


def test_dup_ngram_no_double_count():
    # 'a b c d e' ×3: every 5-gram duplicated and overlapping —
    # covered chars count ONCE (word chars over text length)
    text = " ".join(["a b c d e"] * 3)
    s = repetition_signals_py(text)
    want = sum(len(w) for w in text.split()) / len(text)
    assert s["dup5gram_char_frac"] == pytest.approx(want)
    assert s["dup5gram_char_frac"] <= 1.0


def test_empty_and_short_documents():
    assert all(v == 0.0 for v in repetition_signals_py("").values())
    assert all(v == 0.0 for v in repetition_signals_py("two words").values())


def test_spark_column_matches_python_mirror(spark, documents):
    docs = documents.limit(60)
    got = docs.select(
        "doc_id", repetition_signals(F.col("text")).alias("s"), "text"
    ).collect()
    for r in got:
        want = repetition_signals_py(r.text or "")
        for f, v in want.items():
            assert r.s[f] == pytest.approx(v), (r.doc_id, f)


def test_gopher_filter_thresholds(spark):
    spammy = ("buy cheap pills now " * 40).strip()
    clean = (
        "A quiet morning unfolded over the harbor while fishermen "
        "hauled their nets and gulls wheeled overhead looking for "
        "an easy meal among the ropes and crates."
    )
    df = spark.createDataFrame(
        [(1, spammy), (2, clean)], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in gopher_repetition_filter(df, "text").collect()}
    assert not out[1].repetition_ok
    assert out[2].repetition_ok
    # custom threshold override + unknown key rejection
    strict = gopher_repetition_filter(
        df, "text", thresholds={"top2gram_char_frac": 1.0}
    )
    assert strict.where("doc_id = 2").head().repetition_ok
    with pytest.raises(ValueError, match="unknown threshold"):
        gopher_repetition_filter(df, "text", thresholds={"nope": 0.1})
    # signals struct carries exactly the documented fields
    assert set(GOPHER_THRESHOLDS) == set(
        out[1].repetition_ok_signals.asDict()
    )
