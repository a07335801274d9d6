"""Sentence splitting (functions/sentences.py): boundary cases pinned
— abbreviations, initials, decimals, ellipses, quotes, multi-space —
plus the conservative-failure contract and the exploded view."""

from __future__ import annotations

from pyspark.sql import functions as F

from fenix_spark.functions.sentences import (
    explode_sentences,
    split_sentences,
)


def _split(spark, text):
    return (
        spark.createDataFrame([(text,)], "t string")
        .select(split_sentences(F.col("t")).alias("s"))
        .first()["s"]
    )


def test_plain_boundaries(spark):
    got = _split(spark, "First one. Second here! Third? Fourth.")
    assert got == ["First one.", "Second here!", "Third?", "Fourth."]


def test_abbreviations_do_not_split(spark):
    got = _split(spark, "Dr. Smith met Mr. Jones. They left.")
    assert got == ["Dr. Smith met Mr. Jones.", "They left."]
    got = _split(spark, "See Fig. 3 for details. Results follow.")
    assert got == ["See Fig. 3 for details.", "Results follow."]
    got = _split(spark, "Cities like Boston, etc. are dense.")
    assert got == ["Cities like Boston, etc. are dense."]


def test_initials_do_not_split(spark):
    got = _split(spark, "J. R. Smith wrote it. We read it.")
    assert got == ["J. R. Smith wrote it.", "We read it."]


def test_decimals_never_split(spark):
    got = _split(spark, "It ran 3.14 km. Then it stopped.")
    assert got == ["It ran 3.14 km.", "Then it stopped."]


def test_ellipsis_is_one_terminal(spark):
    got = _split(spark, "Well... Maybe so. Fine.")
    assert got == ["Well...", "Maybe so.", "Fine."]


def test_quotes_and_brackets(spark):
    got = _split(spark, 'He said "stop." Then left. (Really.) Yes.')
    assert got == ['He said "stop."', "Then left.", "(Really.)", "Yes."]


def test_multispace_and_empties(spark):
    got = _split(spark, "One.   Two.\n\nThree.")
    assert got == ["One.", "Two.", "Three."]
    assert _split(spark, "") == []
    # NULL text stays NULL
    row = (
        spark.createDataFrame([(None,)], "t string")
        .select(split_sentences(F.col("t")).alias("s"))
        .first()
    )
    assert row["s"] is None


def test_lowercase_continuation_stays_glued(spark):
    # no uppercase opener after the terminal → conservative no-split
    got = _split(spark, "see sec. iv for details.")
    assert got == ["see sec. iv for details."]


def test_explode_sentences_order_and_ids(spark):
    df = spark.createDataFrame(
        [(1, "A one. B two. C three."), (2, "Single.")],
        "doc_id bigint, text string",
    )
    rows = explode_sentences(df, "text", "doc_id").collect()
    got = {(r["id"], r["sent_idx"]): r["sentence"] for r in rows}
    assert got == {
        (1, 0): "A one.",
        (1, 1): "B two.",
        (1, 2): "C three.",
        (2, 0): "Single.",
    }
