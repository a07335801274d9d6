"""Readability scores — the classic text-quality signals (Flesch
Reading Ease, Flesch-Kincaid grade, ARI, Coleman-Liau), all as native
column expressions: zero Python in the row path, scan-local at any
scale, and deterministic (DuckDB-mirrorable regex counts).

Published formulas (all public):

    FRE  = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    FKGL = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59
    ARI  = 4.71·(chars/words) + 0.5·(words/sentences) − 21.43
    CLI  = 0.0588·L − 0.296·S − 15.8     (L = letters per 100 words,
                                          S = sentences per 100 words)

Sentence counts come from ``functions/sentences.split_sentences`` (the
guarded native splitter); words are whitespace tokens; ARI/CLI use
EXACT counts only. Syllables (Flesch family) are the standard
vowel-group ESTIMATE — contiguous [aeiouy]+ runs per word, minus
trailing silent 'e' (consonant+e word endings), floored at one
syllable per word — stated as a heuristic, like every non-dictionary
syllable counter. Scores are only defined for text with ≥1 word and
≥1 sentence; degenerate inputs yield NULL rather than ±inf.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.sentences import split_sentences

__all__ = [
    "word_count",
    "sentence_count",
    "syllable_estimate",
    "flesch_reading_ease",
    "flesch_kincaid_grade",
    "automated_readability_index",
    "coleman_liau_index",
    "readability_stats",
]


def word_count(text: Column) -> Column:
    """Tokens carrying at least one letter or digit — bare punctuation
    runs ("...", "—") are not words for readability purposes."""
    toks = F.split(F.trim(text), "\\s+")
    return F.size(
        F.filter(toks, lambda t: t.rlike("[\\p{L}\\p{N}]"))
    ).cast("int")


def sentence_count(text: Column) -> Column:
    return F.size(split_sentences(text)).cast("int")


def syllable_estimate(text: Column) -> Column:
    """Vowel-group heuristic with the ≥1 floor applied PER WORD: Σ
    over words of max(1, vowel runs − trailing silent 'e' runs). A
    higher-order aggregate over the token array — JVM-side, no Python
    UDF. (Earlier revisions applied the floor globally, which let
    zero-syllable function words like "the" deflate syllables/word and
    inflate FRE; the per-word floor is the documented heuristic.)"""
    toks = F.filter(
        F.split(F.trim(F.lower(text)), "\\s+"),
        lambda t: t.rlike("[\\p{L}\\p{N}]"),
    )
    # trailing consonant+e (silent e): "mate", "fore"; NOT "see"/"tree"
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc
        + F.greatest(
            F.lit(1),
            F.regexp_count(t, F.lit("[aeiouy]+"))
            - F.regexp_count(t, F.lit("[b-df-hj-np-tv-z]e\\b")),
        ),
    ).cast("int")


def _ratios(text: Column) -> tuple[Column, Column, Column, Column]:
    w = word_count(text).cast("double")
    s = sentence_count(text).cast("double")
    valid = (w > 0) & (s > 0)
    return w, s, valid, F.when(valid, w / s)


def flesch_reading_ease(text: Column) -> Column:
    w, s, valid, wps = _ratios(text)
    spw = syllable_estimate(text).cast("double") / w
    return F.when(valid, 206.835 - 1.015 * wps - 84.6 * spw)


def flesch_kincaid_grade(text: Column) -> Column:
    w, s, valid, wps = _ratios(text)
    spw = syllable_estimate(text).cast("double") / w
    return F.when(valid, 0.39 * wps + 11.8 * spw - 15.59)


def automated_readability_index(text: Column) -> Column:
    w, s, valid, wps = _ratios(text)
    chars = F.regexp_count(text, F.lit("\\S")).cast("double")
    return F.when(valid, 4.71 * (chars / w) + 0.5 * wps - 21.43)


def coleman_liau_index(text: Column) -> Column:
    w, s, valid, _ = _ratios(text)
    letters = F.regexp_count(F.lower(text), F.lit("[a-z]")).cast("double")
    ell = letters / w * 100.0
    ess = s / w * 100.0
    return F.when(valid, 0.0588 * ell - 0.296 * ess - 15.8)


def readability_stats(df: DataFrame, text_col: str) -> DataFrame:
    """``df`` + (n_words, n_sentences, n_syllables, fre, fk_grade,
    ari, cli) — one projection, all counts shared via lateral-safe
    two-step select."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_words": word_count(t),
            "n_sentences": sentence_count(t),
            "n_syllables": syllable_estimate(t),
            "fre": F.round(flesch_reading_ease(t), 3),
            "fk_grade": F.round(flesch_kincaid_grade(t), 3),
            "ari": F.round(automated_readability_index(t), 3),
            "cli": F.round(coleman_liau_index(t), 3),
        }
    )
