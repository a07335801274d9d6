"""Sentence splitting — the rule-based, scan-local segmenter a
sentence-level pipeline stage needs (sentence dedup, quote detection,
per-sentence quality filters, chunking on sentence boundaries instead
of mid-sentence char spans à la ``functions/chunking.py``).

One native ``F.split`` on a Java regex — no Python in the row path, so
the operator is pure scan work at any scale. The boundary rule is the
classic one: a sentence terminal (``. ! ? …``, optionally followed by
closing quotes/brackets) + whitespace + an upward-looking opener
(uppercase letter, digit, or opening quote/bracket). Guards, all as
bounded lookbehinds (Java requires bounded width):

- common abbreviations (Mr. Dr. Prof. etc. e.g. i.e. vs. Fig. No. …)
  do not end a sentence;
- single-letter initials ("J. Smith") do not end a sentence;
- decimals ("3.14") never match (the split needs whitespace after the
  terminal) and ellipses are treated as ONE terminal.

This is deliberately a light segmenter with documented failure modes
(an abbreviation ending a true sentence followed by an uppercase word
stays glued — the conservative direction for dedup keys), not a
trained model: determinism and engine-portability beat the last
percent of F1 here, exactly like ``functions/langid`` vs a neural
classifier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["SENTENCE_SPLIT_REGEX", "split_sentences", "explode_sentences"]

# Guarded abbreviations: each becomes a bounded negative lookbehind on
# the char BEFORE the terminal dot. Single-letter initials are the
# (?<!\b[A-Z]) guard.
_ABBREV = [
    "Mr", "Mrs", "Ms", "Dr", "Prof", "Sr", "Jr", "St",
    "vs", "etc", "approx", "dept", "est", "min", "max",
    "Fig", "fig", "Eq", "eq", "No", "no", "al", "Inc", "Ltd", "Co",
    "Jan", "Feb", "Mar", "Apr", "Jun", "Jul", "Aug", "Sep", "Sept",
    "Oct", "Nov", "Dec",
    "e.g", "i.e", "cf", "ca", "resp",
]


def _build_regex() -> str:
    # the split point sits ON the whitespace; everything contextual is
    # lookaround, so terminals and closing quotes stay with the LEFT
    # sentence. Guards include the terminal dot ("(?<!\bDr\.)" — the
    # position is after the dot); closers live inside a BOUNDED
    # lookbehind (Java lookbehind requires finite width).
    escaped = [a.replace(".", "\\.") for a in _ABBREV]
    guards = "".join(f"(?<!\\b{a}\\.)" for a in escaped)
    initial_guard = "(?<!\\b[A-Z]\\.)"
    return (
        f"{guards}{initial_guard}"
        + "(?<=[.!?…][\"'”’)\\]]{0,2})\\s+"
        + "(?=[\"'“‘(\\[]*[A-Z0-9À-Þ])"
    )


SENTENCE_SPLIT_REGEX = _build_regex()


def split_sentences(text: Column) -> Column:
    """array<string> of sentences (whitespace-trimmed, empties
    dropped). NULL text → NULL."""
    parts = F.split(text, SENTENCE_SPLIT_REGEX)
    # explicit lambda: F.transform(parts, F.trim) would bind trim's
    # optional second parameter to the element INDEX (trim chars), a
    # silent no-op/corruption — the HOF passes (x, i) to any callable
    # accepting two args
    trimmed = F.transform(parts, lambda s: F.trim(s))
    return F.filter(trimmed, lambda s: F.length(s) > 0)


def explode_sentences(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, sent_idx, sentence) — one row per sentence, 0-based index
    preserving document order. The sentence-level view the dedup /
    quality families run on; pure explode, zero shuffle."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(split_sentences(F.col(text_col))).alias(
            "sent_idx", "sentence"
        ),
    )
