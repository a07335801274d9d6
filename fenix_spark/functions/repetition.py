"""Gopher-style repetition quality signals (Rae et al. 2021,
"Scaling Language Models" §A1.1 — the public repetition rules most
modern corpus filters reuse): documents dominated by repeated lines or
n-grams are boilerplate/spam, and these fractions are the standard
detectors.

Signals per document (word = whitespace token, line = ``\\n`` split,
both per the paper):

- ``dup_line_frac``: occurrences of a line beyond its first, over
  total lines; ``dup_line_char_frac``: their characters over total
  characters.
- ``top{2,3,4}gram_char_frac``: characters covered by the single most
  frequent word n-gram (count × n-gram length / total chars).
- ``dup{5..10}gram_char_frac``: fraction of characters covered by ANY
  duplicated n-gram — character positions are marked once, so
  overlapping duplicated n-grams never double-count (the paper's
  stated correction).

Computed in ONE Arrow-batched pass per document (``mapInPandas``-class
pandas UDF — a Counter pass per doc is linear; the O(L²)-per-doc
native-expression alternative loses on long documents). Scan-local:
nothing shuffles, the signals append as a struct column.

``gopher_repetition_filter`` applies the paper's published thresholds
(Table A1): dup_line 0.30, dup_line_char 0.20, top-2/3/4-gram
0.20/0.18/0.16, dup-5..10-gram 0.15/0.14/0.13/0.12/0.11/0.10.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "repetition_signals",
    "repetition_signals_py",
    "gopher_repetition_filter",
    "GOPHER_THRESHOLDS",
]

_FIELDS = (
    ["dup_line_frac", "dup_line_char_frac"]
    + [f"top{n}gram_char_frac" for n in (2, 3, 4)]
    + [f"dup{n}gram_char_frac" for n in range(5, 11)]
)

GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top2gram_char_frac": 0.20,
    "top3gram_char_frac": 0.18,
    "top4gram_char_frac": 0.16,
    "dup5gram_char_frac": 0.15,
    "dup6gram_char_frac": 0.14,
    "dup7gram_char_frac": 0.13,
    "dup8gram_char_frac": 0.12,
    "dup9gram_char_frac": 0.11,
    "dup10gram_char_frac": 0.10,
}


def repetition_signals_py(text: str) -> dict[str, float]:
    """Pure-Python single-document reference implementation — the
    Spark column function delegates here per row, so the two can never
    drift."""
    out = dict.fromkeys(_FIELDS, 0.0)
    if not text:
        return out
    total_chars = len(text)

    lines = [ln for ln in text.split("\n") if ln.strip()]
    if lines:
        counts = Counter(lines)
        extra = sum(c - 1 for c in counts.values())
        out["dup_line_frac"] = extra / len(lines)
        out["dup_line_char_frac"] = (
            sum((c - 1) * len(ln) for ln, c in counts.items() if c > 1)
            / total_chars
        )

    words = text.split()
    for n in (2, 3, 4):
        if len(words) < n:
            continue
        grams = Counter(
            tuple(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        gram, c = max(grams.items(), key=lambda kv: (kv[1], kv[0]))
        if c > 1:
            out[f"top{n}gram_char_frac"] = (
                c * sum(len(w) for w in gram) / total_chars
            )

    for n in range(5, 11):
        if len(words) < n:
            continue
        grams = Counter(
            tuple(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        covered = [False] * len(words)
        for i in range(len(words) - n + 1):
            if grams[tuple(words[i : i + n])] > 1:
                for j in range(i, i + n):
                    covered[j] = True
        out[f"dup{n}gram_char_frac"] = (
            sum(len(w) for w, cv in zip(words, covered) if cv) / total_chars
        )
    return out


_SCHEMA = ", ".join(f"{f} double" for f in _FIELDS)


def repetition_signals(text: Column) -> Column:
    """Struct column of all Gopher repetition fractions for ``text``
    (null text scores all-zero, like empty). The UDF is created lazily
    — schema parsing needs an active session (same pattern as
    ``functions/unicode.py``)."""

    @pandas_udf(_SCHEMA)
    def _signals_udf(texts: pd.Series) -> pd.DataFrame:
        rows = [
            repetition_signals_py(t if isinstance(t, str) else "")
            for t in texts
        ]
        return pd.DataFrame(rows, columns=_FIELDS)

    return _signals_udf(text)


def gopher_repetition_filter(
    df: DataFrame,
    text_col: str,
    thresholds: dict[str, float] | None = None,
    out_col: str = "repetition_ok",
) -> DataFrame:
    """Append the signals struct (``<out_col>_signals``) and a boolean
    ``out_col`` that is true iff EVERY fraction is at or below its
    threshold (the paper's rule: any one exceeded discards the
    document). Pass ``thresholds`` to override individual cuts; keys
    must be a subset of the signal names."""
    th = dict(GOPHER_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(GOPHER_THRESHOLDS)
        if unknown:
            raise ValueError(f"unknown threshold keys: {sorted(unknown)}")
        th.update(thresholds)
    sig = f"{out_col}_signals"
    out = df.withColumn(sig, repetition_signals(F.col(text_col)))
    ok = None
    for f, cut in th.items():
        cond = F.col(f"{sig}.{f}") <= F.lit(cut)
        ok = cond if ok is None else (ok & cond)
    return out.withColumn(out_col, ok)
