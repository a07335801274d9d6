"""Unicode hygiene for text curation — normalization, invisible-
character stripping, and mojibake repair (the ftfy-class fixes every
crawl corpus needs before hashing, deduping, or tokenizing).

Why this matters BEFORE dedup/tokenization: "café" composed (U+00E9)
and decomposed (e + U+0301) hash differently, a zero-width space
splits a token invisibly, and windows-1252 mojibake ("cafÃ©",
"â€™") inflates vocabulary and hides duplicates. Normalize first and
all of those collapse.

The split between native and Python is deliberate:

- ``strip_invisible`` and ``unicode_stats`` are NATIVE expressions
  (regexp over explicit codepoint classes) — scan-local, zero-cost in
  the hot path.
- ``normalize_text`` (NFC/NFKC) and ``fix_mojibake`` need the Unicode
  character database and byte-level re-decoding — no JVM-side Spark
  builtin exposes them, so they are Arrow-batched pandas UDFs and
  belong where the semantics demand them, not on every scan.

``fix_mojibake`` is CONSERVATIVE by construction: a repair is applied
only when the whole text transcodes back to cp1252 bytes losslessly
(WHATWG C1 fallback included), those bytes are strictly valid UTF-8,
and the repair shrinks the text — legitimate accented text fails the
valid-UTF-8 condition ("déjà" as cp1252 bytes is not UTF-8), so it is
never touched. One-sided: it can miss exotic mojibake (truncated
sequences stay as-is), it does not corrupt clean text (hypothesis-
fuzzed both directions).
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "strip_invisible",
    "unicode_stats",
    "normalize_text",
    "fix_mojibake",
    "fix_mojibake_py",
    "script_counts",
    "dominant_script",
    "mixed_script_ratio",
    "SCRIPT_RANGES",
]

# Invisible / formatting codepoints that carry no text content but
# break tokenizers and hashes: zero-width space/joiner/non-joiner,
# word joiner, BOM-as-ZWNBSP, soft hyphen, bidi embedding controls,
# and the C0/C1 controls other than \t \n \r.
_INVISIBLE_CLASS = (
    "[\\u200b-\\u200f\\u2060\\ufeff\\u00ad\\u202a-\\u202e\\u2066-\\u2069"
    "\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\u0080-\\u009f]"
)


def strip_invisible(c: Column) -> Column:
    """Remove zero-width/bidi/control codepoints — NATIVE (one
    regexp_replace over an explicit class; \\t \\n \\r survive)."""
    return F.regexp_replace(c, _INVISIBLE_CLASS, "")


def unicode_stats(c: Column) -> Column:
    """struct(n_invisible, n_replacement, n_mojibake_markers,
    n_chars) — scan-local hygiene signals for quality gates: counts
    of invisible codepoints, U+FFFD replacement chars (upstream
    decode damage), and classic windows-1252 mojibake marker
    sequences (Ã/Â/â followed by a cp1252 trailer, the signature of
    UTF-8 bytes decoded as cp1252)."""
    n = F.length(c)
    stripped = F.length(F.regexp_replace(c, _INVISIBLE_CLASS, ""))
    repl = n - F.length(F.regexp_replace(c, "\\ufffd", ""))
    # a marker is Ã/Â/â/€/‚/„/… adjacency typical of double-decoding;
    # count the two-char leads (Ã. / Â. / â..) — cheap and specific
    moji = F.size(
        F.regexp_extract_all(
            c, F.lit("[\\u00c2\\u00c3][\\u0080-\\u00bf\\u20ac\\u2018-\\u201e]"), F.lit(0)
        )
    ) + F.size(
        F.regexp_extract_all(
            c, F.lit("\\u00e2[\\u20ac\\u0080-\\u00bf]."), F.lit(0)
        )
    )
    return F.struct(
        (n - stripped).alias("n_invisible"),
        repl.alias("n_replacement"),
        moji.alias("n_mojibake_markers"),
        n.alias("n_chars"),
    )


def normalize_text(c: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (NFC for canonical identity
    — composed "é" == decomposed "é"; NFKC additionally folds
    compatibility forms — ligatures, fullwidth ASCII, superscripts).
    Arrow-batched pandas UDF (the UCD is not reachable from JVM
    expressions); idempotent, null-preserving."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unsupported normalization form {form!r}")

    @pandas_udf("string")
    def norm(s):
        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return norm(c)


# the classic double-decoding legend: UTF-8 bytes read as cp1252 (or
# latin-1, a strict subset of the same repair). There is no safe
# MARKER list — every cp1252 face of a UTF-8 lead byte (Ã Â â … æ é)
# is also a legitimate letter somewhere — so the gate is structural:
# the text (non-ASCII somewhere) must transcode back to bytes
# losslessly AND those bytes must be valid UTF-8 AND the repair must
# strictly SHRINK the text (a real multi-byte sequence always
# collapses). Legitimate text fails the middle condition: "déjà" as
# cp1252 bytes is not valid UTF-8. This is the same identification
# ftfy's utf-8/cp1252 fixer rests on.


def _encode_cp1252_total(text: str) -> bytes | None:
    """The exact inverse of charset.py's WHATWG-total cp1252 decoder:
    strict cp1252, with the 5 undefined bytes (81 8D 8F 90 9D)
    reachable from their C1 control codepoints — mojibake that came
    through ANY WHATWG-conformant decoder (browsers, our own charset
    fallback) contains those C1 controls where e.g. the third byte of
    a right-double-quote (E2 80 9D) sat. None when any char has no
    byte (the text never was cp1252-decoded bytes)."""
    out = bytearray()
    for ch in text:
        cp = ord(ch)
        if 0x80 <= cp <= 0x9F:
            out.append(cp)  # C1 control ↔ raw byte (WHATWG fallback)
            continue
        try:
            out += ch.encode("cp1252", errors="strict")
        except UnicodeEncodeError:
            return None
    return bytes(out)


def fix_mojibake_py(text: str | None) -> str | None:
    """Repair UTF-8-decoded-as-cp1252 mojibake (one round, the
    overwhelmingly common case; a doubly-mangled string repairs one
    layer per call). Conservative: returns the input unchanged unless
    (a) the text has a non-ASCII char, (b) it re-encodes to cp1252
    (with the WHATWG C1 fallback) losslessly, (c) those bytes decode
    as strictly valid UTF-8, and (d) the repair SHRINKS the text (a
    real multi-byte sequence always collapses). Legitimate accented
    text fails (c). Python twin of ``fix_mojibake`` (parity pinned)."""
    if text is None or not any(ord(ch) > 0x7F for ch in text):
        return text
    raw = _encode_cp1252_total(text)
    if raw is None:
        return text
    try:
        fixed = raw.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return text
    if len(fixed) < len(text):
        return fixed
    return text


def fix_mojibake(c: Column) -> Column:
    """``fix_mojibake_py`` as an Arrow-batched column expression."""

    @pandas_udf("string")
    def fix(s):
        return s.map(fix_mojibake_py)

    return fix(c)


# ------------------------------------------------- script profiling

# Major Unicode script ranges (Unicode 15 block assignments — public
# spec), deliberately coarse: curation wants "which writing system",
# not full property lookups. Order is the tie-break order.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-z\\u00C0-\\u024F\\u1E00-\\u1EFF",
    "cyrillic": "\\u0400-\\u04FF\\u0500-\\u052F",
    "greek": "\\u0370-\\u03FF\\u1F00-\\u1FFF",
    "arabic": "\\u0600-\\u06FF\\u0750-\\u077F\\u08A0-\\u08FF",
    "hebrew": "\\u0590-\\u05FF",
    "devanagari": "\\u0900-\\u097F",
    "cjk": "\\u4E00-\\u9FFF\\u3400-\\u4DBF\\uF900-\\uFAFF",
    "kana": "\\u3040-\\u309F\\u30A0-\\u30FF\\u31F0-\\u31FF",
    "hangul": "\\uAC00-\\uD7AF\\u1100-\\u11FF\\u3130-\\u318F",
    "thai": "\\u0E00-\\u0E7F",
    "digit": "0-9",
}


def script_counts(c: Column) -> Column:
    """struct of per-script character counts — scan-local
    ``regexp_count`` per range, whole-stage codegen, no Python."""
    return F.struct(
        *[
            F.regexp_count(c, F.lit(f"[{rng}]")).alias(name)
            for name, rng in SCRIPT_RANGES.items()
        ]
    )


def dominant_script(c: Column) -> Column:
    """The script with the most characters ('none' when no script
    character occurs). Ties break by SCRIPT_RANGES order (earlier
    wins) — deterministic, pinned in tests."""
    counts = script_counts(c)
    ranked = F.sort_array(
        F.array(
            *[
                F.struct(
                    counts[name].alias("n"),
                    F.lit(len(SCRIPT_RANGES) - i).alias("prio"),
                    F.lit(name).alias("script"),
                )
                for i, name in enumerate(SCRIPT_RANGES)
            ]
        ),
        asc=False,
    )
    top = ranked[0]
    return F.when(top["n"] > 0, top["script"]).otherwise(F.lit("none"))


def mixed_script_ratio(c: Column) -> Column:
    """Fraction of script characters NOT in the dominant script
    (digits excluded from both sides — numbers are script-neutral).
    High values flag homoglyph spoofing ('pаypаl' with Cyrillic а)
    and boilerplate-injected spam; clean monolingual text scores ~0."""
    counts = script_counts(c)
    letters = [n for n in SCRIPT_RANGES if n != "digit"]
    total = sum((counts[n] for n in letters[1:]), counts[letters[0]])
    top = F.greatest(*[counts[n] for n in letters])
    return F.when(total > 0, (total - top) / total).otherwise(F.lit(0.0))
