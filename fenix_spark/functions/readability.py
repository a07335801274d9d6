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
    ari, cli).

    The counting expressions (word split + filter, the guarded
    sentence regex, the syllable fold) are each evaluated ONCE per row
    in a first projection; the four formulas then read the count
    columns. Higher-order functions are CodegenFallback (no
    whole-stage subexpression elimination), so inlining the counts
    into every score — the naive one-projection form — re-runs the
    sentence regex ~15× and the token split ~15× per row (measured
    4.4 s → 1.1 s at sf0.1 for the suite row). The score arithmetic
    below applies the SAME IEEE operations in the SAME order as the
    standalone ``flesch_*``/``ari``/``cli`` builders, so results are
    bit-identical — only the count subtrees are shared."""
    t = F.col(text_col)
    counts = df.withColumns(
        {
            "n_words": word_count(t),
            "n_sentences": sentence_count(t),
            "n_syllables": syllable_estimate(t),
            "__chars": F.regexp_count(t, F.lit("\\S")).cast("double"),
            "__letters": F.regexp_count(F.lower(t), F.lit("[a-z]")).cast("double"),
        }
    )
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    syl = F.col("n_syllables").cast("double")
    valid = (w > 0) & (s > 0)
    wps = F.when(valid, w / s)
    spw = syl / w
    ell = F.col("__letters") / w * 100.0
    ess = s / w * 100.0
    return counts.withColumns(
        {
            "fre": F.round(F.when(valid, 206.835 - 1.015 * wps - 84.6 * spw), 3),
            "fk_grade": F.round(F.when(valid, 0.39 * wps + 11.8 * spw - 15.59), 3),
            "ari": F.round(
                F.when(valid, 4.71 * (F.col("__chars") / w) + 0.5 * wps - 21.43), 3
            ),
            "cli": F.round(F.when(valid, 0.0588 * ell - 0.296 * ess - 15.8), 3),
        }
    ).drop("__chars", "__letters")


def duckdb_oracle_sql(table: str = "documents") -> str:
    """Full DuckDB mirror of ``readability_stats`` — the oracle for the
    ``readability_scores`` suite row (and tests/test_readability.py's
    row-by-row corpus check; ONE definition so suite and test cannot
    drift). RE2 has no lookbehind, so the sentence rule is re-expressed
    in two lookaround-free passes: (1) NEUTRALIZE guarded terminals —
    an abbreviation-dot or single-initial-dot immediately before
    whitespace becomes '#' (exactly the positions where the Spark
    regex's bounded lookbehinds suppress the split; neutralizing
    without consuming the following word keeps ADJACENT guards
    countable — 'J. R. Hartley' needs both); then (2) count candidate
    boundaries (terminal [+closers] + space + opener) on the cleaned
    text. Closers between dot and space disable the guard in both
    formulations. Score arithmetic renders the SAME literal doubles in
    the SAME order as the Spark expressions, so the 3dp rounding sees
    bit-identical IEEE inputs on both engines."""
    from fenix_spark.functions.sentences import _ABBREV

    closers = "[\"'”’)\\]]{0,2}"
    opener = "[\"'“‘(\\[]*[A-Z0-9À-Þ]"
    abbrevs = "|".join(a.replace(".", "\\.") for a in _ABBREV)

    def q(pat: str) -> str:  # SQL string literal: '' escapes '
        return pat.replace("'", "''")

    candidate = q(f"[.!?…]{closers}\\s+(?:{opener})")
    abbrev_neut = q(f"\\b({abbrevs})\\.(\\s)")
    initial_neut = q("\\b([A-Z])\\.(\\s)")
    cleaned = (
        "regexp_replace(regexp_replace(text, "
        f"'{abbrev_neut}', '\\1#\\2', 'g'), "
        f"'{initial_neut}', '\\1#\\2', 'g')"
    )
    wordpred = "[\\p{L}\\p{N}]"
    syl = (
        "list_sum(list_transform("
        "  list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
        f"              t -> regexp_matches(t, '{wordpred}')),"
        "  t -> greatest(1, len(regexp_extract_all(t, '[aeiouy]+'))"
        "                 - len(regexp_extract_all(t, '[b-df-hj-np-tv-z]e\\b')))"
        "))"
    )
    return f"""
    WITH counts AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> regexp_matches(t, '{wordpred}'))) AS w,
               1 + len(regexp_extract_all({cleaned}, '{candidate}')) AS s,
               CAST(coalesce({syl}, 0) AS BIGINT) AS syl,  -- list_sum yields HUGEINT
               len(regexp_extract_all(text, '\\S')) AS chars,
               len(regexp_extract_all(lower(text), '[a-z]')) AS letters
        FROM {table}
    )
    SELECT doc_id, w AS n_words, s AS n_sentences, syl AS n_syllables,
           round(206.835 - 1.015 * (w / CAST(s AS DOUBLE))
                         - 84.6 * (syl / CAST(w AS DOUBLE)), 3) AS fre,
           round(0.39 * (w / CAST(s AS DOUBLE))
                 + 11.8 * (syl / CAST(w AS DOUBLE)) - 15.59, 3) AS fk_grade,
           round(4.71 * (chars / CAST(w AS DOUBLE))
                 + 0.5 * (w / CAST(s AS DOUBLE)) - 21.43, 3) AS ari,
           round(0.0588 * (letters / CAST(w AS DOUBLE) * 100)
                 - 0.296 * (s / CAST(w AS DOUBLE) * 100) - 15.8, 3) AS cli
    FROM counts WHERE w > 0 AND s > 0
    ORDER BY doc_id
    """
