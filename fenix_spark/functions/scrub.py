"""PII scrubbing and repetition-quality rules — native expressions.

Two more training-corpus hygiene passes, both pure Catalyst scalar
expressions (whole-stage codegen, zero Python, one scan):

- ``redact_pii`` / ``pii_counts``: regex families for emails, phone
  numbers, IPv4s, SSN-shaped ids and card-shaped numbers, replaced by
  typed placeholders (the conventional pre-training scrub).
- Gopher-style repetition rules (Rae et al. 2021, Table A1): fraction
  of duplicate lines and the token share of the most frequent n-gram
  — the standard cut for boilerplate / degenerate pages.

At 100 TB both are scan-bound map work with no shuffle; thresholds
belong to the caller (compose with ``sampling``/``dedup`` passes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import tokens, word_shingles

# Deliberately conservative patterns: scrubbing favors precision
# (a false hit destroys training text; a miss is caught by the next
# pass). Case-insensitive flags inline where needed.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(?<![0-9])(?:\+?[0-9]{1,3}[-. ])?(?:\([0-9]{3}\)[-. ]?|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}(?![0-9])",
    "ipv4": r"(?<![0-9.])(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])(?![0-9.])",
    "ssn": r"(?<![0-9-])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9-])",
    "card": r"(?<![0-9-])(?:[0-9]{4}[- ]){3}[0-9]{4}(?![0-9-])",
}


def redact_pii(c: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> Column:
    """Replace each PII family with its ``[KIND]`` placeholder —
    chained regexp_replace, order = ``kinds`` (card before phone
    matters if you reorder: both match digit runs)."""
    out = c
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return out


def pii_counts(c: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> Column:
    """struct<kind: int, ...> of match counts per family (audit /
    threshold column; docs over a cut get dropped, not scrubbed)."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[k]), 0)).alias(k)
            for k in kinds
        ]
    )


def dup_line_frac(c: Column) -> Column:
    """Fraction of non-blank lines that are repeats of an earlier
    line: 1 − distinct/total (0.0 for ≤1 line)."""
    lines = F.filter(F.split(c, r"\n"), lambda x: F.trim(x) != F.lit(""))
    n = F.size(lines)
    return F.when(
        n > 1, (n - F.size(F.array_distinct(lines))) / n.cast("double")
    ).otherwise(F.lit(0.0))


def top_ngram_frac(c: Column, n: int = 2) -> Column:
    """Token share of the single most frequent word n-gram (Gopher's
    top-2-gram rule): count of the modal n-gram × n / token count.

    Modal count via SORT + LONGEST EQUAL RUN (one ``array_sort`` +
    one ``aggregate`` fold) — O(g log g) per row, scan-local. The
    naive distinct×filter form is O(g²), which turns a 100k-token
    page into 10^10 comparisons inside one task; sorting keeps the
    longest document a straggler-free scan cell."""
    toks = tokens(c)
    grams = F.array_sort(word_shingles(toks, n))
    run_state = F.aggregate(
        grams,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top = run_state["best"]
    n_tok = F.size(toks)
    return F.when(
        n_tok >= n, F.least(F.lit(1.0), top * n / n_tok.cast("double"))
    ).otherwise(F.lit(0.0))


def repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_top_ngram_frac: float = 0.20,
    ngram: int = 2,
) -> DataFrame:
    """Append the Gopher repetition metrics + a keep flag."""
    c = F.col(text_col)
    return (
        df.withColumn("dup_line_frac", F.round(dup_line_frac(c), 6))
        .withColumn("top_ngram_frac", F.round(top_ngram_frac(c, ngram), 6))
        .withColumn(
            "repetition_keep",
            (F.col("dup_line_frac") <= max_dup_line_frac)
            & (F.col("top_ngram_frac") <= max_top_ngram_frac),
        )
    )


def compression_ratios(
    df: "DataFrame", text_col: str, id_col: str, level: int = 6
) -> "DataFrame":
    """(id, raw_len, zlib_len, ratio) — DEFLATE compressibility as a
    repetitiveness signal (the Gopher-family quality rule the n-gram
    fractions approximate): boilerplate/template/spam text compresses
    far below prose (~0.3 ratio vs ~0.6+), and the signal is
    tokenizer-free.

    This is the text family's ONE non-native column op — Spark SQL
    has no DEFLATE expression — so it runs as an Arrow-batched pandas
    UDF (zlib is C-speed; the batch boundary, not the row, is the
    Python cost). Keep it out of hot scans; score once, persist."""
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("struct<raw_len: int, zlib_len: int, ratio: double>")
    def comp(texts):
        import zlib

        raw, comp_len, ratio = [], [], []
        for t in texts:
            b = (t or "").encode("utf-8")
            c = len(zlib.compress(b, level)) if b else 0
            raw.append(len(b))
            comp_len.append(c)
            ratio.append(round(c / len(b), 6) if b else None)
        return pd.DataFrame({"raw_len": raw, "zlib_len": comp_len, "ratio": ratio})

    from fenix_spark.operators.dedup import spread

    out = spread(df).select(
        F.col(id_col).alias("id"), comp(F.col(text_col)).alias("c")
    )
    return out.select("id", "c.raw_len", "c.zlib_len", "c.ratio")


def duckdb_repetition_sql(table: str = "documents", ngram: int = 2) -> str:
    """Full DuckDB mirror of ``repetition_flags``'s two metrics —
    built HERE so a future oracle-suite row and the corpus parity test
    (tests/test_scrub.py::test_repetition_metrics_duckdb_mirror) share
    ONE definition, the same discipline as readability's mirror.

    Re-expression notes: Spark's longest-equal-run fold over sorted
    shingles computes the MODAL shingle count — in SQL that is the
    plain relational form (unnest → count → max), identical by
    definition. Line split is on the literal newline both sides; the
    token law is ``texthash.duck_tokens`` (the shared mirror). Both
    metrics are single divisions of small integers, so the doubles are
    correctly-rounded identically on both engines and 6dp rounding
    agrees (Spark round = HALF_UP, DuckDB = half-away; they differ
    only at exact half-ulp boundaries no small-int ratio can hit)."""
    from fenix_spark.functions.texthash import duck_tokens

    t = duck_tokens("text")
    return f"""
WITH base AS (
    SELECT doc_id, {t} AS t,
           list_filter(string_split(text, chr(10)), x -> trim(x) != '') AS lines
    FROM {table}
), stats AS (
    SELECT doc_id, t, len(t) AS n_tok,
           CASE WHEN len(lines) > 1
                THEN (len(lines) - len(list_distinct(lines)))
                     / CAST(len(lines) AS DOUBLE)
                ELSE 0.0 END AS dlf
    FROM base
), grams AS (
    SELECT doc_id,
           unnest([{" || ' ' || ".join(f"t[i + {j}]" for j in range(ngram))}
                   for i in range(1, len(t) - {ngram - 2})]) AS g
    FROM stats WHERE n_tok >= {ngram}
), modal AS (
    SELECT doc_id, max(c) AS top
    FROM (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g)
    GROUP BY doc_id
)
SELECT s.doc_id,
       round(s.dlf, 6) + 0.0 AS dup_line_frac,
       round(CASE WHEN s.n_tok >= {ngram}
                  THEN least(1.0, m.top * {ngram} / CAST(s.n_tok AS DOUBLE))
                  ELSE 0.0 END, 6) + 0.0 AS top_ngram_frac
FROM stats s LEFT JOIN modal m USING (doc_id)
"""
