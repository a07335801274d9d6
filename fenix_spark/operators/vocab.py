"""Vocabulary-coverage audits — before training or indexing with a
fixed vocabulary, measure what a corpus does to it: per-document
out-of-vocabulary rates (which documents the tokenizer will shred) and
the highest-impact missing terms (what to add to the vocab next).
Word-level and fully native: one explode, one broadcast join against
the vocab, one aggregation — text never shuffles, and the vocab ships
once as a broadcast frame (never a literal IN-list, which would blow
the plan size at real vocab sizes).

Tokenization matches the repo convention (``texthash.tokens``:
lowercased alphanumeric runs), so coverage numbers line up with the
BM25/TF-IDF/minhash token space.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import tokens

__all__ = ["oov_report", "oov_top_missing"]


def _vocab_frame(df: DataFrame, vocab: Sequence[str] | DataFrame) -> DataFrame:
    if isinstance(vocab, DataFrame):
        [c] = vocab.columns
        out = vocab.select(F.col(c).alias("__v")).distinct()
    else:
        if not vocab:
            raise ValueError("vocab must be non-empty")
        out = df.sparkSession.createDataFrame(
            [(v,) for v in set(vocab)], "__v string"
        )
    return out.withColumn("__known", F.lit(True))


def _term_rows(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    return df.select(
        *keep, F.explode(tokens(F.col(text_col))).alias("__t")
    )


def oov_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: Sequence[str] | DataFrame,
) -> DataFrame:
    """(doc_id, n_tokens, n_oov, oov_rate) per document — token
    occurrences (not types) outside the vocabulary. Documents with no
    tokens report (0, 0, 0.0): an empty document has nothing the
    vocab fails to cover."""
    terms = _term_rows(df, text_col, [id_col]).join(
        F.broadcast(_vocab_frame(df, vocab)),
        F.col("__t") == F.col("__v"),
        "left",
    )
    per_doc = terms.groupBy(F.col(id_col).alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__known").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    all_docs = df.select(F.col(id_col).alias("doc_id")).distinct()
    return (
        all_docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.coalesce("n_oov", F.lit(0))
                / F.coalesce("n_tokens", F.lit(0)).cast("double"),
            )
            .otherwise(0.0)
            .alias("oov_rate"),
        )
    )


def oov_top_missing(
    df: DataFrame,
    text_col: str,
    vocab: Sequence[str] | DataFrame,
    k: int = 50,
) -> DataFrame:
    """(term, n, n_docs) — the ``k`` out-of-vocabulary terms with the
    largest occurrence counts (doc frequency alongside, since a term
    concentrated in one document is less vocab-worthy than one spread
    across many). Deterministic: ties break on the term. This is the
    "what to add next" list — adding the top rows back to the vocab
    provably removes their `n` from every coverage number."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1 (got {k})")
    # doc identity for doc-frequency: a stable per-row id is enough
    # (the caller's id column may not exist or be unique here)
    terms = (
        df.select(F.monotonically_increasing_id().alias("__doc"), F.col(text_col))
        .select("__doc", F.explode(tokens(F.col(text_col))).alias("__t"))
        .join(
            F.broadcast(_vocab_frame(df, vocab)),
            F.col("__t") == F.col("__v"),
            "left_anti",
        )
    )
    return (
        terms.groupBy(F.col("__t").alias("term"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("__doc").alias("n_docs"),
        )
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
    )
