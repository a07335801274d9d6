"""Trigram index for substring search — the pg_trgm pattern: accelerate
``text LIKE '%needle%'`` from a full corpus scan to a postings lookup.

Index: distinct character 3-grams of the lowercased text, one
(doc_id, gram) row each — built once (explode + distinct, the only
corpus-sized shuffle), written through the catalog like any table.

Query: a doc can contain ``needle`` only if it contains EVERY trigram
of ``needle`` — filter the postings to the needle's grams (broadcast,
|needle| rows), count matches per doc, keep docs matching all grams,
then VERIFY with a real ``contains`` against the candidate docs only
(case-insensitive, same normalization as the index). False positives
are eliminated by the verify; false negatives are impossible
(containment of the string implies containment of its trigrams).

Per-query cost is |postings of the needle's grams| + |candidates|
verify reads — independent of corpus width. Needles shorter than 3
characters have no trigram to prune with: that is a full-scan query
by nature, and this module REFUSES it (loud contract) instead of
silently degrading.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_trigrams(c: Column) -> Column:
    """Distinct character 3-grams of ``lower(c)`` (no padding; only
    interior grams — mirrors the query-side extraction exactly)."""
    lowered = F.lower(c)
    n = F.length(lowered)
    idx = F.when(n >= 3, F.sequence(F.lit(1), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.substring(lowered, i.cast("int"), 3))
    )


def build_trigram_index(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, gram) postings — one corpus-sized explode+distinct."""
    from fenix_spark.operators.dedup import spread

    return spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(char_trigrams(F.col(text_col))).alias("gram"),
    )


def substring_search(
    docs: DataFrame,
    index: DataFrame,
    needle: str,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Rows of ``docs`` whose ``text_col`` contains ``needle``
    (case-insensitive), via the trigram index + exact verify."""
    grams = sorted({needle.lower()[i : i + 3] for i in range(len(needle) - 2)})
    if not grams:
        raise ValueError(
            "substring_search needs a needle of >= 3 characters — shorter "
            "needles cannot be trigram-pruned; run a plain "
            f"contains() scan for {needle!r} explicitly if you mean it"
        )
    spark = docs.sparkSession
    gram_df = F.broadcast(spark.createDataFrame([(g,) for g in grams], "gram string"))
    candidates = (
        index.join(gram_df, "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n"))
        .where(F.col("n") == len(grams))
        .select("doc_id")
    )
    return docs.join(
        candidates.withColumnRenamed("doc_id", "__cand_id"),
        docs[id_col] == F.col("__cand_id"),
        "left_semi",
    ).where(F.contains(F.lower(F.col(text_col)), F.lit(needle.lower())))
