"""Trained language identification — Cavnar & Trenkle's char-n-gram
rank profiles ("N-Gram-Based Text Categorization", SDAIR'94; the
method behind textcat/libtextcat), rebuilt relationally.

The heuristic ``textstats.lang_id`` keys on a fixed marker-word list —
zero training, scan-local, great for coarse routing. This module is
the TRAINED path: fit per-language profiles from labeled text, then
classify by out-of-place distance. Both halves are plain DataFrame
programs:

- **fit** (`char_ngram_profiles`): explode char 1..n grams (word-
  padded with '_', per the paper), one partial-agg count per
  (label, gram), one per-label window to keep the top-``profile_size``
  by frequency → ``(label, gram, rank)``. The profile table is
  |labels| × profile_size rows — trivially broadcastable however big
  the training corpus was.
- **classify** (`classify_lang`): build each document's OWN rank
  profile the same way (per-doc window over its distinct grams —
  bounded by the doc), broadcast-join the language profiles on the
  gram, and score each (doc, label) by the out-of-place distance
  Σ |rank_doc − rank_label|, with a gram missing from a language's
  profile costing the paper's maximum penalty (``profile_size``).
  Winner per doc via one ``min_by`` aggregate — no sort.

Scale shape: the only data-sized shuffles are the gram count (8-byte-
gram rows, map-side combined) at fit time and the per-doc profile
window at classify time (rows ≤ docs × profile_size after the per-doc
rank cut); language profiles ride a broadcast. Distances are exact —
no sampling, no hashing collisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["char_ngram_profiles", "classify_lang"]


def _char_grams(text: Column, n_max: int) -> Column:
    """All char 1..n_max grams of the word-padded, lowercased text:
    words become ``_word_`` (the paper's padding, so grams anchor to
    word boundaries) and every sliding window of each length is
    emitted. Pure native expressions — flatten over a sequence of
    window starts per n."""
    padded = F.concat(
        F.lit("_"),
        F.regexp_replace(F.lower(text), r"[\s\p{Punct}]+", "_"),
        F.lit("_"),
    )
    def window_of(n: int):
        # NB: a 2-arg lambda would make F.transform pass the ARRAY
        # INDEX as the second argument, silently overriding a bound
        # default — close over n via this factory instead
        return lambda i: F.substring(padded, i, F.lit(n))

    return F.flatten(
        F.array(
            *[
                F.transform(
                    # lower clamp 1: sequence(1, 0) would DESCEND and
                    # emit a position-0 junk gram for texts shorter
                    # than n; clamped, a short text yields one
                    # whole-text gram (substring self-clamps)
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.length(padded) - n + 1, F.lit(1)),
                    ),
                    window_of(n),
                )
                for n in range(1, n_max + 1)
            ]
        )
    )


def char_ngram_profiles(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n_max: int = 3,
    profile_size: int = 300,
) -> DataFrame:
    """(label, gram, rank) — each language's ``profile_size`` most
    frequent char 1..``n_max`` grams, rank 1 = most frequent (ties
    broken bytewise on the gram so the profile is deterministic)."""
    counts = (
        df.select(
            F.col(label_col).alias("label"),
            F.explode(_char_grams(F.col(text_col), n_max)).alias("gram"),
        )
        .where(F.col("gram") != "")
        .groupBy("label", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("label").orderBy(F.col("c").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= profile_size)
        .select("label", "gram", "rank")
    )


def classify_lang(
    df: DataFrame,
    text_col: str,
    id_col: str,
    profiles: DataFrame,
    n_max: int = 3,
    profile_size: int = 300,
) -> DataFrame:
    """(id, lang, distance) — the out-of-place winner per document.

    Distance to a language = Σ over the document's top grams of
    |doc_rank − language_rank|, a missing gram costing
    ``profile_size`` (the paper's maximum). Deterministic tiebreak:
    equal distances resolve to the alphabetically first label. Use the
    SAME ``n_max``/``profile_size`` the profiles were fit with.
    Documents whose text yields no grams come back with null lang."""
    doc_counts = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(_char_grams(F.col(text_col), n_max)).alias("gram"),
        )
        .where(F.col("gram") != "")
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wd = Window.partitionBy("id").orderBy(F.col("c").desc(), F.col("gram").asc())
    doc_prof = (
        doc_counts.withColumn("doc_rank", F.row_number().over(wd))
        .where(F.col("doc_rank") <= profile_size)
        .select("id", "gram", "doc_rank")
    )
    labels = profiles.select("label").distinct()
    # every (doc gram, label) pair scores: matched grams via the
    # broadcast profile join, unmatched at the max penalty — the
    # label cross is |labels|-wide, never data-wide
    scored = (
        doc_prof.crossJoin(F.broadcast(labels))
        .join(
            F.broadcast(profiles.withColumnRenamed("rank", "lang_rank")),
            ["label", "gram"],
            "left",
        )
        .withColumn(
            "oop",
            F.when(
                F.col("lang_rank").isNotNull(),
                F.abs(F.col("doc_rank") - F.col("lang_rank")),
            ).otherwise(F.lit(profile_size)),
        )
    )
    dist = scored.groupBy("id", "label").agg(F.sum("oop").alias("distance"))
    return dist.groupBy("id").agg(
        F.min_by(
            F.struct(F.col("label").alias("lang"), "distance"),
            F.struct("distance", "label"),
        ).alias("__w")
    ).select("id", "__w.lang", "__w.distance")
