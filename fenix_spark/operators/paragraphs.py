"""Paragraph-level deduplication (CCNet-style, Wenzek et al. 2020) —
the unit of crawl duplication is usually the PARAGRAPH (boilerplate
headers, navigation, syndicated passages), which whole-document
near-dup misses: two documents sharing 40% of their paragraphs are
different documents with duplicated content.

Three operators over the same exploded-paragraph stream:

- ``paragraph_hashes``: (id, pos, phash, n_chars) — paragraphs split
  on blank lines, hashed after the same normalization exact dedup
  uses. Scan-local; only 16-byte (id, hash) pairs shuffle downstream.
- ``dedup_paragraphs``: remove every repeated paragraph occurrence
  except the canonical first (global min (id, pos) per hash — the
  deterministic analog of CCNet's 'keep one copy per shard') and
  rebuild document text. Documents reduced to nothing survive with
  empty text plus a ``kept_paragraphs = 0`` marker so callers can
  drop or audit them.
- ``doc_overlap_pairs``: document pairs sharing ≥ ``min_shared``
  paragraph hashes — partial-overlap detection. Pair expansion is
  quadratic per hash group, so groups larger than ``max_group`` are
  EXCLUDED as boilerplate (a paragraph shared by 10k docs is
  navigation chrome, not plagiarism — counting it as overlap evidence
  would n² the join AND poison the signal; the cap is the standard
  production move and is reported via its own column, not silent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60
from fenix_spark.operators.dedup import normalized_text


def paragraph_hashes(
    df: DataFrame, text_col: str, id_col: str, min_chars: int = 20
) -> DataFrame:
    """(id, pos, phash, n_chars) — one row per paragraph of at least
    ``min_chars`` normalized characters (shorter fragments are noise:
    headings, list bullets — hashing them glues unrelated docs)."""
    from fenix_spark.operators.dedup import spread

    paras = spread(df).select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"(?:\r?\n){2,}")).alias("pos", "para"),
    )
    normed = paras.select(
        "id", "pos", "para", normalized_text(F.col("para")).alias("norm")
    )
    return normed.where(F.length("norm") >= min_chars).select(
        "id",
        "pos",
        hash60(F.col("norm")).alias("phash"),
        F.length("norm").alias("n_chars"),
        "para",
    )


def dedup_paragraphs(
    df: DataFrame, text_col: str, id_col: str, min_chars: int = 20
) -> DataFrame:
    """(id, text, kept_paragraphs, dropped_paragraphs) with repeated
    paragraphs removed globally (first occurrence by (id, pos) wins).

    Sub-``min_chars`` paragraphs are NOT dedup targets (hashing
    headings/bullets glues unrelated docs) and are always kept in the
    reconstruction — dedup must not silently rewrite text it never
    considered duplicated.

    Shuffle ledger: the canonical-owner aggregation moves (phash,
    id, pos) triples; the decision join is on phash. Paragraph TEXT
    travels only inside its own document's rows (posexplode +
    re-concat are partitioned by id) — never across documents."""
    from fenix_spark.operators.dedup import spread

    all_paras = spread(df).select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"(?:\r?\n){2,}")).alias("pos", "para"),
    )
    all_paras = all_paras.select(
        "id",
        "pos",
        "para",
        (F.length(normalized_text(F.col("para"))) >= min_chars).alias("informative"),
        hash60(normalized_text(F.col("para"))).alias("phash"),
    )
    canon = (
        all_paras.where("informative")
        .groupBy("phash")
        .agg(F.min(F.struct("id", "pos")).alias("owner"))
    )
    kept = (
        all_paras.join(canon, "phash", "left")
        .where(
            (~F.col("informative"))
            | ((F.col("id") == F.col("owner.id")) & (F.col("pos") == F.col("owner.pos")))
        )
        .select("id", "pos", "para", "informative")
    )
    rebuilt = (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                "\n\n",
            ).alias("text"),
            # kept/dropped count INFORMATIVE paragraphs only — the
            # ones dedup actually adjudicated
            F.sum(F.col("informative").cast("int")).alias("kept_paragraphs"),
        )
    )
    totals = (
        all_paras.where("informative")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("total_paragraphs"))
    )
    ids = df.select(F.col(id_col).alias("id"))
    return (
        ids.join(rebuilt, "id", "left")
        .join(totals, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.coalesce(F.col("kept_paragraphs"), F.lit(0)).alias("kept_paragraphs"),
            (
                F.coalesce(F.col("total_paragraphs"), F.lit(0))
                - F.coalesce(F.col("kept_paragraphs"), F.lit(0))
            ).alias("dropped_paragraphs"),
        )
    )


def doc_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_shared: int = 2,
    min_chars: int = 20,
    max_group: int = 100,
) -> DataFrame:
    """(id_a, id_b, shared_paragraphs) for pairs sharing ≥
    ``min_shared`` paragraph hashes, excluding hashes shared by more
    than ``max_group`` documents (boilerplate — see module note)."""
    paras = paragraph_hashes(df, text_col, id_col, min_chars).select(
        "id", "phash"
    ).distinct()
    sizes = paras.groupBy("phash").agg(F.count(F.lit(1)).alias("n_docs"))
    informative = sizes.where(
        (F.col("n_docs") >= 2) & (F.col("n_docs") <= max_group)
    ).select("phash")
    scoped = paras.join(informative, "phash")
    a = scoped.select(F.col("phash"), F.col("id").alias("id_a"))
    b = scoped.select(F.col("phash"), F.col("id").alias("id_b"))
    return (
        a.join(b, "phash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_paragraphs"))
        .where(F.col("shared_paragraphs") >= min_shared)
    )
