"""Contrastive training-pair mining — build (anchor, pair, label)
examples for embedding-model training from a raw corpus: positives
are near-duplicates, hard negatives are lexically-similar-but-
distinct documents (the pairs that actually teach a bi-encoder;
random negatives are trivially separable — Karpukhin et al. 2020's
hard-negative lesson, mined here lexically instead of with a model).

Reuses the dedup machinery with a DELIBERATELY LOOSE band geometry:
many narrow bands (default 8×2: selectivity knee ≈ (1/8)^(1/2) ≈
0.35) so mid-similarity pairs surface as candidates, then ONE exact
Jaccard verification buckets each candidate:

    jaccard ≥ pos_threshold          → positive
    neg_low ≤ jaccard < neg_high     → hard_negative
    otherwise                        → dropped (ambiguous band)

Scale shape is the minhash pipeline's: the band self-join is the only
growing shuffle; only 4-byte hash sets travel; the loose geometry
admits more candidates by design — bound it with ``max_pairs_per_doc``
(deterministic per-anchor top by jaccard, not a random prefix).

Easy negatives (optional): deterministic hash-derangement pairing —
each anchor is matched with the next anchor in hash order, a pure
row-function shift that never samples the same pair twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60
from fenix_spark.functions.texthash import minhash_signature_hashed
from fenix_spark.operators.dedup import (
    hashed_token_sets,
    jaccard,
    lsh_candidates,
)
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy


def mine_contrastive_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pos_threshold: float = 0.9,
    neg_low: float = 0.35,
    neg_high: float = 0.7,
    shingle: int = 1,
    num_components: int = 16,
    bands: int = 8,
    max_pairs_per_doc: int = 10,
) -> DataFrame:
    """(id_a, id_b, jaccard, label) — label ∈ {positive,
    hard_negative}; per-anchor output capped at ``max_pairs_per_doc``
    per label (highest-jaccard kept — for negatives, closest-but-
    distinct is hardest, which is the point)."""
    if num_components < bands or num_components % bands:
        raise ValueError(
            f"num_components={num_components} must be a positive multiple "
            f"of bands={bands}: rows_per_band = num_components // bands "
            "would be 0 and every row would share one empty band key — "
            "a silent all-pairs cross join"
        )
    if not (neg_low < neg_high <= pos_threshold):
        raise ValueError(
            f"thresholds must satisfy neg_low < neg_high <= pos_threshold "
            f"(got {neg_low}, {neg_high}, {pos_threshold})"
        )
    sets = hashed_token_sets(df, text_col, id_col, shingle)
    signed = sets.select(
        "id",
        "s",
        minhash_signature_hashed("s", num_components).alias("sig"),
    ).transform(_ckpt_lazy)
    cand = lsh_candidates(signed, bands, num_components // bands)
    l = signed.select(F.col("id").alias("id_l"), F.col("s").alias("s_a"))
    r = signed.select(F.col("id").alias("id_r"), F.col("s").alias("s_b"))
    verified = (
        cand.join(l, "id_l")
        .join(r, "id_r")
        .withColumn("jaccard", F.round(jaccard(F.col("s_a"), F.col("s_b")), 6))
        .select(
            F.col("id_l").alias("id_a"),
            F.col("id_r").alias("id_b"),
            "jaccard",
        )
    )
    labeled = verified.withColumn(
        "label",
        F.when(F.col("jaccard") >= pos_threshold, F.lit("positive")).when(
            (F.col("jaccard") >= neg_low) & (F.col("jaccard") < neg_high),
            F.lit("hard_negative"),
        ),
    ).where(F.col("label").isNotNull())
    w = Window.partitionBy("id_a", "label").orderBy(
        F.col("jaccard").desc(), F.col("id_b").asc()
    )
    return (
        labeled.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_pairs_per_doc)
        .drop("rn")
    )


def easy_negative_pairs(
    df: DataFrame, id_col: str, salt: str = "", buckets: int = 1024
) -> DataFrame:
    """(id_a, id_b, label='easy_negative') — each id paired with its
    successor in hash order WITHIN its hash bucket (per-bucket cyclic
    shift). Deterministic, and the window is PARTITIONED by bucket so
    the sort parallelizes across the cluster — a global-order window
    would funnel the whole corpus through one task, the exact
    anti-pattern this module's scale ledger forbids.

    Hash-bucketed pairing is statistically identical to a global
    shift for the 'easy negative' purpose (partners are hash-random
    either way). Ids in singleton buckets (only when corpus size ≲
    buckets) have no in-bucket partner and are dropped — shrink
    ``buckets`` for tiny corpora if full anchor coverage matters."""
    h = hash60(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    keyed = df.select(
        F.col(id_col).alias("id_a"),
        h.alias("__h"),
        (h % buckets).alias("__bucket"),
    )
    w = Window.partitionBy("__bucket").orderBy("__h", "id_a")
    w_full = (
        Window.partitionBy("__bucket")
        .orderBy("__h", "id_a")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    closed = keyed.select(
        "id_a",
        # successor in the bucket; the last row wraps to the bucket's first
        F.coalesce(
            F.lead("id_a", 1).over(w), F.first("id_a").over(w_full)
        ).alias("id_b"),
    )
    return closed.where(F.col("id_a") != F.col("id_b")).withColumn(
        "label", F.lit("easy_negative")
    )
