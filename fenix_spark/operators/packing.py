"""Sequence packing: assemble documents into fixed-token-budget
training examples.

LLM pretraining consumes fixed-length sequences; feeding one short
document per sequence wastes the budget on padding. Packing solves a
bin-packing problem: group docs so each bin's token total stays within
the budget while bins stay as full as possible. Exact bin packing is
NP-hard and inherently sequential — the scalable form is PARTITIONED
best-fit-decreasing (BFD): hash-bucket the corpus, run BFD inside
each bucket (bisected sorted bin list, O(n log n)), make bin ids
globally unique by bucket offset.

Scale design (100 TB corpus):

- The only shuffle moves (id, token_count) pairs — ~16 bytes/row —
  into `num_buckets` hash buckets; document text never moves. The
  output is a (doc → pack) ASSIGNMENT table to be joined back or fed
  to `sampling.write_shards`; materializing packed text is the
  caller's one sanctioned full-data shuffle.
- Each bucket packs independently in one Arrow batch
  (`applyInPandas`); buckets are sized by count, so executor memory
  holds ~|corpus|/num_buckets longs — pick num_buckets ≈ rows/5M.
- BFD degrades gracefully: per-bucket efficiency keeps the
  11/9·OPT+1 decreasing-fit bound; bucketing costs at most one underfull bin per
  bucket, negligible when buckets hold ≫ budget/mean_len docs.
- Deterministic end-to-end: hash bucketing + stable sort
  (len desc, id asc) + sequential BFD — same corpus, same packs, on
  any cluster shape. No RNG, no partition-order dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET_SHIFT = 40  # pack_id = bucket << 40 | local id; 2^40 packs/bucket


def pack_sequences(
    df: DataFrame,
    len_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    num_buckets: int = 64,
    oversize: str = "own_pack",
) -> DataFrame:
    """Assign every document to a pack of total ``len_col`` ≤ budget.

    Output: (id, length, pack_id, pack_len, pack_docs) — pack_len /
    pack_docs are the pack's totals, denormalized for shard writers.

    ``oversize``: docs longer than the budget either become their own
    over-budget pack (``"own_pack"``, flagged by pack_len > budget —
    the trainer's chunker splits them downstream) or raise
    (``"error"``).
    """
    if oversize not in ("own_pack", "error"):
        raise ValueError("oversize must be 'own_pack' or 'error'")
    if budget <= 0:
        raise ValueError("budget must be positive")

    import pandas as pd

    def pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["length", "id"], ascending=[False, True])
        bucket = int(pdf["bucket"].iloc[0])
        if oversize == "error":
            bad = pdf[pdf["length"] > budget]
            if len(bad):
                raise ValueError(
                    f"doc {bad['id'].iloc[0]!r} has {int(bad['length'].iloc[0])} "
                    f"tokens > budget {budget}"
                )
        # Best-fit-decreasing via a bisected sorted list of
        # (remaining_space, bin_id): O(n log n) per bucket — a naive
        # first-fit scan is O(n·bins) and degrades quadratically on
        # buckets where most docs open their own bin. Same 11/9·OPT+1
        # guarantee class as FFD; ties go to the lowest bin id, so
        # assignment stays deterministic.
        import bisect

        open_bins: list[tuple[int, int]] = []  # (space, bin_id) ascending
        n_bins = 0
        bin_of: list[int] = []
        for ln in pdf["length"].astype(int):
            ln = min(ln, budget) if oversize == "own_pack" else ln
            i = bisect.bisect_left(open_bins, (ln, -1))
            if i == len(open_bins):
                placed, space = n_bins, budget
                n_bins += 1
            else:
                space, placed = open_bins.pop(i)
            space -= ln
            bisect.insort(open_bins, (space, placed))
            bin_of.append(placed)
        out = pdf[["id", "length"]].copy()
        out["pack_id"] = [(bucket << _BUCKET_SHIFT) | b for b in bin_of]
        totals = out.groupby("pack_id")["length"].agg(["sum", "count"]).reset_index()
        totals.columns = ["pack_id", "pack_len", "pack_docs"]
        return out.merge(totals, on="pack_id")

    src = df.select(
        F.col(id_col).alias("id"),
        F.col(len_col).cast("long").alias("length"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).alias("bucket"),
    )
    # id keeps the caller's type — string/UUID/composite ids are as
    # common as integers in document corpora (sorted tie-break and
    # xxhash64 bucketing are type-agnostic)
    id_type = df.schema[id_col].dataType.simpleString()
    return (
        src.groupBy("bucket")
        .applyInPandas(
            pack_bucket,
            f"id {id_type}, length bigint, pack_id bigint, "
            "pack_len bigint, pack_docs bigint",
        )
        .withColumnRenamed("id", id_col)
    )


def packing_efficiency(packed: DataFrame, budget: int) -> DataFrame:
    """One-row summary: packs, docs, fill fraction (token sum over
    pack capacity, over-budget own-packs capped at budget)."""
    per_pack = packed.groupBy("pack_id").agg(
        F.first("pack_len").alias("pack_len"), F.first("pack_docs").alias("pack_docs")
    )
    return per_pack.agg(
        F.count("*").alias("n_packs"),
        F.sum("pack_docs").alias("n_docs"),
        F.round(
            F.sum(F.least(F.col("pack_len"), F.lit(budget)))
            / (F.count("*") * F.lit(budget)),
            6,
        ).alias("fill_frac"),
    )
