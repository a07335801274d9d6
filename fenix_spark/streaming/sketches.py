"""Streaming sketch maintenance — keep distinct-count and frequency
summaries CONTINUOUSLY up to date as data lands, without ever
re-scanning history.

Mergeability (operators/sketches.py) is exactly what makes sketches
streamable: each micro-batch contributes its own partial summary, and
any read merges partials. State layout follows the repo's idempotent
foreachBatch convention (streaming/dedup.py): every batch writes ONLY
its own ``batch_id=N`` subdirectory, so

- a retried batch overwrites itself → exactly-once summaries over
  at-least-once foreachBatch, no read-modify-write race;
- the state is append-only; readers never see a torn merge because
  merging happens at READ time (`read_hll_rollup` / `read_cms`) over
  whatever complete batch directories exist;
- compaction is optional hygiene, not correctness: when batch count
  grows, `compact_state` folds all partials into one batch-shaped
  directory under a fresh id (idempotent the same way).

Cost ledger: per batch, the HLL fold shuffles ≤ |groups| sketch rows
(~1.5 KB each) and the CMS fold ≤ depth×width count rows — both
independent of batch row count after map-side partial aggregation.
Reads merge B·|groups| (or B·d·w) rows for B batch partials — that is
what `compact_state` bounds.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fenix_spark.operators.sketches import cms_build, hll_merge, hll_rollup


def _batch_dirs(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("batch_id=")
    )


def stream_hll_rollup(
    stream_df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    state_root: str,
    lg_k: int = 12,
):
    """foreachBatch writer: each micro-batch's per-group HLL partial
    lands under ``state_root/batch_id=N``. Returns the writeStream
    (caller picks the trigger and starts it)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = hll_rollup(batch_df, list(keys), value_col, lg_k)
        part.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def read_hll_rollup(
    spark: SparkSession, state_root: str, keys: Sequence[str]
) -> DataFrame:
    """Merge every landed batch partial to the requested grain:
    (keys..., hll, distinct_est). ``keys`` ⊆ the rollup keys (empty →
    grand total)."""
    batches = _batch_dirs(state_root)
    if not batches:
        raise FileNotFoundError(f"no sketch state under {state_root}")
    parts = spark.read.parquet(
        *[f"{state_root}/batch_id={b}" for b in batches]
    )
    return hll_merge(parts, list(keys))


def stream_cms(
    stream_df: DataFrame,
    term_col: str,
    state_root: str,
    depth: int = 4,
    width: int = 2048,
    tokenize: bool = False,
):
    """foreachBatch writer for a streaming count-min sketch over a
    term column (or tokenized text column with ``tokenize=True``)."""
    from fenix_spark.functions.texthash import tokens

    def process(batch_df: DataFrame, batch_id: int) -> None:
        terms = (
            batch_df.select(F.explode(tokens(F.col(term_col))).alias("term"))
            if tokenize
            else batch_df.select(F.col(term_col).alias("term"))
        )
        sk = cms_build(terms, "term", depth, width)
        sk.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def read_cms(spark: SparkSession, state_root: str) -> DataFrame:
    """The merged sketch (r, b, c) over all landed batches — feed it
    to ``sketches.cms_estimate``."""
    batches = _batch_dirs(state_root)
    if not batches:
        raise FileNotFoundError(f"no sketch state under {state_root}")
    parts = spark.read.parquet(
        *[f"{state_root}/batch_id={b}" for b in batches]
    )
    return parts.groupBy("r", "b").agg(F.sum("c").alias("c"))


def compact_state(spark: SparkSession, state_root: str) -> int:
    """Fold all batch partials into one: write the merged summary
    under ``batch_id=<max+1>``, then drop the inputs. Write-then-
    delete ordering means a crash mid-compaction leaves EXTRA partials
    (merge-safe: merging a batch with its own fold double-counts —
    so the fold lands under a NEW id and inputs are removed only
    after the write commits; a reader between the two sees the fold
    plus originals, which for HLL unions is idempotent by
    set-semantics and for CMS is the one documented over-count window
    — run compaction in the maintenance lane, not concurrent with
    point reads that must be exact). Returns the new batch id."""
    import shutil

    batches = _batch_dirs(state_root)
    if len(batches) <= 1:
        return batches[0] if batches else -1
    parts = spark.read.parquet(
        *[f"{state_root}/batch_id={b}" for b in batches]
    )
    cols = parts.columns
    if {"r", "b", "c"} <= set(cols):
        folded = parts.groupBy("r", "b").agg(F.sum("c").alias("c"))
    else:
        group = [c for c in cols if c != "hll"]
        folded = parts.groupBy(*group).agg(F.hll_union_agg("hll").alias("hll"))
    new_id = batches[-1] + 1
    folded.write.mode("overwrite").parquet(f"{state_root}/batch_id={new_id}")
    for b in batches:
        shutil.rmtree(f"{state_root}/batch_id={b}")
    return new_id
