"""Streaming deduplication — the online counterpart of the batch dedup
family (operators/dedup.py) for continuously-ingested training corpora.

Two Spark-native levels:

- ``stream_exact_dedup``: first-occurrence-wins exact dedup on the
  60-bit content hash via ``dropDuplicatesWithinWatermark`` — the
  engine's keyed state holds one entry per distinct hash seen inside
  the watermark horizon, so state is bounded by the dedup window, not
  the stream's lifetime. This is the right semantic for crawl ingest,
  where re-fetches of the same page cluster in time.
- ``stream_simhash_tag``: stateless near-dup TAGGING — every document
  gets its simhash fingerprint and band keys as it flows through; the
  pairwise band join then runs as a cheap periodic batch over the
  landed data (joins of two unbounded streams would need full-history
  state, which is exactly what a 100 TB pipeline must not hold).
  Stateless tagging + periodic batch join is the standard production
  split for streaming near-dedup.

Both reuse the batch operators' expression builders, so streamed
results are comparable to batch outputs on the same finite input —
asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60, simhash, tokens
from fenix_spark.operators.dedup import normalized_text
from fenix_spark.checkpoint import checkpoint_eager as _ckpt_eager


def stream_exact_dedup(
    events: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first occurrence of each distinct (normalized) document
    within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keys state by the 8-byte content
    hash only (not the document), and evicts entries once the watermark
    passes — O(distinct docs per window) state, shuffled by hash key so
    it scales out with executors. Duplicates arriving later than the
    watermark are NOT caught (they land in a new state entry): choose
    the watermark to cover the re-ingest clustering window.
    """
    return (
        events.withColumn("content_hash", hash60(normalized_text(F.col(text_col))))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def simhash_band_keys(sim: Column, bands: int = 4, band_bits: int = 8) -> Column:
    """Array of (band, key) structs — the same pigeonhole bands the
    batch join uses (operators/dedup.py): hamming ≤ bands-1 pairs agree
    exactly on ≥ 1 band."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(sim, band_bits * b)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )


def stream_simhash_tag(events: DataFrame, text_col: str) -> DataFrame:
    """Append simhash fingerprint + band keys to a streaming frame —
    pure per-row expressions (stateless, rate-limited only by the
    source), so the downstream near-dup join can run as a periodic
    batch over landed, already-fingerprinted data instead of holding
    the whole corpus in streaming state."""
    sim = simhash(tokens(F.col(text_col)), 32)
    return events.withColumn("sim", sim).withColumn("sim_bands", simhash_band_keys(F.col("sim")))


def stream_incremental_neardup(
    stream_docs: DataFrame,
    state_root: str,
    pairs_root: str,
    text_col: str,
    id_col: str,
    threshold: float = 0.95,
    shingle: int = 1,
    num_components: int = 24,
    bands: int = 3,
):
    """Continuous MinHash near-dup: each micro-batch is an INCREMENT
    probed against the persisted corpus band state
    (operators/dedup.incremental_neardup_pairs), then folded into it.

    - State = two growing parquet tables under ``state_root``
      (``sets``, ``bands``), written per batch into
      ``batch_id=N`` subdirectories — a retried batch OVERWRITES its
      own subdirectory, so both the state fold and the pair output are
      idempotent (exactly-once results over at-least-once foreachBatch).
    - Emitted pairs land under ``pairs_root/batch_id=N``: each pair
      appears exactly once, in the batch where its LATER member
      arrived. The union over batches equals the one-shot batch
      recompute over all arrived docs (asserted in tests).
    - Per-batch cost is increment-bands × corpus-bands on (band, key)
      — the corpus is never re-banded or re-read beyond the band join
      and the candidate ids' hashed sets.

    Returns a started ``StreamingQuery`` (availableNow semantics are
    the caller's trigger choice — pass the writeStream through
    ``.trigger(availableNow=True)`` workflows by configuring the
    returned query's parent; here we start with the default trigger
    unless the source bounds it).
    """
    from fenix_spark.operators.dedup import (
        incremental_pairs_from_state,
        minhash_state,
    )
    from fenix_spark.streaming.fsutil import list_child_names

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sets_dir = f"{state_root}/sets"
        bands_dir = f"{state_root}/bands"
        new_sets, new_bands = minhash_state(
            batch_df, text_col, id_col, shingle, num_components, bands
        )
        new_sets = new_sets.transform(_ckpt_eager)
        new_bands = new_bands.transform(_ckpt_eager)
        # Hadoop-FS listing (fsutil): state_root may be HDFS/S3A
        prior = [
            int(d.split("=", 1)[1])
            for d in list_child_names(spark, sets_dir)
            if d.startswith("batch_id=") and int(d.split("=", 1)[1]) < batch_id
        ]
        if prior:
            # read only PRIOR batches' state (a retry of batch N must
            # not see N's own half-written fold)
            corpus_sets = spark.read.parquet(
                *[f"{sets_dir}/batch_id={b}" for b in prior]
            ).select("id", "s", "sz")
            corpus_bands = spark.read.parquet(
                *[f"{bands_dir}/batch_id={b}" for b in prior]
            ).select("id", "sz", "band", "key")
        else:
            corpus_sets = spark.createDataFrame([], new_sets.schema)
            corpus_bands = spark.createDataFrame([], new_bands.schema)
        pairs = incremental_pairs_from_state(
            new_sets, new_bands, corpus_sets, corpus_bands, threshold
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_root}/batch_id={batch_id}")
        new_sets.write.mode("overwrite").parquet(f"{sets_dir}/batch_id={batch_id}")
        new_bands.write.mode("overwrite").parquet(f"{bands_dir}/batch_id={batch_id}")

    return stream_docs.writeStream.foreachBatch(process)


def stream_substring_dedup(
    stream_docs: DataFrame,
    state_root: str,
    out_root: str,
    text_col: str,
    id_col: str,
    min_tokens: int = 50,
    verify_exact: bool = True,
):
    """Continuous ExactSubstr (operators/substring): each micro-batch
    dedups against the window-hash state of all PRIOR batches, then
    folds its own distinct double hashes in.

    - State = one (h1, h2) parquet fold per batch under
      ``state_root/batch_id=N`` — a retried batch overwrites its own
      fold, so state and output are idempotent over at-least-once
      foreachBatch.
    - Rewritten docs land under ``out_root/batch_id=N`` with
      ``tokens_removed``; a doc appears exactly once, in its arrival
      batch.
    - Equivalence contract: when doc ids are MONOTONE with arrival
      order (the same contract as ``incremental_dedup_substrings``),
      the union over batches equals the one-shot batch pass over all
      arrived docs (asserted in tests). Earlier-batch copies are
      canonical either way; monotone ids make that the batch pass's
      min-(id, pos) rule.
    - Per-batch cost: batch-sized window hashing + ONE left-semi probe
      of the accumulated state + the batch pipeline among the batch's
      own docs. Corpus text is never re-read.
    """
    from fenix_spark.operators.substring import (
        incremental_dedup_substrings,
        substring_state,
    )
    from fenix_spark.streaming.fsutil import list_child_names

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prior = [
            int(d.split("=", 1)[1])
            for d in list_child_names(spark, state_root)
            if d.startswith("batch_id=") and int(d.split("=", 1)[1]) < batch_id
        ]
        if prior:
            corpus_state = spark.read.parquet(
                *[f"{state_root}/batch_id={b}" for b in prior]
            ).select("h1", "h2")
        else:
            corpus_state = spark.createDataFrame([], "h1 bigint, h2 bigint")
        batch_df = batch_df.transform(_ckpt_eager)
        out = incremental_dedup_substrings(
            batch_df, corpus_state, text_col, id_col, min_tokens, verify_exact
        )
        out.write.mode("overwrite").parquet(f"{out_root}/batch_id={batch_id}")
        substring_state(batch_df, text_col, id_col, min_tokens).write.mode(
            "overwrite"
        ).parquet(f"{state_root}/batch_id={batch_id}")

    return stream_docs.writeStream.foreachBatch(process)
