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
