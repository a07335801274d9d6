"""Watermarked window aggregates over event streams.

Tumbling and sliding windows with late-data handling — the standard
Structured Streaming pattern (watermark bounds state; windows close
and emit finals in append mode). Callers pass a frame that already has
a proper ``timestamp`` column; normalize the testdata's physical ts
encoding with ``suite.ts_ms_expr`` (the single ts-normalization site)
plus ``timestamp_millis``.

Scale notes: windowed aggregation state is per (window, keys) — with a
watermark the store is bounded by (watermark horizon / slide) ×
|keys|. Partial aggregation applies before the shuffle exactly as in
batch groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts + value sums per key, late rows beyond
    the watermark dropped. Works identically on batch frames (window()
    is just an expression), which is how tests pin streaming == batch.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window_duration).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_event_rates(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event rate (events per window, all types): each
    row lands in window_duration/slide overlapping windows."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window_duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )
