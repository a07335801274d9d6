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


def windowed_trending_terms(
    docs: DataFrame,
    text_col: str,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-window TERM counts — the state half of a
    streaming trending-terms pipeline. Tokenize+explode is stateless
    map-side work; the windowed count is the only stateful stage
    (state per (window, term), watermark-bounded exactly like
    ``windowed_event_counts``). Works identically on batch frames.

    The per-window top-k CUT is not part of the streaming plan on
    purpose: rank-within-window needs the window CLOSED, so the
    production shape is append-mode output of closed windows →
    ``top_terms_per_window`` over the landed data (or inside a
    foreachBatch) — same split as the simhash tag/join pair.
    """
    from fenix_spark.functions.texthash import tokens

    if docs.isStreaming:
        docs = docs.withWatermark(ts_col, watermark)
    return (
        docs.select(F.window(ts_col, window_duration).alias("w"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("w", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "n",
        )
    )


def top_terms_per_window(term_counts: DataFrame, k: int = 10) -> DataFrame:
    """Deterministic per-window top-k over (closed-)window term counts
    — (count desc, term) ordering, one window shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start", "window_end").orderBy(
        F.desc("n"), "term"
    )
    return (
        term_counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
