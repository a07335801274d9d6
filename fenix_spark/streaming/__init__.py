"""Structured Streaming surface.

The reference has NO streaming (SURVEY.md §2.9) — its ingest is a gRPC
request/response loop over static files (src/fenix/flight.py:34-44).
This package is the Spark-native extension the north star asks for:
the same parquet catalog layout fed by `readStream`/`writeStream`,
watermarked window aggregates for late events, and a custom stateful
sessionizer via ``applyInPandasWithState``.

Kept OUT of the correctness-critical oracle path (streaming output is
not SQL-reproducible in DuckDB); tests instead assert streaming ==
batch equivalence on finite inputs, which is the strongest available
check for these operators.
"""

from fenix_spark.streaming.dedup import (
    stream_exact_dedup,
    stream_incremental_neardup,
    stream_simhash_tag,
    stream_substring_dedup,
)
from fenix_spark.streaming.ingest import enrich_stream, stream_ingest, stream_source
from fenix_spark.streaming.joins import stream_interval_join
from fenix_spark.streaming.sequences import merge_transitions, stream_transitions
from fenix_spark.streaming.sessions import sessionize_stateful
from fenix_spark.streaming.sketches import (
    compact_state,
    hist_state_layout,
    read_bloom,
    read_cms,
    read_counts,
    read_hist,
    read_hll_rollup,
    read_kll,
    read_theta,
    stream_bloom,
    stream_cms,
    stream_counts,
    stream_hist,
    stream_hll_rollup,
    stream_kll,
    stream_theta,
)
from fenix_spark.streaming.topk import merged_heavy_hitters, stream_heavy_hitters
from fenix_spark.streaming.windows import sliding_event_rates, windowed_event_counts

__all__ = [
    "compact_state",
    "read_bloom",
    "read_cms",
    "read_hll_rollup",
    "read_kll",
    "read_theta",
    "read_hist",
    "read_counts",
    "stream_counts",
    "stream_hist",
    "hist_state_layout",
    "stream_bloom",
    "stream_kll",
    "stream_theta",
    "sessionize_stateful",
    "stream_transitions",
    "merge_transitions",
    "stream_cms",
    "stream_heavy_hitters",
    "merged_heavy_hitters",
    "stream_hll_rollup",
    "sliding_event_rates",
    "stream_exact_dedup",
    "enrich_stream",
    "stream_ingest",
    "stream_interval_join",
    "stream_incremental_neardup",
    "stream_simhash_tag",
    "stream_substring_dedup",
    "stream_source",
    "windowed_event_counts",
]
