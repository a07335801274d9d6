"""Stream-stream interval join — the ONE stream-stream shape a 100 TB
pipeline can run safely.

An unconstrained stream-stream join needs full-history state on both
sides (why ``streaming/dedup.py`` refuses it for near-dup). The
exception is the INTERVAL join: when the join condition bounds the
right timestamp to a window after the left timestamp AND both sides
are watermarked, Spark can evict state as watermarks pass — state is
O(rate × (watermark + interval)), independent of stream age. This is
the attribution shape: "click within N minutes of the view".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` rows landing in ``(left_ts, left_ts + interval]``
    with the same ``key``. Both inputs may be streaming (interval +
    watermarks bound the keyed state) or batch (same plan, no state) —
    streaming == batch on finite input is asserted in
    tests/test_streaming.py.

    Column names: every right column is prefixed ``r_`` (the join key
    arrives as ``r_<key>``), so downstream code is unambiguous. Outer
    variants emit a left row with nulls once the watermark proves no
    match can arrive — results are eventual, not per-trigger, which is
    the correct semantic for attribution at scale.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select([F.col(c).alias(f"r_{c}") for c in rw.columns])
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") > F.col(left_ts))
        & (F.col(f"r_{right_ts}") <= F.col(left_ts) + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond, how)
