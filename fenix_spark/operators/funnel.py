"""Ordered funnel analysis over arbitrary stage lists — the reusable
operator behind the suite's fixed view→click→purchase query: per key,
the earliest time each stage is reached STRICTLY AFTER the previous
stage (optionally within a conversion window), plus the aggregate
conversion report.

Semantics (the standard "first matching path" funnel): t₁ = min ts of
stage 1; tᵢ = min ts of stage i events with ts > tᵢ₋₁ (and
ts − tᵢ₋₁ ≤ ``within_ms`` when set — a window per TRANSITION, the
common product-analytics definition). A key converts through stage i
iff tᵢ is non-null; later stages are null once any stage is missed.
Strict inequality means same-timestamp events cannot satisfy two
stages at once (deterministic, engine-portable).

Scale shape: one groupBy collapses the event stream to (key, stage,
sorted ts-agg) — but rather than materializing per-key event lists,
each stage is ONE conditional aggregation joined on the key: k stages
cost k user-keyed hash aggregates over the (key, stage, ts) collapse,
all partial-aggregable, reusing the same hash partitioning (AQE keeps
the layout). Stage k's aggregate input is pre-filtered to that stage's
events — each round touches one stage's rows, not the stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_times", "funnel_report"]


def funnel_times(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    stages: Sequence[str],
    within_ms: int | None = None,
) -> DataFrame:
    """(key, t_1 … t_k) — per key, the first time each funnel stage
    completes under the ordered (and optionally windowed) semantics
    above; null from the first missed stage onward."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least two stages")
    if len(set(stages)) != len(stages):
        raise ValueError("stages must be distinct")
    if within_ms is not None and within_ms <= 0:
        raise ValueError(f"within_ms must be > 0 (got {within_ms})")
    ev = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(state_col).alias("state"),
    ).where(F.col("state").isin(list(stages)))

    cur = (
        ev.where(F.col("state") == stages[0])
        .groupBy("key")
        .agg(F.min("ts").alias("t_1"))
    )
    for i, stage in enumerate(stages[1:], start=2):
        prev = f"t_{i - 1}"
        nxt = ev.where(F.col("state") == stage).join(cur.select("key", prev), "key")
        cond = F.col("ts") > F.col(prev)
        if within_ms is not None:
            cond = cond & (F.col("ts") - F.col(prev) <= within_ms)
        step = (
            nxt.where(cond)
            .groupBy("key")
            .agg(F.min("ts").alias(f"t_{i}"))
        )
        cur = cur.join(step, "key", "left")
    return cur


def funnel_report(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    stages: Sequence[str],
    within_ms: int | None = None,
) -> DataFrame:
    """(stage_idx, stage, keys, conversion_from_start,
    conversion_from_prev) — one row per stage: how many keys reached
    it (under the ordered/windowed semantics), as counts and rates.
    Stage 1's rates are 1.0 by definition."""
    times = funnel_times(df, key_col, ts_col, state_col, stages, within_ms)
    counts = times.agg(
        *[
            F.count(F.col(f"t_{i}")).alias(f"c_{i}")
            for i in range(1, len(stages) + 1)
        ]
    ).first()
    spark = df.sparkSession
    rows = []
    for i, stage in enumerate(stages, start=1):
        c = counts[f"c_{i}"]
        c1 = counts["c_1"]
        cp = counts[f"c_{i - 1}"] if i > 1 else c
        rows.append(
            (
                i,
                stage,
                int(c),
                float(c / c1) if c1 else 0.0,
                float(c / cp) if cp else 0.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "stage_idx int, stage string, keys bigint, "
        "conversion_from_start double, conversion_from_prev double",
    )
