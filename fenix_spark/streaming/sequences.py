"""Streaming Markov transition counting — the live arm of
``operators/sequences.transition_counts``: consecutive-event pairs per
key, stitched ACROSS micro-batch boundaries via
``applyInPandasWithState`` (the boundary pair is exactly what a
stateless per-batch lead() would silently drop).

State per key is ONE (last_ts, last_state) tuple — bounded by active
keys, not stream volume. Each micro-batch emits (from_state, to_state,
n) partial rows; they are plain additive counts, so any sink +
read-time ``sum`` reproduces the batch matrix (the same
partials-then-fold shape as the streaming sketch arms). Within a batch
events sort by (ts_ms, state) — the identical tie-break as the batch
operator, so streamed == batch is exact, not approximate.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_transitions", "merge_transitions"]

OUTPUT_SCHEMA = "from_state string, to_state string, n bigint"
STATE_SCHEMA = "last_ts bigint, last_state string"


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_ms", "state"]
    )
    if state.exists:
        last_ts, last_state = state.get
    else:
        last_ts, last_state = None, None
    counts: dict[tuple[str, str], int] = {}
    for ts, st in zip(rows["ts_ms"].tolist(), rows["state"].tolist()):
        if last_state is not None:
            pair = (last_state, st)
            counts[pair] = counts.get(pair, 0) + 1
        last_ts, last_state = int(ts), st
    state.update((last_ts, last_state))
    if counts:
        yield pd.DataFrame(
            [[a, b, n] for (a, b), n in sorted(counts.items())],
            columns=["from_state", "to_state", "n"],
        )


def stream_transitions(events: DataFrame) -> DataFrame:
    """Per-micro-batch transition-count partials over a streaming
    frame with columns (key, ts_ms, state). Boundary-straddling pairs
    are produced exactly once (the state carries each key's last
    event). Sink anywhere; fold with :func:`merge_transitions`.

    Ordering contract (same as the stateful sessionizer): events must
    arrive in ts order ACROSS micro-batches per key — within a batch
    any order is fine (sorted here). Out-of-order arrivals across
    batches would pair against the wrong predecessor; gate upstream
    with a watermark + sorted replay if the transport can reorder."""
    return events.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_transitions(partials: DataFrame) -> DataFrame:
    """Fold partial rows to the batch-identical matrix: sum counts per
    (from, to), then row-normalize — the same shape
    ``transition_counts(laplace=0)`` returns."""
    from pyspark.sql import Window

    c = partials.groupBy("from_state", "to_state").agg(F.sum("n").alias("n"))
    w = Window.partitionBy("from_state")
    return c.withColumn("prob", F.col("n") / F.sum("n").over(w))
