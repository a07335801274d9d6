"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the Structured Streaming counterpart of
the batch window-function sessionizer in suite._sessionize.

Semantics: events for a user belong to one session while consecutive
gaps stay ≤ ``gap_ms``; a larger gap (or session timeout) starts a new
session. State per user = the open session's (session_id, start,
last_ts, count, value_sum).

Scale notes: state is keyed by user_id — the shuffle partitions by
user and each executor holds only its users' open sessions (bounded by
active users, not event volume). With a timeout, closed sessions leave
the store, so the state size is O(concurrently-active users).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, "
    "start_ms bigint, end_ms bigint, sum_value double"
)
STATE_SCHEMA = "session_id bigint, start_ms bigint, last_ms bigint, n bigint, vsum double"


def _update_sessions(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_ms: int,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        sid, start, last, n, vsum = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, sid, n, start, last, round(vsum, 4)]],
            columns=["user_id", "session_id", "n_events", "start_ms", "end_ms", "sum_value"],
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts_ms", "event_id"])
    if state.exists:
        sid, start, last, n, vsum = state.get
    else:
        sid, start, last, n, vsum = 0, None, None, 0, 0.0

    out = []
    for ts, val in zip(rows["ts_ms"].tolist(), rows["value"].tolist()):
        if last is None:
            sid, start, last, n, vsum = sid + 1, ts, ts, 1, float(val)
        elif ts - last > gap_ms:
            out.append([user_id, sid, n, start, last, round(vsum, 4)])
            sid, start, last, n, vsum = sid + 1, ts, ts, 1, float(val)
        else:
            last, n, vsum = ts, n + 1, vsum + float(val)
    state.update((sid, start, last, n, vsum))
    state.setTimeoutDuration(gap_ms)
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_id", "n_events", "start_ms", "end_ms", "sum_value"],
        )


def sessionize_stateful(
    events: DataFrame, gap_ms: int = 30 * 60 * 1000
) -> DataFrame:
    """``applyInPandasWithState`` sessionizer over a streaming frame
    with columns (user_id, event_id, ts_ms, value). Emits CLOSED
    sessions (on gap within the stream, or on processing-time timeout
    for the tail session). The batch analog (suite._sessionize)
    produces the same (n_events, start, end, sum) tuples for fully
    closed sessions — pinned by tests.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _update_sessions(key, pdfs, state, gap_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
