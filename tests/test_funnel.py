"""Funnel operator: python brute-mirror parity on random event
streams (with and without conversion windows), hand-computed window
semantics, strict-ordering ties, and the report arithmetic."""

from __future__ import annotations

import numpy as np
import pytest

from fenix_spark.operators.funnel import funnel_report, funnel_times


def _brute(events, stages, within=None):
    """{key: [t1..tk or None]} — direct implementation of the ordered
    first-match semantics."""
    by_key = {}
    for k, t, s in events:
        by_key.setdefault(k, []).append((t, s))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        ts = []
        prev = None
        for stage in stages:
            cand = [
                t
                for t, s in evs
                if s == stage
                and (prev is None or (t > prev and (within is None or t - prev <= within)))
            ]
            cur = min(cand) if cand else None
            ts.append(cur)
            if cur is None:
                ts.extend([None] * (len(stages) - len(ts)))
                break
            prev = cur
        out[k] = ts
    return out


STAGES = ["view", "click", "purchase"]


def _random_events(seed, n_keys=40, n_events=800):
    rng = np.random.default_rng(seed)
    evs = []
    for _ in range(n_events):
        evs.append(
            (
                int(rng.integers(0, n_keys)),
                int(rng.integers(0, 10_000)),
                STAGES[int(rng.integers(0, 3))],
            )
        )
    return evs


@pytest.mark.parametrize("within", [None, 1500])
def test_funnel_times_match_brute(spark, within):
    evs = _random_events(seed=31)
    df = spark.createDataFrame(evs, "key bigint, ts bigint, state string")
    got = {
        r.key: [r.t_1, r.t_2, r.t_3]
        for r in funnel_times(df, "key", "ts", "state", STAGES, within).collect()
    }
    want = _brute(evs, STAGES, within)
    # keys with no stage-1 event never appear in either
    want = {k: v for k, v in want.items() if v[0] is not None}
    assert got == want


def test_funnel_window_and_strict_order_semantics(spark):
    evs = [
        (1, 0, "view"), (1, 100, "click"), (1, 150, "purchase"),
        (2, 0, "view"), (2, 5000, "click"),          # click outside window
        (3, 0, "view"), (3, 0, "click"),             # same-ts: NOT after
        (4, 500, "click"),                           # no view at all
    ]
    df = spark.createDataFrame(evs, "key bigint, ts bigint, state string")
    got = {
        r.key: (r.t_1, r.t_2, r.t_3)
        for r in funnel_times(df, "key", "ts", "state", STAGES, within_ms=1000).collect()
    }
    assert got[1] == (0, 100, 150)
    assert got[2] == (0, None, None)
    assert got[3] == (0, None, None)
    assert 4 not in got


def test_funnel_report_rates(spark):
    evs = _random_events(seed=7)
    df = spark.createDataFrame(evs, "key bigint, ts bigint, state string")
    rep = {r.stage: r for r in funnel_report(df, "key", "ts", "state", STAGES).collect()}
    want = _brute(evs, STAGES)
    c1 = sum(1 for v in want.values() if v[0] is not None)
    c2 = sum(1 for v in want.values() if v[1] is not None)
    c3 = sum(1 for v in want.values() if v[2] is not None)
    assert rep["view"].keys == c1 and rep["view"].conversion_from_start == 1.0
    assert rep["click"].keys == c2
    assert rep["click"].conversion_from_prev == pytest.approx(c2 / c1)
    assert rep["purchase"].conversion_from_start == pytest.approx(c3 / c1)


def test_funnel_validation(spark):
    df = spark.createDataFrame([(1, 0, "a")], "key bigint, ts bigint, state string")
    with pytest.raises(ValueError, match="two stages"):
        funnel_times(df, "key", "ts", "state", ["a"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_times(df, "key", "ts", "state", ["a", "a"])
    with pytest.raises(ValueError, match="within_ms"):
        funnel_times(df, "key", "ts", "state", ["a", "b"], within_ms=0)
