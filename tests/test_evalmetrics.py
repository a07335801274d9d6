"""Classifier evaluation metrics: exact AUC vs a numpy Mann-Whitney
mirror (ties included), perfect/random/inverted invariants, Brier,
lift-table arithmetic, calibration semantics, and the loud contracts."""

from __future__ import annotations

import numpy as np
import pytest

from fenix_spark.operators.evalmetrics import (
    binary_auc,
    brier_score,
    calibration_table,
    lift_table,
)


def _np_auc(scores, labels):
    """Mann-Whitney with average ranks — independent mirror."""
    s = np.asarray(scores)
    y = np.asarray(labels)
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=float)
    sorted_s = s[order]
    i = 0
    r = 1
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        avg = (r + r + (j - i)) / 2.0
        ranks[order[i : j + 1]] = avg
        r += j - i + 1
        i = j + 1
    P = y.sum()
    N = len(y) - P
    return (ranks[y == 1].sum() - P * (P + 1) / 2) / (P * N)


def test_auc_matches_numpy_with_ties(spark):
    rng = np.random.default_rng(13)
    # noisy scores with heavy ties (quantized to 1 decimal)
    y = rng.integers(0, 2, size=400)
    s = np.round(rng.normal(0, 1, size=400) + 1.2 * y, 1)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(s, y)], "score double, label int"
    )
    assert binary_auc(df, "score", "label") == pytest.approx(_np_auc(s, y))


def test_auc_invariants(spark):
    rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label int")
    assert binary_auc(df, "score", "label") == pytest.approx(1.0)  # perfect
    inv = spark.createDataFrame(
        [(-a, b) for a, b in rows], "score double, label int"
    )
    assert binary_auc(inv, "score", "label") == pytest.approx(0.0)  # inverted
    const = spark.createDataFrame(
        [(1.0, b) for _, b in rows], "score double, label int"
    )
    assert binary_auc(const, "score", "label") == pytest.approx(0.5)  # all tied
    one_class = spark.createDataFrame([(0.5, 1), (0.7, 1)], "score double, label int")
    with pytest.raises(ValueError, match="both classes"):
        binary_auc(one_class, "score", "label")


def test_brier_hand_computed(spark):
    df = spark.createDataFrame(
        [(0.8, 1), (0.4, 0), (0.5, 1)], "score double, label int"
    )
    want = ((0.8 - 1) ** 2 + 0.4**2 + 0.5**2) / 3
    assert brier_score(df, "score", "label") == pytest.approx(want)


def test_lift_table_arithmetic(spark):
    # 100 rows, top 20 scores hold 15 of the 20 positives
    rows = [(float(100 - i), 1 if (i < 20 and i % 4 != 3) or i in (50, 60, 70, 80, 90) else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label int")
    t = {r.bin: r for r in lift_table(df, "score", "label", n_bins=5).collect()}
    total_pos = sum(y for _, y in rows)
    assert sum(r.n for r in t.values()) == 100
    assert t[1].n == 20 and t[1].n_pos == 15
    assert t[1].lift == pytest.approx((15 / 20) / (total_pos / 100))
    assert t[5].cum_capture == pytest.approx(1.0)
    caps = [t[i].cum_capture for i in range(1, 6)]
    assert caps == sorted(caps)


def test_calibration_semantics(spark):
    rng = np.random.default_rng(3)
    # perfectly calibrated synthetic: y ~ Bernoulli(p)
    rows = []
    for _ in range(20_000):
        p = float(rng.uniform())
        rows.append((p, int(rng.random() < p)))
    df = spark.createDataFrame(rows, "score double, label int")
    cal = calibration_table(df, "score", "label", n_bins=10).collect()
    assert len(cal) == 10
    for r in cal:
        assert r.lo <= r.mean_score <= r.hi + 1e-9
        assert abs(r.observed_rate - r.mean_score) < 0.05  # n≈2000/bin
    bad = spark.createDataFrame([(1.5, 1)], "score double, label int")
    with pytest.raises(ValueError, match="probability"):
        calibration_table(bad, "score", "label")
