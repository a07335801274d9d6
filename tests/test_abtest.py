"""A/B analysis: numpy mirrors for Welch/z/CUPED, planted-effect
detection vs null, CUPED's variance-reduction and unbiasedness
invariants, and the loud degenerate contracts."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fenix_spark.operators.abtest import (
    ab_summary,
    cuped_adjust,
    proportion_ztest,
    welch_test,
)


def _np_welch(xa, xb):
    na, nb = len(xa), len(xb)
    va, vb = np.var(xa, ddof=1) / na, np.var(xb, ddof=1) / nb
    se = math.sqrt(va + vb)
    t = (np.mean(xa) - np.mean(xb)) / se
    dof = (va + vb) ** 2 / (va**2 / (na - 1) + vb**2 / (nb - 1))
    p = math.erfc(abs(t) / math.sqrt(2))
    return t, dof, p


@pytest.fixture(scope="module")
def exp_df(spark):
    rng = np.random.default_rng(21)
    rows = []
    for i in range(800):
        pre = float(rng.normal(50, 10))
        rows.append(("control", pre + float(rng.normal(0, 5)), pre, False))
    for i in range(750):
        pre = float(rng.normal(50, 10))
        rows.append(("treat", pre + float(rng.normal(1.5, 5)), pre, True))
    return (
        spark.createDataFrame(
            rows, "variant string, y double, pre double, clicked boolean"
        ),
        rows,
    )


def test_welch_matches_numpy(exp_df):
    df, rows = exp_df
    xa = np.array([r[1] for r in rows if r[0] == "treat"])
    xb = np.array([r[1] for r in rows if r[0] == "control"])
    got = welch_test(df, "variant", "y", "treat", "control")
    t, dof, p = _np_welch(xa, xb)
    assert got["t"] == pytest.approx(t)
    assert got["df"] == pytest.approx(dof)
    assert got["p_value"] == pytest.approx(p)
    assert got["n_a"] == len(xa) and got["n_b"] == len(xb)
    # the planted 1.5 effect on sd≈11 with n≈800 is detectable
    assert got["p_value"] < 0.05 and got["diff"] > 0


def test_welch_null_effect_is_insignificant(spark):
    rng = np.random.default_rng(4)
    rows = [("a" if i % 2 else "b", float(rng.normal(10, 3))) for i in range(2000)]
    df = spark.createDataFrame(rows, "variant string, y double")
    got = welch_test(df, "variant", "y", "a", "b")
    assert got["p_value"] > 0.01  # seeded: no false positive


def test_proportion_ztest_matches_numpy(spark):
    rows = [("a", i < 300) for i in range(1000)] + [
        ("b", i < 240) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "variant string, ok boolean")
    got = proportion_ztest(df, "variant", "ok", "a", "b")
    pa, pb, pool = 0.3, 0.24, 0.27
    se = math.sqrt(pool * (1 - pool) * (2 / 1000))
    z = (pa - pb) / se
    assert got["z"] == pytest.approx(z)
    assert got["p_value"] == pytest.approx(math.erfc(abs(z) / math.sqrt(2)))
    assert got["rate_a"] == 0.3 and got["rate_b"] == 0.24


def test_cuped_reduces_variance_preserves_means(exp_df):
    df, rows = exp_df
    adj, theta = cuped_adjust(df, "y", "pre")
    # theta mirrors numpy cov/var on the pooled data
    y = np.array([r[1] for r in rows])
    x = np.array([r[2] for r in rows])
    assert theta == pytest.approx(
        float(np.cov(y, x, ddof=1)[0, 1] / np.var(x, ddof=1))
    )
    raw = welch_test(df, "variant", "y", "treat", "control")
    cup = welch_test(adj, "variant", "y_cuped", "treat", "control")
    # per-variant mean differences preserved within noise...
    assert cup["diff"] == pytest.approx(raw["diff"], abs=0.5)
    # ...variance (se) sharply reduced: pre explains most of y
    assert cup["se"] < 0.6 * raw["se"]
    # and the effect is MORE significant after adjustment
    assert cup["p_value"] < raw["p_value"]


def test_degenerate_contracts(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 1.0, 1.0), ("b", 1.0, 1.0)],
        "variant string, y double, pre double",
    )
    with pytest.raises(ValueError, match="n=1 < 2"):
        welch_test(df, "variant", "y", "a", "b")
    with pytest.raises(ValueError, match="not present"):
        welch_test(df, "variant", "y", "a", "zzz")
    with pytest.raises(ValueError, match="constant"):
        cuped_adjust(df, "y", "pre")
    big = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)], "variant string, y double"
    )
    with pytest.raises(ValueError, match="se is 0"):
        welch_test(big, "variant", "y", "a", "b")
    summary = ab_summary(big, "variant", "y").collect()
    assert {r.group: r.n for r in summary} == {"a": 2, "b": 2}
