"""Poisson bootstrap (operators/bootstrap.py). Proof bar: replicate
sums reproduce a pure-numpy mirror of the same md5 weight construction
BIT-FOR-BIT; empirical coverage over many groups brackets the nominal
level; intervals are layout-independent, contain the estimate, nest
with confidence, and collapse for constant data."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.bootstrap import POISSON1_CDF, bootstrap_ci


def _py_u(ident: str, salt: str, b: int) -> float:
    h = int(
        hashlib.md5(f"{ident}|{salt}|b{b}".encode()).hexdigest()[:15], 16
    )
    return float(h + 1) / float(1 << 60)


def _py_weight(ident: str, salt: str, b: int) -> float:
    u = _py_u(ident, salt, b)
    for k, c in enumerate(POISSON1_CDF):
        if u <= c:
            return float(k)
    return float(len(POISSON1_CDF))


def test_replicates_match_numpy_mirror_bitwise(spark):
    rows = [("g", i, float(i * i % 17)) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, id bigint, v double")
    out = bootstrap_ci(
        df, ["grp"], "v", "id", stat="mean", n_boot=25, salt="s"
    ).first()
    # rebuild every replicate mean in pure python/numpy
    thetas = []
    for b in range(25):
        ws = np.array([_py_weight(str(i), "s", b) for _, i, _ in rows])
        xs = np.array([v for _, _, v in rows])
        thetas.append(float((ws * xs).sum() / ws.sum()))
    thetas.sort()
    lo_idx = max(1, int(np.ceil(25 * 0.025)))
    assert out["lo"] == thetas[lo_idx - 1]  # exact: same doubles
    assert out["hi"] == thetas[25 - lo_idx]
    assert out["estimate"] == pytest.approx(np.mean([v for _, _, v in rows]))


def test_coverage_brackets_nominal_level(spark):
    """300 groups of 80 draws from a known-mean population: the share
    of 95% CIs containing the true mean must sit near 0.95 (the
    construction is deterministic, so this is a fixed number — pinned
    to a generous [0.88, 1.0] band to stay robust to the small-n
    bootstrap's conservatism)."""
    rng = np.random.default_rng(42)
    true_mean = 10.0
    rows = []
    for g in range(300):
        for i, v in enumerate(rng.normal(true_mean, 4.0, size=80)):
            rows.append((g, g * 1000 + i, float(v)))
    df = spark.createDataFrame(rows, "grp int, id bigint, v double")
    out = bootstrap_ci(df, ["grp"], "v", "id", n_boot=100).collect()
    assert len(out) == 300
    cover = sum(1 for r in out if r["lo"] <= true_mean <= r["hi"]) / 300
    assert 0.88 <= cover <= 1.0, cover
    # and the intervals are not vacuous: median width is a few σ/√n
    widths = sorted(r["hi"] - r["lo"] for r in out)
    assert 0.5 < widths[150] < 4.0, widths[150]


def test_layout_independent_and_contains_estimate(spark):
    rows = [(f"g{i % 3}", i, float(i % 23)) for i in range(600)]
    df = spark.createDataFrame(rows, "grp string, id bigint, v double")
    a = {r["grp"]: r for r in bootstrap_ci(df.repartition(32), ["grp"], "v", "id", n_boot=40).collect()}
    b = {r["grp"]: r for r in bootstrap_ci(df.coalesce(1), ["grp"], "v", "id", n_boot=40).collect()}
    for g in a:
        assert (a[g]["lo"], a[g]["hi"]) == (b[g]["lo"], b[g]["hi"])
        assert a[g]["lo"] <= a[g]["estimate"] <= a[g]["hi"]


def test_confidence_nesting_and_constant_collapse(spark):
    rows = [("g", i, float((i * 31) % 101)) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, id bigint, v double")
    wide = bootstrap_ci(df, ["grp"], "v", "id", n_boot=100, confidence=0.99).first()
    narrow = bootstrap_ci(df, ["grp"], "v", "id", n_boot=100, confidence=0.8).first()
    assert wide["lo"] <= narrow["lo"] <= narrow["hi"] <= wide["hi"]

    const = spark.createDataFrame(
        [("g", i, 7.0) for i in range(100)], "grp string, id bigint, v double"
    )
    r = bootstrap_ci(const, ["grp"], "v", "id", n_boot=50).first()
    assert r["lo"] == r["hi"] == r["estimate"] == 7.0


def test_sum_stat_and_grand_group(spark):
    rows = [("g", i, 2.0) for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, id bigint, v double")
    r = bootstrap_ci(df, [], "v", "id", stat="sum", n_boot=60).first()
    assert r["estimate"] == 200.0
    # sum replicates fluctuate around the total (Poisson weights mean 1)
    assert r["lo"] < 200.0 < r["hi"]


def test_validation(spark):
    df = spark.createDataFrame([("g", 1, 1.0)], "grp string, id bigint, v double")
    with pytest.raises(ValueError, match="stat"):
        bootstrap_ci(df, ["grp"], "v", "id", stat="median")
    with pytest.raises(ValueError, match="confidence"):
        bootstrap_ci(df, ["grp"], "v", "id", confidence=0.4)
    with pytest.raises(ValueError, match="n_boot"):
        bootstrap_ci(df, ["grp"], "v", "id", n_boot=0)
