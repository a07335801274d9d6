"""Neyman allocation + stratified draw: exact-budget/cap invariants,
the no-cap case against hand-computed largest-remainder shares,
variance dominance over proportional allocation, and the
deterministic-draw equivalence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.sampling import (
    bottomk_sample,
    neyman_allocation,
    stratified_sample,
)


def _mk(spark, spec, seed=0):
    """spec: {stratum: (n, sigma)} → df with ids and gaussian values."""
    rng = np.random.default_rng(seed)
    rows = []
    i = 0
    for s, (n, sig) in spec.items():
        for _ in range(n):
            rows.append((s, i, float(rng.normal(0, sig))))
            i += 1
    return spark.createDataFrame(rows, "s string, id bigint, v double")


def test_allocation_invariants_and_no_cap_shares(spark):
    spec = {"a": (1000, 1.0), "b": (1000, 3.0), "c": (500, 0.5)}
    df = _mk(spark, spec)
    out = {r.s: r for r in neyman_allocation(df, ["s"], "v", 100).collect()}
    assert sum(r.alloc for r in out.values()) == 100
    for s, (n, _) in spec.items():
        assert 0 <= out[s].alloc <= n
        assert out[s].n_rows == n
    # no cap binds → largest-remainder on N_h·σ̂_h shares, within ±1
    w = {s: out[s].n_rows * out[s].stddev for s in spec}
    tot = sum(w.values())
    for s in spec:
        assert abs(out[s].alloc - 100 * w[s] / tot) <= 1.0
    # the high-σ stratum dominates its same-size low-σ sibling
    assert out["b"].alloc > 2 * out["a"].alloc


def test_caps_bind_and_slack_respreads(spark):
    spec = {"tiny": (3, 100.0), "big": (1000, 1.0)}
    df = _mk(spark, spec)
    out = {r.s: r for r in neyman_allocation(df, ["s"], "v", 50).collect()}
    assert out["tiny"].alloc == 3  # capped at population
    assert out["big"].alloc == 47  # slack respread
    # budget larger than the corpus: everything fully sampled
    out = {r.s: r for r in neyman_allocation(df, ["s"], "v", 5000).collect()}
    assert out["tiny"].alloc == 3 and out["big"].alloc == 1000


def test_zero_variance_stratum_is_remainder_only(spark):
    rows = [("const", i, 5.0) for i in range(100)] + [
        ("wild", 1000 + i, float(v))
        for i, v in enumerate(np.random.default_rng(1).normal(0, 4, 100))
    ]
    df = spark.createDataFrame(rows, "s string, id bigint, v double")
    out = {r.s: r for r in neyman_allocation(df, ["s"], "v", 50).collect()}
    assert out["const"].stddev == 0.0
    assert out["const"].alloc == 0  # budget < wild's population
    assert out["wild"].alloc == 50


def test_neyman_beats_proportional_variance(spark):
    spec = {"a": (2000, 0.5), "b": (500, 5.0), "c": (1500, 1.5)}
    df = _mk(spark, spec, seed=3)
    out = {r.s: r for r in neyman_allocation(df, ["s"], "v", 120).collect()}
    N = sum(n for n, _ in spec.values())

    def est_var(alloc):
        # Var(stratified mean) = Σ W_h² σ_h² / n_h (no fpc)
        return sum(
            (out[s].n_rows / N) ** 2 * out[s].stddev ** 2 / alloc[s]
            for s in spec
        )

    neyman = {s: out[s].alloc for s in spec}
    prop = {s: max(1, round(120 * out[s].n_rows / N)) for s in spec}
    assert all(v >= 1 for v in neyman.values())
    assert est_var(neyman) <= est_var(prop) + 1e-12


def test_stratified_sample_draws_exactly_the_allocation(spark):
    spec = {"a": (300, 1.0), "b": (300, 4.0), "c": (50, 2.0)}
    df = _mk(spark, spec, seed=7)
    out = stratified_sample(df, ["s"], "v", "id", 60, salt="x")
    sizes = {r.s: r.c for r in out.groupBy("s").agg(F.count("*").alias("c")).collect()}
    allocs = {
        r.s: r.alloc for r in neyman_allocation(df, ["s"], "v", 60).collect()
    }
    assert sizes == {s: a for s, a in allocs.items() if a > 0}
    # equivalence: per-stratum direct bottom-alloc draw, same salt
    for s, a in allocs.items():
        if a == 0:
            continue
        direct = {
            r.id
            for r in bottomk_sample(
                df.where(F.col("s") == s), ["s"], "id", a, salt="x"
            ).collect()
        }
        got = {r.id for r in out.where(F.col("s") == s).collect()}
        assert got == direct


def test_allocation_validation(spark):
    df = _mk(spark, {"a": (10, 1.0)})
    with pytest.raises(ValueError):
        neyman_allocation(df, ["s"], "v", 0)
    with pytest.raises(ValueError):
        neyman_allocation(df, [], "v", 5)
    with pytest.raises(ValueError):
        neyman_allocation(df.where(F.lit(False)), ["s"], "v", 5)
