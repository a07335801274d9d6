"""Quantile normalization (operators/normalize.py). Proof bar: exact
parity with the window ``cume_dist`` when the sketch is exact; within
KLL rank error when approximate; monotone in the value within a group;
cross-source calibration actually calibrates (the planted use-case);
reference-sketch scoring matches fitting on the reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fenix_spark.operators.normalize import quantile_normalize
from fenix_spark.operators.sketches import kll_rollup


def test_exact_parity_with_cume_dist(spark):
    # distinct values per group <= k -> sketch exact -> parity EXACT
    rows = [(f"g{i % 3}", i, float((i * 7) % 50)) for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, id bigint, v double")
    got = {
        r["id"]: r["pct_rank"]
        for r in quantile_normalize(df, ["grp"], "v", k=512).collect()
    }
    w = Window.partitionBy("grp").orderBy("v")
    want = {
        r["id"]: r["cd"]
        for r in df.withColumn("cd", F.cume_dist().over(w)).collect()
    }
    assert got == want


def test_rank_error_bounded_when_approximate(spark):
    rng = np.random.default_rng(7)
    rows = [("g", i, float(v)) for i, v in enumerate(rng.lognormal(0, 1, 20_000))]
    df = spark.createDataFrame(rows, "grp string, id bigint, v double")
    got = {
        r["id"]: r["pct_rank"]
        for r in quantile_normalize(df, ["grp"], "v", k=200).collect()
    }
    w = Window.partitionBy("grp").orderBy("v")
    want = {
        r["id"]: r["cd"]
        for r in df.withColumn("cd", F.cume_dist().over(w)).collect()
    }
    errs = sorted(abs(got[i] - want[i]) for i in got)
    assert errs[-1] < 0.05  # generous KLL bound at k=200
    assert errs[len(errs) // 2] < 0.01


def test_monotone_within_group_and_null_handling(spark):
    rows = [("g", 1, 1.0), ("g", 2, 5.0), ("g", 3, 3.0), ("g", 4, None)]
    df = spark.createDataFrame(rows, "grp string, id bigint, v double")
    got = {r["id"]: r["pct_rank"] for r in quantile_normalize(df, ["grp"], "v").collect()}
    assert got[1] < got[3] < got[2] == 1.0
    assert got[4] is None


def test_cross_source_calibration(spark):
    """Two sources with shifted score scales: a global top-30% cut
    over-keeps the high-scale source; after per-source normalization
    the same cut keeps ~30% of EACH."""
    rng = np.random.default_rng(3)
    rows = [("a", i, float(v)) for i, v in enumerate(rng.normal(0.8, 0.05, 3000))]
    rows += [("b", 10_000 + i, float(v)) for i, v in enumerate(rng.normal(0.3, 0.05, 3000))]
    df = spark.createDataFrame(rows, "src string, id bigint, score double")

    # raw global cut: essentially everything kept is source a
    cut = df.approxQuantile("score", [0.7], 0.0)[0]
    raw = df.where(F.col("score") >= cut).groupBy("src").count().collect()
    raw_counts = {r["src"]: r["count"] for r in raw}
    assert raw_counts.get("b", 0) < 100 < raw_counts["a"]

    norm = quantile_normalize(df, ["src"], "score", k=512)
    kept = norm.where(F.col("pct_rank") > 0.7).groupBy("src").count().collect()
    by = {r["src"]: r["count"] for r in kept}
    for src in ("a", "b"):
        assert 0.25 * 3000 <= by[src] <= 0.35 * 3000, by


def test_reference_sketch_scoring(spark):
    """Scoring new data against a FROZEN reference sketch equals
    normalizing with that sketch fit inline — and a shifted increment
    lands in the reference's upper tail, not at its own median."""
    ref_rows = [("g", i, float(i)) for i in range(1000)]
    ref = spark.createDataFrame(ref_rows, "grp string, id bigint, v double")
    state = kll_rollup(ref, ["grp"], "v", k=2048)

    inc = spark.createDataFrame(
        [("g", 9001, 950.0), ("g", 9002, 2000.0)], "grp string, id bigint, v double"
    )
    got = {
        r["id"]: r["pct_rank"]
        for r in quantile_normalize(inc, ["grp"], "v", sketch=state).collect()
    }
    assert got[9001] == pytest.approx(0.951, abs=1e-9)  # 951 of 1000 <= 950
    assert got[9002] == 1.0  # beyond the reference max


def test_grand_group(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id bigint, v double"
    )
    got = {r["id"]: r["pct_rank"] for r in quantile_normalize(df, [], "v", k=64).collect()}
    assert got[0] == 0.1 and got[9] == 1.0
