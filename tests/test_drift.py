"""Drift monitoring (operators/drift.py): numpy parity for PSI/JSD/TV
on known distributions, zero on identical inputs, sensitivity ordering
on planted shifts, and profile comparison semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.drift import hist_drift, profile_drift
from fenix_spark.operators.sketches import hist_rollup

LO, HI, BINS = 0.0, 100.0, 50


def _hist(spark, vals, key="k"):
    df = spark.createDataFrame([(key, float(v)) for v in vals], "k string, v double")
    return hist_rollup(df, ["k"], "v", LO, HI, BINS)


def _np_metrics(a, b, eps=1e-6):
    width = (HI - LO) / BINS
    ha = np.histogram(np.clip(a, LO, HI - 1e-9), bins=BINS, range=(LO, HI))[0]
    hb = np.histogram(np.clip(b, LO, HI - 1e-9), bins=BINS, range=(LO, HI))[0]
    p = np.maximum(ha / ha.sum(), eps)
    q = np.maximum(hb / hb.sum(), eps)
    m = (p + q) / 2
    psi = float(np.sum((p - q) * np.log(p / q)))
    jsd = float(0.5 * np.sum(p * np.log(p / m) + q * np.log(q / m)))
    tv = float(np.abs(p - q).sum() / 2)
    return psi, jsd, tv


def test_hist_drift_matches_numpy(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(40, 10, 4000)
    b = rng.normal(55, 14, 3000)  # shifted + widened
    r = hist_drift(_hist(spark, a), _hist(spark, b), ["k"]).collect()[0]
    psi, jsd, tv = _np_metrics(a, b)
    assert abs(r["psi"] - psi) < 1e-9 and abs(r["jsd"] - jsd) < 1e-9
    assert abs(r["tv"] - tv) < 1e-9
    assert (r["n_ref"], r["n_cur"]) == (4000, 3000)
    assert r["psi"] > 0.25  # a real shift scores as one


def test_hist_drift_zero_on_identical(spark):
    vals = list(np.linspace(1, 99, 500))
    r = hist_drift(_hist(spark, vals), _hist(spark, vals), ["k"]).collect()[0]
    assert r["psi"] == 0.0 and r["jsd"] == 0.0 and r["tv"] == 0.0


def test_hist_drift_orders_shift_severity_and_bounds(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(50, 8, 5000)
    small = rng.normal(52, 8, 5000)
    big = rng.normal(75, 8, 5000)
    h = _hist(spark, base)
    r_small = hist_drift(h, _hist(spark, small), ["k"]).collect()[0]
    r_big = hist_drift(h, _hist(spark, big), ["k"]).collect()[0]
    assert r_small["psi"] < r_big["psi"]
    assert r_small["jsd"] < r_big["jsd"] <= np.log(2) + 1e-12
    assert 0.0 <= r_small["tv"] < r_big["tv"] <= 1.0


def test_hist_drift_one_sided_key_is_maximal_not_skipped(spark):
    ref = _hist(spark, [10.0] * 50, key="only_ref")
    cur = _hist(spark, [90.0] * 50, key="only_cur")
    rows = {r["k"]: r for r in hist_drift(ref, cur, ["k"]).collect()}
    assert set(rows) == {"only_ref", "only_cur"}
    # the missing side is all-eps: PSI saturates, TV ~ 0.5 (ε-measure,
    # not a distribution), and the null n flags which side vanished
    assert rows["only_ref"]["psi"] > 1.0 and rows["only_cur"]["psi"] > 1.0
    assert rows["only_ref"]["tv"] == pytest.approx(0.5, abs=1e-3)
    assert rows["only_ref"]["n_cur"] is None and rows["only_ref"]["n_ref"] == 50
    assert rows["only_cur"]["n_ref"] is None and rows["only_cur"]["n_cur"] == 50


def test_hist_drift_on_merged_sketches_matches_direct(spark):
    """Drift works on MERGED summaries (the whole point: per-shard
    rollups fold first, drift compares the folds)."""
    from fenix_spark.operators.sketches import hist_merge

    rng = np.random.default_rng(11)
    a1, a2 = rng.uniform(0, 100, 2000), rng.uniform(0, 100, 2000)
    b = rng.normal(30, 5, 2500)
    merged = hist_merge(
        _hist(spark, a1).unionByName(_hist(spark, a2)), ["k", "bin"][:1] + ["bin"]
    ).groupBy("k", "bin").agg(F.sum("c").alias("c"))
    direct = _hist(spark, np.concatenate([a1, a2]))
    got_m = hist_drift(merged, _hist(spark, b), ["k"]).collect()[0]
    got_d = hist_drift(direct, _hist(spark, b), ["k"]).collect()[0]
    assert abs(got_m["psi"] - got_d["psi"]) < 1e-9
    assert abs(got_m["tv"] - got_d["tv"]) < 1e-9


def test_profile_drift_flags_the_right_columns(spark):
    from fenix_spark.operators.profile import profile

    a = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(100)],
        "id int, name string, score double",
    )
    rows_b = [(i, None if i % 4 == 0 else f"s{i}") for i in range(80)]
    b = spark.createDataFrame(rows_b, "id int, name string").withColumn(
        "extra", F.lit(1)
    )
    d = {r["column"]: r for r in profile_drift(profile(a), profile(b)).collect()}
    assert d["score"]["missing_in"] == "cur"  # dropped column surfaces
    assert d["extra"]["missing_in"] == "ref"  # added column surfaces
    assert d["name"]["null_rate_delta"] == pytest.approx(0.25)
    assert d["id"]["row_ratio"] == pytest.approx(0.8)
    assert d["id"]["max_changed"] and not d["id"]["min_changed"]


def test_hist_drift_grand_histograms(spark):
    """keys=[] compares grand histograms — one row, zero on self."""
    import numpy as np

    from fenix_spark.operators.sketches import hist_rollup

    rng = np.random.default_rng(21)
    a = spark.createDataFrame(
        [(float(v),) for v in rng.normal(40, 9, 1500)], "v double"
    )
    b = spark.createDataFrame(
        [(float(v),) for v in rng.normal(70, 9, 1500)], "v double"
    )
    ra = hist_rollup(a, [], "v", LO, HI, BINS)
    rb = hist_rollup(b, [], "v", LO, HI, BINS)
    same = hist_drift(ra, ra, []).collect()
    assert len(same) == 1 and same[0]["psi"] == 0.0
    moved = hist_drift(ra, rb, []).collect()[0]
    assert moved["psi"] > 0.25 and "__g" not in moved.asDict()


def test_freq_drift_categorical(spark):
    """Language-mix drift: identical mixes score 0; a mix shift and a
    vanished category both register; PSI matches the numpy formula."""
    ref_rows = [("a", "en")] * 70 + [("a", "de")] * 20 + [("a", "fr")] * 10
    cur_rows = [("a", "en")] * 40 + [("a", "de")] * 50 + [("a", "zh")] * 10
    ref = spark.createDataFrame(ref_rows, "g string, lang string")
    cur = spark.createDataFrame(cur_rows, "g string, lang string")
    from fenix_spark.operators.drift import freq_drift

    same = freq_drift(ref, ref, ["g"], "lang").collect()[0]
    assert same["psi"] == 0.0 and same["tv"] == 0.0
    r = freq_drift(ref, cur, ["g"], "lang").collect()[0]
    eps = 1e-6
    p = np.maximum(np.array([0.7, 0.2, 0.1, 0.0]), eps)
    q = np.maximum(np.array([0.4, 0.5, 0.0, 0.1]), eps)
    assert r["psi"] == pytest.approx(float(np.sum((p - q) * np.log(p / q))))
    assert r["tv"] == pytest.approx(float(np.abs(p - q).sum() / 2))
    assert r["psi"] > 0.25


def test_kll_ks_matches_exact_statistic(spark):
    """KS from sketches lands within the rank-error band of the exact
    two-sample statistic — and needs NO range configuration."""
    from fenix_spark.operators.drift import kll_ks
    from fenix_spark.operators.sketches import kll_rollup

    rng = np.random.default_rng(31)
    xa = rng.normal(0, 1, 6000)
    xb = rng.normal(0.35, 1, 6000)  # moderate shift

    def roll(vals):
        df = spark.createDataFrame([("k", float(v)) for v in vals], "g string, v double")
        return kll_rollup(df, ["g"], "v", 200)

    got = kll_ks(roll(xa), roll(xb), ["g"]).collect()[0]
    # exact KS via numpy
    allv = np.sort(np.concatenate([xa, xb]))
    ca = np.searchsorted(np.sort(xa), allv, side="right") / len(xa)
    cb = np.searchsorted(np.sort(xb), allv, side="right") / len(xb)
    exact = float(np.max(np.abs(ca - cb)))
    assert got["ks"] == pytest.approx(exact, abs=0.04)  # 2 sketches x ~2% rank err
    assert (got["n_a"], got["n_b"]) == (6000, 6000)
    # same distribution → ks within the noise/rank-error floor
    xc = rng.normal(0, 1, 6000)
    near0 = kll_ks(roll(xa), roll(xc), ["g"]).collect()[0]["ks"]
    assert near0 < 0.06
    # grand (empty-keys) arm works
    grand = kll_ks(
        roll(xa).drop("g"), roll(xb).drop("g"), []
    ).collect()
    assert len(grand) == 1 and grand[0]["ks"] == pytest.approx(exact, abs=0.04)


# ------------------------------------------------- embedding drift


def test_embedding_drift_identical_is_zero(spark):
    import numpy as np

    from fenix_spark.operators.drift import embedding_drift

    rng = np.random.default_rng(3)
    X = rng.normal(size=(500, 16))
    df = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(X)], "id int, v array<double>"
    )
    rep = embedding_drift(df, df.repartition(7), "v")
    assert rep["n_ref"] == rep["n_cur"] == 500
    assert rep["centroid_cos_dist"] == pytest.approx(0.0, abs=1e-12)
    assert rep["centroid_l2"] == pytest.approx(0.0, abs=1e-9)
    assert rep["trace_ratio"] == pytest.approx(1.0, rel=1e-9)
    assert rep["max_dim_z"] == pytest.approx(0.0, abs=1e-9)


def test_embedding_drift_detects_shift_scale_and_dim(spark):
    import numpy as np

    from fenix_spark.operators.drift import embedding_drift

    rng = np.random.default_rng(7)
    X = rng.normal(size=(800, 12)) + 5.0  # offset so cosine is meaningful
    Y = X.copy()
    Y[:, 4] += 3.0  # one drifted dimension
    df_x = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(X)], "id int, v array<double>"
    )
    df_y = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(Y)], "id int, v array<double>"
    )
    rep = embedding_drift(df_x, df_y, "v")
    assert rep["max_dim"] == 4
    assert rep["max_dim_z"] > 2.0
    assert rep["centroid_l2"] == pytest.approx(3.0, rel=0.1)
    # temperature change: x -> 2x scales variance by 4
    df_2x = spark.createDataFrame(
        [(i, (2 * r).tolist()) for i, r in enumerate(X)],
        "id int, v array<double>",
    )
    rep2 = embedding_drift(df_x, df_2x, "v")
    assert rep2["trace_ratio"] == pytest.approx(4.0, rel=1e-6)
    # direction unchanged under pure scaling
    assert rep2["centroid_cos_dist"] == pytest.approx(0.0, abs=1e-12)


def test_embedding_drift_numpy_parity_and_guards(spark):
    import numpy as np

    from fenix_spark.operators.drift import embedding_drift

    rng = np.random.default_rng(11)
    X = rng.normal(size=(300, 8))
    Y = rng.normal(size=(200, 8)) * 1.3 + 0.2
    df_x = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(X)], "id int, v array<double>"
    )
    df_y = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(Y)], "id int, v array<double>"
    )
    rep = embedding_drift(df_x, df_y, "v")
    mu_r, mu_c = X.mean(0), Y.mean(0)
    cos = mu_r @ mu_c / (np.linalg.norm(mu_r) * np.linalg.norm(mu_c))
    assert rep["centroid_cos_dist"] == pytest.approx(0.5 - 0.5 * cos, rel=1e-9)
    assert rep["trace_ratio"] == pytest.approx(
        Y.var(0).sum() / X.var(0).sum(), rel=1e-9
    )
    bad = spark.createDataFrame([(0, [1.0, 2.0])], "id int, v array<double>")
    with pytest.raises(ValueError, match="dim mismatch"):
        embedding_drift(df_x, bad, "v")
