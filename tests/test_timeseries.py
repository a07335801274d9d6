"""Gap-fill tests: hand-checked grids, Timescale fill semantics
(locf / linear / zero / none), a DuckDB mirror on real events, and the
density/cap contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.timeseries import gapfill

ROWS = [
    # key, ts_ms, value — key "a" has buckets 0,10,40 (gaps 20,30)
    ("a", 0, 10.0),
    ("a", 5, 20.0),      # same bucket as ts 0 at grain 10 → avg 15
    ("a", 12, 30.0),
    ("a", 40, 60.0),
    # key "b": single observation → no gaps
    ("b", 100, 5.0),
]


@pytest.fixture(scope="module")
def ts_df(spark):
    return spark.createDataFrame(ROWS, "key string, ts_ms bigint, value double")


def _rows(df):
    return {
        (r.key, r.bucket_ms): (r.value, r.filled)
        for r in df.collect()
    }


def test_dense_grid_and_agg(spark, ts_df):
    got = _rows(gapfill(ts_df, "key", "ts_ms", "value", grain_ms=10))
    assert got[("a", 0)] == (15.0, False)   # avg of 10, 20
    assert got[("a", 10)] == (30.0, False)
    assert got[("a", 20)] == (None, True)
    assert got[("a", 30)] == (None, True)
    assert got[("a", 40)] == (60.0, False)
    assert got[("b", 100)] == (5.0, False)
    assert len(got) == 6  # 5 buckets for a, 1 for b — dense, no extras


def test_locf_and_zero_and_linear(spark, ts_df):
    locf = _rows(gapfill(ts_df, "key", "ts_ms", "value", 10, fill="locf"))
    assert locf[("a", 20)][0] == 30.0 and locf[("a", 30)][0] == 30.0

    zero = _rows(gapfill(ts_df, "key", "ts_ms", "value", 10, fill="zero"))
    assert zero[("a", 20)][0] == 0.0

    lin = _rows(gapfill(ts_df, "key", "ts_ms", "value", 10, fill="linear"))
    # 30 → 60 over buckets 10..40: 20 → 40, 30 → 50
    assert lin[("a", 20)][0] == pytest.approx(40.0)
    assert lin[("a", 30)][0] == pytest.approx(50.0)
    assert lin[("a", 0)][0] == 15.0  # real values untouched


def test_linear_edges_stay_null(spark):
    df = spark.createDataFrame(
        [("k", 10, 1.0), ("k", 30, 3.0)], "key string, ts_ms bigint, value double"
    )
    # leading/trailing buckets beyond observations: only the span is
    # generated (10..30), so nulls-outside-span never exist; interior
    # gap interpolates
    got = _rows(gapfill(df, "key", "ts_ms", "value", 10, fill="linear"))
    assert got == {
        ("k", 10): (1.0, False),
        ("k", 20): (2.0, True),
        ("k", 30): (3.0, False),
    }


def test_cap_is_loud(spark, ts_df):
    with pytest.raises(ValueError, match="max_buckets_per_key"):
        gapfill(ts_df, "key", "ts_ms", "value", 1, max_buckets_per_key=10).collect()


def test_duckdb_mirror_on_events(spark, sf_dir):
    """Gap-fill the real events table per event_type at 1-hour grain
    (agg=sum, locf) and mirror the whole thing in DuckDB."""
    import duckdb

    from fenix_spark.suite import events_table

    ev = events_table(spark, sf_dir).select("event_type", "ts_ms", "value")
    grain = 3_600_000
    got = {
        (r.key, r.bucket_ms): (
            round(r.value, 6) if r.value is not None else None,
            r.filled,
        )
        for r in gapfill(ev, "event_type", "ts_ms", "value", grain, agg="sum", fill="locf").collect()
    }

    con = duckdb.connect()
    want = {}
    for key, bucket, value, filled in con.execute(f"""
        WITH e AS (
            SELECT event_type AS key,
                   (epoch_ms(ts) // {grain}) * {grain} AS bucket_ms, value
            FROM read_parquet('{sf_dir}/events.parquet')
        ),
        sparse AS (
            SELECT key, bucket_ms, sum(value) AS value
            FROM e GROUP BY key, bucket_ms
        ),
        extent AS (
            SELECT key, min(bucket_ms) AS lo, max(bucket_ms) AS hi FROM sparse GROUP BY key
        ),
        grid AS (
            SELECT key, unnest(range(lo, hi + {grain}, {grain})) AS bucket_ms FROM extent
        ),
        dense AS (
            SELECT g.key, g.bucket_ms, s.value, s.value IS NULL AS filled
            FROM grid g LEFT JOIN sparse s USING (key, bucket_ms)
        )
        SELECT key, bucket_ms,
               last_value(value IGNORE NULLS) OVER
                   (PARTITION BY key ORDER BY bucket_ms
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
               filled
        FROM dense
    """).fetchall():
        want[(key, bucket)] = (round(value, 6) if value is not None else None, filled)
    assert got == want
    assert any(f for _, f in got.values()), "events must actually have gaps"


def test_bucketize_floors_negative_timestamps(spark):
    """Pre-1970 timestamps must FLOOR onto the grid: -1 ms belongs to
    bucket -1000 at 1 s grain (cast-truncation would say 0)."""
    from fenix_spark.operators.timeseries import bucketize

    df = spark.createDataFrame(
        [(-1,), (-1000,), (-1001,), (0,), (999,)], "ts bigint"
    )
    got = [
        r.bucket_ms
        for r in bucketize(df, "ts", 1000).orderBy("ts").collect()
    ]
    assert got == [-2000, -1000, -1000, 0, 0]


def test_robust_anomalies_planted_spikes(spark):
    """Planted spikes flag; the MAD baseline ignores them (a
    mean/stddev baseline with these magnitudes would inflate spread
    and mask the smaller spike — the reason MAD is the tool)."""
    import numpy as np

    from fenix_spark.operators.timeseries import robust_anomalies

    rng = np.random.default_rng(5)
    rows = []
    for b in range(200):
        rows.append(("s", b * 1000, float(50 + rng.normal(0, 2))))
    rows[40] = ("s", 40_000, 500.0)   # huge spike
    rows[120] = ("s", 120_000, 90.0)  # modest spike
    df = spark.createDataFrame(rows, "key string, ts_ms long, value double")
    out = {r["bucket_ms"]: r for r in robust_anomalies(
        df, "key", "ts_ms", "value", 1000, k=3.5
    ).collect()}
    assert len(out) == 200
    assert out[40_000]["anomaly"] and out[120_000]["anomaly"]
    flagged = [b for b, r in out.items() if r["anomaly"]]
    assert len(flagged) <= 5  # noise does not flag
    # numpy parity on center/spread/score
    vals = np.array([v for _, _, v in rows])
    med = float(np.median(vals))
    mad = float(np.median(np.abs(vals - med)))
    r = out[40_000]
    assert r["center"] == pytest.approx(med)
    assert r["spread"] == pytest.approx(1.4826 * mad)
    assert r["score"] == pytest.approx(abs(500.0 - med) / (1.4826 * mad))


def test_robust_anomalies_constant_series_semantics(spark):
    from fenix_spark.operators.timeseries import robust_anomalies

    rows = [("c", b * 10, 7.0) for b in range(50)] + [("c", 555, 8.0)]
    df = spark.createDataFrame(rows, "key string, ts_ms long, value double")
    out = {r["bucket_ms"]: r for r in robust_anomalies(
        df, "key", "ts_ms", "value", 10
    ).collect()}
    # constant points: null score, not flagged; the lone deviation
    # from a constant series scores infinite and flags
    assert out[0]["score"] is None and not out[0]["anomaly"]
    dev = out[550]
    assert dev["anomaly"] and dev["score"] == float("inf")


def test_robust_anomalies_duckdb_mirror(spark, sf_dir):
    """Full mirror on the real events table (per-type hourly sums)."""
    import duckdb

    from fenix_spark.operators.timeseries import robust_anomalies
    from fenix_spark.suite import events_table

    ev = events_table(spark, sf_dir).select("event_type", "ts_ms", "value")
    grain = 3_600_000
    got = {
        (r["key"], r["bucket_ms"]): (
            round(r["value"], 6), round(r["score"], 6) if r["score"] is not None else None, r["anomaly"]
        )
        for r in robust_anomalies(ev, "event_type", "ts_ms", "value", grain).collect()
    }
    con = duckdb.connect()
    want = {}
    for key, b, v, s, a in con.execute(f"""
        WITH buckets AS (
            SELECT event_type AS key,
                   (epoch_ms(ts) // {grain}) * {grain} AS bucket_ms,
                   sum(value) AS value
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY 1, 2
        ),
        med AS (SELECT key, median(value) AS center FROM buckets GROUP BY key),
        mad AS (SELECT b.key, median(abs(b.value - m.center)) AS mad
                FROM buckets b JOIN med m USING (key) GROUP BY b.key)
        SELECT b.key, b.bucket_ms, b.value,
               CASE WHEN mad.mad > 0
                    THEN abs(b.value - med.center) / (1.4826 * mad.mad)
                    WHEN abs(b.value - med.center) > 0 THEN 1e308 * 10
               END AS score,
               coalesce(CASE WHEN mad.mad > 0
                    THEN abs(b.value - med.center) / (1.4826 * mad.mad) > 3.5
                    WHEN abs(b.value - med.center) > 0 THEN TRUE END, FALSE) AS anomaly
        FROM buckets b JOIN med USING (key) JOIN mad USING (key)
    """).fetchall():
        want[(key, b)] = (round(v, 6), round(s, 6) if s is not None else None, a)
    assert got == want


# --------------------------------------------- decayed counts


def test_decayed_counts_numpy_parity_and_half_life(spark):
    import numpy as np

    from fenix_spark.operators.timeseries import decayed_counts

    hl = 3_600_000  # 1h
    t_ref = 100 * hl
    rows = [
        ("a", t_ref, 1.0),          # fresh: 1.0
        ("a", t_ref - hl, 1.0),     # one half-life: 0.5
        ("a", t_ref - 2 * hl, 4.0), # two half-lives, weight 4: 1.0
        ("b", t_ref - hl // 2, 2.0),
        ("b", None, 99.0),          # null ts excluded
    ]
    df = spark.createDataFrame(rows, "key string, ts_ms long, wt double")
    got = {
        r["key"]: r["w"]
        for r in decayed_counts(
            df, ["key"], "ts_ms", t_ref, hl, weight_col="wt"
        ).collect()
    }
    assert got["a"] == pytest.approx(1.0 + 0.5 + 1.0, rel=1e-12)
    assert got["b"] == pytest.approx(2.0 * 2 ** (-0.5), rel=1e-12)
    # numpy mirror over random data
    rng = np.random.default_rng(5)
    ts = (t_ref - rng.integers(0, 50 * hl, size=500)).tolist()
    df2 = spark.createDataFrame(
        [("k", int(t), 1.0) for t in ts], "key string, ts_ms long, wt double"
    )
    got2 = decayed_counts(df2, ["key"], "ts_ms", t_ref, hl).head()["w"]
    exp = float(np.sum(2.0 ** ((np.array(ts) - t_ref) / hl)))
    assert got2 == pytest.approx(exp, rel=1e-9)


def test_decayed_merge_and_shift_associativity(spark):
    from fenix_spark.operators.timeseries import (
        decayed_counts,
        decayed_merge,
        decayed_shift,
    )

    hl = 1_000
    t1, t2 = 50_000, 60_000
    rows = [(f"k{i % 3}", 40_000 + (i * 37) % 15_000) for i in range(900)]
    df = spark.createDataFrame(rows, "key string, ts_ms long")
    # shard → per-shard states at t1 → merge → shift to t2
    s_a = decayed_counts(df.where("ts_ms % 2 = 0"), ["key"], "ts_ms", t1, hl)
    s_b = decayed_counts(df.where("ts_ms % 2 = 1"), ["key"], "ts_ms", t1, hl)
    merged = decayed_merge(s_a.unionByName(s_b), ["key"])
    shifted = {
        r["key"]: r["w"]
        for r in decayed_shift(merged, t1, t2, hl).collect()
    }
    direct = {
        r["key"]: r["w"]
        for r in decayed_counts(df, ["key"], "ts_ms", t2, hl).collect()
    }
    assert set(shifted) == set(direct)
    for k in direct:
        assert shifted[k] == pytest.approx(direct[k], rel=1e-9), k


def test_decayed_trending_order_tracks_recency(spark):
    """'hot' has fewer but recent events; 'stale' many but old — the
    decayed rank puts hot first, the plain count the other way."""
    from fenix_spark.operators.timeseries import decayed_counts

    hl = 1_000
    now = 1_000_000
    rows = [("hot", now - i * 10) for i in range(50)] + [
        ("stale", now - 20 * hl - i * 10) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "key string, ts_ms long")
    got = {
        r["key"]: r["w"]
        for r in decayed_counts(df, ["key"], "ts_ms", now, hl).collect()
    }
    assert got["hot"] > got["stale"]
    plain = {
        r["key"]: r["c"]
        for r in df.groupBy("key").agg(F.count("*").alias("c")).collect()
    }
    assert plain["stale"] > plain["hot"]


def test_decayed_counts_duckdb_mirror(spark, tmp_path):
    import duckdb

    from fenix_spark.operators.timeseries import decayed_counts

    hl = 2_000
    t_ref = 500_000
    rows = [(f"k{i % 5}", t_ref - (i * 613) % 40_000) for i in range(1_000)]
    df = spark.createDataFrame(rows, "key string, ts_ms long")
    p = str(tmp_path / "dc.parquet")
    df.coalesce(1).write.parquet(p)
    got = sorted(
        (r["key"], round(r["w"], 9))
        for r in decayed_counts(df, ["key"], "ts_ms", t_ref, hl).collect()
    )
    exp = sorted(
        (k, round(w, 9))
        for k, w in duckdb.sql(
            f"""SELECT key, sum(pow(2.0, (ts_ms - {t_ref}) / {hl}.0)) AS w
                FROM read_parquet('{p}/*.parquet') GROUP BY key"""
        ).fetchall()
    )
    assert got == exp


# ---------------------------------------------------------------------------
# cusum


def _numpy_cusum(values, kappa, h):
    """The textbook sequential recursion — the closed form in the
    operator must reproduce it exactly."""
    import numpy as np

    v = np.asarray(values, dtype=float)
    center = np.median(v)
    sigma = 1.4826 * np.median(np.abs(v - center))
    z = (v - center) / sigma
    sp = sn = 0.0
    s_pos, s_neg = [], []
    for x in z:
        sp = max(0.0, sp + x - kappa)
        sn = max(0.0, sn - x - kappa)
        s_pos.append(sp)
        s_neg.append(sn)
    return s_pos, s_neg, [p > h or n > h for p, n in zip(s_pos, s_neg)]


def test_cusum_matches_textbook_recursion(spark):
    import numpy as np

    from fenix_spark.operators.timeseries import cusum

    rng = np.random.default_rng(5)
    vals = [float(v) for v in rng.normal(10, 2, size=80)]
    rows = [("k", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts bigint, v double")
    got = (
        cusum(df, "key", "ts", "v", 1000, kappa=0.5, h=4.0, agg="avg")
        .orderBy("bucket_ms")
        .collect()
    )
    s_pos, s_neg, alarm = _numpy_cusum(vals, 0.5, 4.0)
    assert len(got) == len(vals)
    for r, sp, sn, al in zip(got, s_pos, s_neg, alarm):
        assert abs(r.s_pos - sp) < 1e-9
        assert abs(r.s_neg - sn) < 1e-9
        assert r.alarm == al


def test_cusum_planted_mean_shift(spark):
    import numpy as np

    from fenix_spark.operators.timeseries import cusum

    rng = np.random.default_rng(9)
    pre = rng.normal(0, 1, size=60)
    post = rng.normal(2.5, 1, size=40)  # 2.5σ upward shift at t=60
    rows = [("k", i * 1000, float(v)) for i, v in enumerate([*pre, *post])]
    df = spark.createDataFrame(rows, "key string, ts bigint, v double")
    got = cusum(df, "key", "ts", "v", 1000, agg="avg").orderBy("bucket_ms").collect()
    alarms = [i for i, r in enumerate(got) if r.alarm]
    assert alarms, "shift never detected"
    assert min(alarms) >= 55, f"false alarm before the shift at {min(alarms)}"
    # the robust baseline is fit on the FULL series (40% post-shift
    # mass pulls the median up), so the effective shift is < 2.5σ and
    # detection needs a couple of dozen buckets of drift
    assert min(alarms) <= 90, f"detection too slow ({min(alarms)})"


def test_cusum_per_key_isolation_and_validation(spark):
    import pytest as _pytest

    from fenix_spark.operators.timeseries import cusum

    rows = [("a", i * 1000, float(i % 3)) for i in range(30)] + [
        ("b", i * 1000, 100.0 + (i % 2)) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "key string, ts bigint, v double")
    got = cusum(df, "key", "ts", "v", 1000, agg="avg")
    # b's level-100 values must not contaminate a's baseline
    assert not [r for r in got.collect() if r.alarm]
    with _pytest.raises(ValueError):
        cusum(df, "key", "ts", "v", 1000, h=0.0)


# ---------------------------------------------------------------------------
# seasonal_decompose


def _numpy_decompose(values, period):
    """statsmodels-style additive decomposition (centered MA trend,
    mean-by-phase seasonal) on a dense series."""
    import numpy as np

    v = np.asarray(values, dtype=float)
    n = len(v)
    half = period // 2
    trend = np.full(n, np.nan)
    if period % 2:
        for i in range(half, n - half):
            trend[i] = v[i - half : i + half + 1].mean()
    else:
        for i in range(half, n - half):
            w = v[i - half : i + half + 1]
            trend[i] = (w.sum() - (w[0] + w[-1]) / 2) / period
    detr = v - trend
    phase_mean = np.array(
        [np.nanmean(detr[p::period]) for p in range(period)]
    )
    seasonal_pat = phase_mean - phase_mean.mean()
    seasonal = np.array([seasonal_pat[i % period] for i in range(n)])
    return trend, seasonal, v - trend - seasonal


@pytest.mark.parametrize("period", [4, 7])
def test_seasonal_decompose_matches_numpy(spark, period):
    import numpy as np

    from fenix_spark.operators.timeseries import seasonal_decompose

    rng = np.random.default_rng(3)
    n = 10 * period
    t = np.arange(n)
    vals = 0.3 * t + 5 * np.sin(2 * np.pi * t / period) + rng.normal(0, 0.2, n)
    rows = [("k", int(i) * 1000, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts bigint, v double")
    got = (
        seasonal_decompose(df, "key", "ts", "v", 1000, period)
        .orderBy("bucket_ms")
        .collect()
    )
    trend, seasonal, resid = _numpy_decompose(vals, period)
    assert len(got) == n
    for i, r in enumerate(got):
        if np.isnan(trend[i]):
            assert r.trend is None and r.resid is None
        else:
            assert abs(r.trend - trend[i]) < 1e-9
            assert abs(r.seasonal - seasonal[i]) < 1e-9
            assert abs(r.resid - resid[i]) < 1e-9


def test_seasonal_decompose_recovers_planted_pattern(spark):
    import numpy as np

    from fenix_spark.operators.timeseries import seasonal_decompose

    # pure trend + weekly pattern, zero noise → resid ≈ 0 everywhere
    period, n = 7, 70
    pat = [3.0, -1.0, 0.5, 2.0, -2.5, -1.5, -0.5]
    vals = [0.1 * i + pat[i % period] for i in range(n)]
    rows = [("k", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts bigint, v double")
    got = seasonal_decompose(df, "key", "ts", "v", 1000, period).collect()
    mid = [r for r in got if r.resid is not None]
    assert len(mid) == n - (period // 2) * 2
    assert all(abs(r.resid) < 1e-9 for r in mid)


def test_seasonal_decompose_densifies_gaps(spark):
    from fenix_spark.operators.timeseries import seasonal_decompose

    # drop one interior bucket: later rows must keep their TRUE phase
    period = 4
    vals = {i: float(i % period) for i in range(24)}
    del vals[9]
    rows = [("k", i * 1000, v) for i, v in vals.items()]
    df = spark.createDataFrame(rows, "key string, ts bigint, v double")
    got = {
        r.bucket_ms // 1000: r
        for r in seasonal_decompose(df, "key", "ts", "v", 1000, period).collect()
    }
    assert 9 in got  # the gap was densified, not dropped
    # with an exact repeating pattern the interpolated gap is exact too
    interior = [r for i, r in got.items() if r.resid is not None]
    assert interior and all(abs(r.resid) < 1e-9 for r in interior)


# ---------------------------------------------------------------------------
# cohort_retention


def _py_retention(events, grain):
    """{(cohort, age): active} mirror over (user, ts) pairs."""
    ub = {(u, (t // grain) * grain) for u, t in events}
    first = {}
    for u, b in ub:
        first[u] = min(first.get(u, b), b)
    out = {}
    for u, b in ub:
        key = (first[u], (b - first[u]) // grain)
        out[key] = out.get(key, 0) + 1
    return out


def test_cohort_retention_matches_python_mirror(spark):
    import numpy as np

    from fenix_spark.operators.timeseries import cohort_retention

    rng = np.random.default_rng(17)
    events = [
        (int(rng.integers(0, 40)), int(rng.integers(0, 10_000)))
        for _ in range(2_000)
    ]
    df = spark.createDataFrame(events, "user_id bigint, ts bigint")
    got = {
        (r.cohort_ms, r.age): (r.active_users, r.cohort_size)
        for r in cohort_retention(df, "user_id", "ts", 1000).collect()
    }
    want = _py_retention(events, 1000)
    assert set(got) == set(want)
    for (c, a), active in want.items():
        assert got[(c, a)][0] == active
        assert got[(c, a)][1] == want[(c, 0)]


def test_cohort_retention_semantics(spark):
    from fenix_spark.operators.timeseries import cohort_retention

    # cohort A (bucket 0): u1 active at ages 0,1,2 ; u2 at 0,2 ;
    # cohort B (bucket 1000): u3 at 0 only
    rows = [
        (1, 10), (1, 1010), (1, 2010),
        (2, 20), (2, 2020), (2, 25),  # duplicate in-bucket events collapse
        (3, 1500),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint")
    got = {
        (r.cohort_ms, r.age): r
        for r in cohort_retention(df, "user_id", "ts", 1000).collect()
    }
    assert got[(0, 0)].active_users == 2 and got[(0, 0)].retention == 1.0
    assert got[(0, 1)].active_users == 1 and got[(0, 1)].retention == 0.5
    assert got[(0, 2)].active_users == 2
    assert got[(1000, 0)].active_users == 1
    assert (1000, 1) not in got
    # max_age truncation
    trunc = cohort_retention(df, "user_id", "ts", 1000, max_age=1)
    assert max(r.age for r in trunc.collect()) == 1


def test_cohort_retention_duckdb_mirror_on_events(spark, sf_dir):
    import duckdb

    from fenix_spark.operators.timeseries import cohort_retention
    from fenix_spark.suite import events_table

    ev = events_table(spark, sf_dir)
    got = sorted(
        (r.cohort_ms, r.age, r.active_users, r.cohort_size)
        for r in cohort_retention(ev, "user_id", "ts_ms", 86_400_000).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            WITH ub AS (
              SELECT DISTINCT user_id,
                     floor(epoch_ms(ts) / 86400000)::BIGINT * 86400000 AS b
              FROM events
            ),
            aged AS (
              SELECT min(b) OVER (PARTITION BY user_id) AS cohort_ms,
                     (b - min(b) OVER (PARTITION BY user_id)) / 86400000 AS age
              FROM ub
            ),
            active AS (
              SELECT cohort_ms, age::BIGINT AS age, count(*) AS active
              FROM aged GROUP BY 1, 2
            )
            SELECT a.cohort_ms, a.age, a.active, s.active AS cohort_size
            FROM active a JOIN active s
              ON a.cohort_ms = s.cohort_ms AND s.age = 0
            """
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# ohlc / twap / counter_rate


def test_ohlc_hand_computed_and_duckdb(spark, sf_dir):
    import duckdb

    from fenix_spark.operators.timeseries import ohlc
    from fenix_spark.suite import events_table

    rows = [
        ("k", 100, 5.0), ("k", 900, 2.0), ("k", 500, 9.0),  # bucket 0
        ("k", 1100, 4.0),                                    # bucket 1000
    ]
    df = spark.createDataFrame(rows, "key string, ts bigint, v double")
    got = {r.bucket_ms: r for r in ohlc(df, "key", "ts", "v", 1000).collect()}
    assert (got[0].open, got[0].high, got[0].low, got[0].close, got[0].n) == (
        5.0, 9.0, 2.0, 2.0, 3,
    )
    assert got[1000].open == got[1000].close == 4.0

    ev = events_table(spark, sf_dir)
    grain = 3_600_000
    got_all = sorted(
        (r.key, r.bucket_ms, r.open, r.high, r.low, r.close, r.n)
        for r in ohlc(ev, "event_type", "ts_ms", "value", grain).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH b AS (
              SELECT event_type AS key,
                     (epoch_ms(ts) // {grain}) * {grain} AS b,
                     epoch_ms(ts) AS t, value
              FROM events
            ),
            r AS (
              SELECT *,
                row_number() OVER (PARTITION BY key, b ORDER BY t, value) AS ra,
                row_number() OVER (PARTITION BY key, b ORDER BY t DESC, value DESC) AS rd
              FROM b
            )
            SELECT key, b,
                   max(CASE WHEN ra = 1 THEN value END) AS open,
                   max(value) AS high, min(value) AS low,
                   max(CASE WHEN rd = 1 THEN value END) AS close,
                   count(value) AS n
            FROM r GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got_all == want


def test_twap_step_semantics(spark):
    from fenix_spark.operators.timeseries import twap

    # value 10 held 0→900 (w 900), 20 held 900→1000 (w 100):
    # twap = (10*900 + 20*100) / 1000 = 11; plain avg would say 15
    rows = [("k", 0, 10.0), ("k", 900, 20.0)]
    df = spark.createDataFrame(rows, "key string, ts bigint, v double")
    [r] = twap(df, "key", "ts", "v", 1000).collect()
    assert r.twap == pytest.approx(11.0)

    # python mirror on a random irregular series
    import numpy as np

    rng = np.random.default_rng(8)
    ts = sorted(int(t) for t in rng.choice(10_000, size=60, replace=False))
    vals = [float(v) for v in rng.normal(50, 10, size=60)]
    df = spark.createDataFrame(
        [("k", t, v) for t, v in zip(ts, vals)], "key string, ts bigint, v double"
    )
    got = {r.bucket_ms: r.twap for r in twap(df, "key", "ts", "v", 1000).collect()}
    per_bucket = {}
    for t, v in zip(ts, vals):
        per_bucket.setdefault((t // 1000) * 1000, []).append((t, v))
    for b, obs in per_bucket.items():
        obs.sort()
        num = den = 0.0
        for i, (t, v) in enumerate(obs):
            w = (obs[i + 1][0] if i + 1 < len(obs) else b + 1000) - t
            num, den = num + v * w, den + w
        assert got[b] == pytest.approx(num / den), b


def test_counter_rate_resets_and_rates(spark):
    from fenix_spark.operators.timeseries import counter_rate

    rows = [
        ("k", 0, 100.0),
        ("k", 1000, 150.0),   # +50 over 1s → 50/s
        ("k", 3000, 30.0),    # RESET: delta = raw 30 over 2s → 15/s
        ("k", 4000, 31.0),
        ("j", 500, 7.0),      # other key isolated; first sample null
    ]
    df = spark.createDataFrame(rows, "key string, ts bigint, v double")
    got = {(r.key, r.ts): r for r in counter_rate(df, "key", "ts", "v").collect()}
    assert got[("k", 0)].delta is None and got[("k", 0)].rate_per_sec is None
    assert got[("k", 1000)].delta == 50.0
    assert got[("k", 1000)].rate_per_sec == pytest.approx(50.0)
    assert got[("k", 3000)].delta == 30.0  # reset, never negative
    assert got[("k", 3000)].rate_per_sec == pytest.approx(15.0)
    assert got[("k", 4000)].delta == 1.0
    assert got[("j", 500)].delta is None
    assert all(r.delta is None or r.delta >= 0 for r in got.values())


def test_seasonal_anomalies_flags_phase_aware(spark):
    import numpy as np

    from fenix_spark.operators.timeseries import (
        robust_anomalies,
        seasonal_anomalies,
    )

    # weekly ramp pattern + one anomaly that is WILD for its phase but
    # mid-range globally: raw robust_anomalies must miss it (it sits
    # inside the corpus-wide MAD band), the seasonally-adjusted
    # detector must catch it
    period, nweeks = 7, 30
    pat = [0.0, 5.0, 10.0, 15.0, 20.0, 25.0, 30.0]
    rng = np.random.default_rng(6)
    rows = []
    for i in range(period * nweeks):
        v = pat[i % period] + float(rng.normal(0, 0.2))
        rows.append(("k", i * 1000, v))
    # anomaly: a phase-0 bucket (usual ≈ 0) reading 15 — the global
    # median, invisible without deseasonalizing
    anom_i = period * 10
    rows[anom_i] = ("k", anom_i * 1000, 15.0)
    df = spark.createDataFrame(rows, "key string, ts bigint, v double")

    raw = {r["bucket_ms"]: r for r in robust_anomalies(
        df, "key", "ts", "v", 1000, k=3.5, agg="avg"
    ).collect()}
    assert not raw[anom_i * 1000]["anomaly"]  # masked by the weekly swing

    adj = {r["bucket_ms"]: r for r in seasonal_anomalies(
        df, "key", "ts", "v", 1000, period, k=3.5
    ).collect()}
    assert adj[anom_i * 1000]["anomaly"]
    flagged = [b for b, r in adj.items() if r["anomaly"]]
    # the centered-MA trend smears the anomaly into its half-window
    # neighbors (inherent to MA decomposition) — every flag must stay
    # local to the planted bucket, nothing elsewhere
    assert all(
        abs(b - anom_i * 1000) <= period * 1000 for b in flagged
    ), flagged
    # edge half-windows: undefined resid → null score, never flagged
    assert adj[0]["resid"] is None and not adj[0]["anomaly"]
