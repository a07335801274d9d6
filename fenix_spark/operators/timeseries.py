"""Time-series gap fill + interpolation — the hypertable-style
operator family around multi-grain rollups (the ``time_rollup``
pattern, oracle-checked through r8 and still DuckDB-mirrored in
tests/test_events_ts.py): regularize an
irregular event stream onto a fixed grid, materialize MISSING buckets,
and fill them (TimescaleDB's ``time_bucket_gapfill`` + ``locf`` /
``interpolate``, rebuilt relationally).

Scale shape:

- Bucketing is a scan-local projection (integer division).
- The dense grid is generated PER KEY from that key's own [min, max]
  bucket span — ``sequence`` + ``explode``, map-side after one small
  per-key extent aggregation; no global calendar table, no cross join.
- Fill is a window function per key ordered by bucket: LOCF is
  ``last(value, ignorenulls)``; linear interpolation brackets each gap
  with the previous/next real observation via the same window frames.
  One shuffle total (by key), which the grid generation already paid.

Grid density is the user's contract: a key spanning years at
millisecond grain explodes — ``max_buckets_per_key`` errors loudly
instead of silently OOMing a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy


def bucketize(
    df: DataFrame, ts_col: str, grain_ms: int, out_col: str = "bucket_ms"
) -> DataFrame:
    """Floor ``ts_col`` (epoch millis) onto the ``grain_ms`` grid.
    True FLOOR, not cast-truncation: a pre-1970 (negative) timestamp
    must land in the bucket at-or-below it (-1 ms → bucket -grain),
    where truncation would shift it up a whole bucket."""
    return df.withColumn(
        out_col,
        F.floor(F.col(ts_col) / F.lit(grain_ms)).cast("bigint") * F.lit(grain_ms),
    )


def gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    grain_ms: int,
    agg: str = "avg",
    fill: str = "none",
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """(key, bucket_ms, value, filled) on the DENSE per-key grid.

    1. aggregate observations per (key, bucket) with ``agg``
       (avg/sum/min/max/count);
    2. explode each key's full bucket range — every missing bucket
       becomes a row with null value and ``filled = true``;
    3. ``fill``: 'none' (leave nulls), 'locf' (last observation
       carried forward; leading nulls stay null), 'linear'
       (interpolate between the bracketing real observations; nulls
       before the first / after the last observation stay null —
       Timescale's semantics), 'zero' (coalesce 0).
    """
    if agg not in ("avg", "sum", "min", "max", "count"):
        raise ValueError(f"unsupported agg {agg!r}")
    if fill not in ("none", "locf", "linear", "zero"):
        raise ValueError(f"unsupported fill {fill!r}")

    agg_fn = {
        "avg": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(c).cast("double"),
    }[agg]
    sparse = (
        bucketize(df, ts_col, grain_ms)
        .groupBy(F.col(key_col).alias("key"), "bucket_ms")
        .agg(agg_fn(F.col(value_col)).alias("value"))
        # three consumers (extent probe, grid, dense join): materialize
        # the aggregation once instead of re-scanning the source
        .transform(_ckpt_lazy)
    )

    extent = sparse.groupBy("key").agg(
        F.min("bucket_ms").alias("lo"), F.max("bucket_ms").alias("hi")
    )
    n_buckets = (F.col("hi") - F.col("lo")) / grain_ms + 1
    over = extent.where(n_buckets > max_buckets_per_key)
    if over.head(1):
        raise ValueError(
            f"gapfill would emit > max_buckets_per_key={max_buckets_per_key} "
            "buckets for at least one key — coarsen grain_ms or raise the cap"
        )
    grid = extent.select(
        "key",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(grain_ms))
        ).alias("bucket_ms"),
    )
    dense = grid.join(sparse, ["key", "bucket_ms"], "left").withColumn(
        "filled", F.col("value").isNull()
    )

    if fill == "zero":
        return dense.withColumn("value", F.coalesce("value", F.lit(0.0)))
    if fill == "none":
        return dense

    w = Window.partitionBy("key").orderBy("bucket_ms")
    prev_val = F.last("value", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    if fill == "locf":
        return dense.withColumn("value", prev_val)

    # linear: bracket each gap with the previous/next real observation
    next_val = F.first("value", ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )
    prev_ts = F.last(
        F.when(F.col("value").isNotNull(), F.col("bucket_ms")), ignorenulls=True
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    next_ts = F.first(
        F.when(F.col("value").isNotNull(), F.col("bucket_ms")), ignorenulls=True
    ).over(w.rowsBetween(0, Window.unboundedFollowing))
    frac = (F.col("bucket_ms") - prev_ts) / (next_ts - prev_ts)
    interp = prev_val + (next_val - prev_val) * frac
    return dense.withColumn(
        "value",
        F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
            F.when(prev_ts.isNotNull() & next_ts.isNotNull(), interp)
        ),
    )


def robust_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    grain_ms: int,
    k: float = 3.5,
    agg: str = "sum",
) -> DataFrame:
    """(key, bucket_ms, value, center, spread, score, anomaly) —
    robust outlier detection per series: bucket the stream
    (``bucketize`` + ``agg``), then score each bucket against its
    key's MEDIAN and MAD (median absolute deviation), the standard
    outlier-resistant center/spread — a mean/stddev baseline is
    dragged by the very spikes it should flag. ``score`` is the
    robust z-score |x − median| / (1.4826·MAD) (the 1.4826 constant
    makes MAD consistent with σ under normality); ``anomaly`` is
    ``score > k`` (k=3.5 is the conventional Iglewicz–Hoaglin cut).

    Scale shape: two per-key aggregations over BUCKET rows (grid-
    sized, not event-sized — the groupBy(key, bucket) already
    collapsed the stream): one for the median, one for the MAD after
    a broadcast-joinable (key, median) frame attaches. Spark's exact
    ``percentile`` sorts per group — fine at bucket granularity (a
    year of minute buckets is 525k rows/key); for keys whose BUCKET
    count itself is huge, coarsen the grain or swap in a KLL quantile
    (operators/sketches.py) — stated, not silent.

    A constant series has MAD 0: its score is null (0/0) and
    ``anomaly`` false for on-median points — any deviation from a
    constant series scores infinite and flags, which is the wanted
    semantics (document-count series that flatline then jump)."""
    if agg not in ("avg", "sum", "min", "max", "count"):
        raise ValueError(f"unsupported agg {agg!r}")
    agg_fn = {
        "avg": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(c).cast("double"),
    }[agg]
    buckets = (
        bucketize(df, ts_col, grain_ms)
        .groupBy(F.col(key_col).alias("key"), "bucket_ms")
        .agg(agg_fn(F.col(value_col)).alias("value"))
        .transform(_ckpt_lazy)
    )
    med = buckets.groupBy("key").agg(
        F.expr("percentile(value, 0.5)").alias("center")
    )
    with_med = buckets.join(F.broadcast(med), "key")
    mad = with_med.groupBy("key").agg(
        F.expr("percentile(abs(value - center), 0.5)").alias("mad")
    )
    scored = with_med.join(F.broadcast(mad), "key").withColumn(
        "spread", F.col("mad") * F.lit(1.4826)
    )
    dev = F.abs(F.col("value") - F.col("center"))
    score = F.when(F.col("spread") > 0, dev / F.col("spread")).otherwise(
        F.when(dev > 0, F.lit(float("inf")))
    )
    return scored.select(
        "key",
        "bucket_ms",
        "value",
        "center",
        "spread",
        score.alias("score"),
        F.coalesce(score > F.lit(float(k)), F.lit(False)).alias("anomaly"),
    )


# ------------------------------------------- exponentially-decayed counts


def decayed_counts(
    df: DataFrame,
    keys: "Sequence[str]",
    ts_ms_col: str,
    t_ref_ms: int,
    half_life_ms: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Half-life-decayed mass per key, EXACT and mergeable — the
    trending-score summary (an event ``half_life_ms`` old counts 0.5,
    two half-lives 0.25, …):

        w(key) = Σ_events weight · 2^((ts − t_ref) / half_life)

    Output: (keys..., w double) anchored at ``t_ref_ms``. One groupBy
    with a map-side partial sum of scan-local exponentials — no
    window, no sort, cost identical to a plain count. States at the
    SAME anchor merge by plain sum (linearity, pinned); re-anchor with
    ``decayed_shift``. Unlike sliding-window counts, the state is one
    row per key with NO event retention, and ranking by ``w`` is the
    classic recency-weighted trending order (Cormode, Shkapenyuk,
    Srivastava, Xu, ICDE 2009 forward-decay form, base 2).

    Events far older than the anchor underflow to 0.0 mass (they are
    dead by construction); events more than ~1000 half-lives NEWER
    than the anchor would overflow double — anchor at or after the
    data's max timestamp (the natural "now")."""
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    decay = F.pow(
        F.lit(2.0),
        (F.col(ts_ms_col).cast("double") - F.lit(float(t_ref_ms)))
        / F.lit(float(half_life_ms)),
    )
    return (
        df.where(F.col(ts_ms_col).isNotNull())
        .groupBy(*keys)
        .agg(F.sum(w * decay).alias("w"))
    )


def decayed_shift(
    state: DataFrame,
    t_ref_old_ms: int,
    t_ref_new_ms: int,
    half_life_ms: int,
) -> DataFrame:
    """Re-anchor a decayed-counts state to a new reference time:
    w' = w · 2^((old − new) / half_life). Summary-sized, exact —
    shift-then-merge equals building directly at the new anchor
    (associativity pinned in tests)."""
    factor = 2.0 ** ((t_ref_old_ms - t_ref_new_ms) / half_life_ms)
    return state.withColumn("w", F.col("w") * F.lit(float(factor)))


def decayed_merge(states: DataFrame, keys: "Sequence[str]") -> DataFrame:
    """Sum unioned same-anchor states to the coarser ``keys`` grain."""
    return states.groupBy(*keys).agg(F.sum("w").alias("w"))


def cusum(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    grain_ms: int,
    kappa: float = 0.5,
    h: float = 5.0,
    agg: str = "sum",
) -> DataFrame:
    """(key, bucket_ms, value, s_pos, s_neg, alarm) — two-sided CUSUM
    mean-shift detection per series (Page, Biometrika 1954), the
    standard sequential changepoint monitor: ``s_pos`` accumulates
    evidence of an upward mean shift, ``s_neg`` downward, and
    ``alarm`` fires when either exceeds the decision band.

    ``kappa`` (slack) and ``h`` (band) are in units of the series'
    ROBUST σ (1.4826·MAD about the median — an in-window mean shift
    must not inflate its own baseline); the classical tuning κ=0.5σ,
    h=5σ detects a 1σ shift with ~constant false-alarm rate.

    Scale shape: the textbook recursion ``s⁺_t = max(0, s⁺_{t−1} +
    z_t − κ)`` looks inherently sequential, but it has the running-
    extremum closed form  s⁺_t = C_t − min_{j≤t} C_j  with
    C_t = Σ_{i≤t}(z_i − κ), C_0 = 0 — a per-key cumulative sum and a
    per-key running minimum, BOTH native window aggregates over
    bucket rows (grid-sized, not event-sized). No UDF, no recursion,
    no driver loop; the numpy recursion-vs-closed-form parity is
    pinned in tests. Monitoring semantics: the statistic is NOT reset
    after an alarm (resetting re-introduces the sequential
    dependency); downstream consumers read the first alarm per key as
    the changepoint signal.
    """
    if h <= 0 or kappa < 0:
        raise ValueError(f"need h > 0 and kappa ≥ 0 (got h={h}, kappa={kappa})")
    agg_fn = {
        "avg": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(c).cast("double"),
    }
    if agg not in agg_fn:
        raise ValueError(f"unsupported agg {agg!r}")
    buckets = (
        bucketize(df, ts_col, grain_ms)
        .groupBy(F.col(key_col).alias("key"), "bucket_ms")
        .agg(agg_fn[agg](F.col(value_col)).alias("value"))
        .transform(_ckpt_lazy)
    )
    med = buckets.groupBy("key").agg(
        F.expr("percentile(value, 0.5)").alias("center")
    )
    spread = (
        buckets.join(med, "key")
        .groupBy("key")
        .agg(
            F.first("center").alias("center"),
            (
                F.expr("percentile(abs(value - center), 0.5)") * 1.4826
            ).alias("sigma"),
        )
    )
    w = Window.partitionBy("key").orderBy("bucket_ms")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    z = (F.col("value") - F.col("center")) / F.col("sigma")
    scored = (
        buckets.join(spread, "key")
        # constant series: MAD = 0 → z undefined; any deviation is an
        # immediate alarm, matching the σ→0 limit
        .withColumn(
            "z",
            F.when(F.col("sigma") > 0, z).otherwise(
                F.when(F.col("value") == F.col("center"), 0.0).otherwise(
                    F.lit(float("inf"))
                    * F.signum(F.col("value") - F.col("center"))
                )
            ),
        )
        .withColumn("c_pos", F.sum(F.col("z") - F.lit(kappa)).over(run))
        .withColumn("c_neg", F.sum(-F.col("z") - F.lit(kappa)).over(run))
        .withColumn(
            "s_pos", F.col("c_pos") - F.least(F.lit(0.0), F.min("c_pos").over(run))
        )
        .withColumn(
            "s_neg", F.col("c_neg") - F.least(F.lit(0.0), F.min("c_neg").over(run))
        )
    )
    return scored.select(
        "key",
        "bucket_ms",
        "value",
        "s_pos",
        "s_neg",
        ((F.col("s_pos") > h) | (F.col("s_neg") > h)).alias("alarm"),
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    grain_ms: int,
    period: int,
    agg: str = "avg",
) -> DataFrame:
    """(key, bucket_ms, value, trend, seasonal, resid) — classical
    additive decomposition per series (the moving-average method of
    Macaulay 1931, as in statsmodels' ``seasonal_decompose``):
    ``value = trend + seasonal + resid``.

    * trend: centered moving average of one ``period`` — for even
      periods the standard 2×P average (half-weight endpoints) so the
      window stays centered; null where the full window is absent
      (the first/last ⌊P/2⌋ buckets, statsmodels semantics).
    * seasonal: per-phase mean of the detrended series (phase =
      bucket index mod P), centered so one period sums to ~0.
    * resid: the remainder, null wherever trend is.

    The series is densified on the ``grain_ms`` grid first (linear
    interpolation in gaps — a missing bucket must not slide every
    later observation one phase back); interior interpolated rows are
    decomposed like real ones, leading/trailing unfillable edges stay
    null through all three components.

    Scale shape: one per-key window pass for the trend (bucket rows,
    grid-sized), one (key, phase) aggregation — P rows per key —
    joined back keyed, and the phase means are partial-aggregable.
    All native expressions.
    """
    if period < 2:
        raise ValueError(f"period must be ≥ 2 buckets (got {period})")
    dense = gapfill(
        df, key_col, ts_col, value_col, grain_ms, agg=agg, fill="linear"
    ).transform(_ckpt_lazy)
    w = Window.partitionBy("key").orderBy("bucket_ms")
    half = period // 2
    if period % 2:
        frame = w.rowsBetween(-half, half)
        need = period
        trend = F.when(
            F.count("value").over(frame) == need, F.avg("value").over(frame)
        )
    else:
        # 2×P MA: full weight on the P−1 interior lags, half on ±P/2
        frame = w.rowsBetween(-half, half)
        need = period + 1
        s = F.sum("value").over(frame)
        ends = (
            F.first("value").over(frame) + F.last("value").over(frame)
        )
        trend = F.when(
            F.count("value").over(frame) == need,
            (s - ends / 2) / period,
        )
    t = dense.withColumn("trend", trend).withColumn(
        "phase",
        F.pmod((F.col("bucket_ms") / grain_ms).cast("bigint"), F.lit(period)),
    )
    t = t.transform(_ckpt_lazy)
    phase_means = (
        t.withColumn("detr", F.col("value") - F.col("trend"))
        .groupBy("key", "phase")
        .agg(F.avg("detr").alias("phase_mean"))
    )
    centered = phase_means.withColumn(
        "seasonal",
        F.col("phase_mean")
        - F.avg("phase_mean").over(Window.partitionBy("key")),
    ).select("key", "phase", "seasonal")
    return (
        t.join(centered, ["key", "phase"], "left")
        .select(
            "key",
            "bucket_ms",
            "value",
            "trend",
            F.when(F.col("trend").isNotNull(), F.col("seasonal")).alias(
                "seasonal"
            ),
            (F.col("value") - F.col("trend") - F.col("seasonal")).alias("resid"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    grain_ms: int,
    max_age: int | None = None,
) -> DataFrame:
    """(cohort_ms, age, active_users, cohort_size, retention) — the
    classic cohort-retention triangle: users are cohorted by the
    ``grain_ms`` bucket of their FIRST event, and each later bucket in
    which they appear marks them active at ``age`` = buckets since
    their cohort. ``retention`` = active_users / cohort_size; age 0 is
    1.0 by construction (every user is active in their first bucket).

    ``max_age`` truncates the triangle (e.g. 12 for a 12-week view);
    None keeps every observed age.

    Scale shape: ONE distinct over (user, bucket) — event-count →
    user-bucket-count collapse, partial-aggregable — then a min-bucket
    window per user REUSING the same hash partitioning (no second
    shuffle of the events), a (cohort, age) count aggregation of the
    collapsed rows, and a broadcast-sized cohort-size join. Nothing is
    ever keyed on the raw event stream twice.
    """
    if max_age is not None and max_age < 0:
        raise ValueError(f"max_age must be ≥ 0 (got {max_age})")
    ub = (
        bucketize(df, ts_col, grain_ms)
        .select(F.col(user_col).alias("user"), "bucket_ms")
        .distinct()
    )
    w = Window.partitionBy("user")
    aged = ub.withColumn("cohort_ms", F.min("bucket_ms").over(w)).select(
        "cohort_ms",
        ((F.col("bucket_ms") - F.col("cohort_ms")) / grain_ms)
        .cast("bigint")
        .alias("age"),
        "user",
    )
    if max_age is not None:
        aged = aged.where(F.col("age") <= max_age)
    active = aged.groupBy("cohort_ms", "age").agg(
        F.count(F.lit(1)).alias("active_users")
    )
    sizes = active.where(F.col("age") == 0).select(
        "cohort_ms", F.col("active_users").alias("cohort_size")
    )
    return (
        active.join(F.broadcast(sizes), "cohort_ms")
        .select(
            "cohort_ms",
            "age",
            "active_users",
            "cohort_size",
            (F.col("active_users") / F.col("cohort_size")).alias("retention"),
        )
    )


def ohlc(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    grain_ms: int,
) -> DataFrame:
    """(key, bucket_ms, open, high, low, close, n) — candlestick
    rollup: first/last by event time (min_by/max_by — hash aggregates,
    no per-bucket sort) and min/max per bucket. Ties on the exact same
    timestamp break by value (min for open, max for close) so the
    result is deterministic and oracle-checkable."""
    b = bucketize(df, ts_col, grain_ms)
    v, t = F.col(value_col), F.col(ts_col)
    return b.groupBy(F.col(key_col).alias("key"), "bucket_ms").agg(
        F.min_by(v, F.struct(t.alias("t"), v.alias("v"))).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, F.struct(t.alias("t"), v.alias("v"))).alias("close"),
        F.count(v).alias("n"),
    )


def twap(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    grain_ms: int,
) -> DataFrame:
    """(key, bucket_ms, twap, n) — TIME-weighted average per bucket
    under step (last-observation-holds) semantics, the irregular-
    sampling correction a plain ``avg`` gets wrong: a value held for
    59 s must outweigh one held for 1 s regardless of how many samples
    each produced.

    Each observation is weighted by the time until the next
    observation in the SAME bucket (the last one holds to the bucket
    edge); an observation's weight never crosses its bucket, so the
    rollup stays a per-bucket aggregate. One per-key lead window over
    event rows + one hash aggregate; same-timestamp duplicates get
    zero weight except the last (deterministic value tiebreak on the
    ordering)."""
    b = bucketize(df, ts_col, grain_ms).select(
        F.col(key_col).alias("key"),
        "bucket_ms",
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("v"),
    )
    w = Window.partitionBy("key", "bucket_ms").orderBy(
        F.asc("ts"), F.asc("v")
    )
    nxt = F.lead("ts").over(w)
    weight = (
        F.coalesce(nxt, F.col("bucket_ms") + F.lit(grain_ms)) - F.col("ts")
    ).cast("double")
    return (
        b.withColumn("w", weight)
        .groupBy("key", "bucket_ms")
        .agg(
            (F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("twap"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def counter_rate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """(key, ts, value, delta, rate_per_sec) — per-sample increase of
    a MONOTONIC counter (PromQL ``rate()`` semantics for resets): a
    decrease means the counter restarted, so the post-reset increase
    is the raw value itself, never a negative delta. First sample per
    key has null delta/rate (nothing to diff against). One per-key
    lag window over (ts, value) rows; ``rate_per_sec`` divides by the
    elapsed ms × 1000 (same-timestamp duplicates yield null rate, not
    a division by zero)."""
    w = Window.partitionBy("key").orderBy(F.asc("ts"), F.asc("value"))
    b = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    prev_v = F.lag("value").over(w)
    prev_t = F.lag("ts").over(w)
    delta = F.when(F.col("value") >= prev_v, F.col("value") - prev_v).otherwise(
        F.col("value")  # reset: counter restarted from ~0
    )
    dt = F.col("ts") - prev_t
    return b.select(
        "key",
        "ts",
        "value",
        F.when(prev_v.isNotNull(), delta).alias("delta"),
        F.when(
            prev_v.isNotNull() & (dt > 0),
            F.when(F.col("value") >= prev_v, F.col("value") - prev_v).otherwise(
                F.col("value")
            )
            / (dt / 1000.0),
        ).alias("rate_per_sec"),
    )


def seasonal_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    grain_ms: int,
    period: int,
    k: float = 3.5,
    agg: str = "avg",
) -> DataFrame:
    """(key, bucket_ms, value, resid, center, spread, score, anomaly)
    — anomalies scored on the seasonally-adjusted RESIDUAL: a Monday
    peak is normal for a weekly series, so :func:`robust_anomalies`
    on raw values either misses weekday-sized anomalies or flags every
    Monday; removing trend+seasonal first (:func:`seasonal_decompose`)
    scores each bucket against what THIS phase usually looks like.
    Rows where the decomposition is undefined (the edge half-windows)
    carry null resid/score and are never flagged.

    Composition of two proven operators — one decomposition pass plus
    a median/MAD aggregate over residual rows (grid-sized)."""
    dec = seasonal_decompose(
        df, key_col, ts_col, value_col, grain_ms, period, agg
    ).transform(_ckpt_lazy)
    med = dec.where(F.col("resid").isNotNull()).groupBy("key").agg(
        F.expr("percentile(resid, 0.5)").alias("center")
    )
    spread = (
        dec.where(F.col("resid").isNotNull())
        .join(med, "key")
        .groupBy("key")
        .agg(
            F.first("center").alias("center"),
            (F.expr("percentile(abs(resid - center), 0.5)") * 1.4826).alias(
                "spread"
            ),
        )
    )
    z = F.abs(F.col("resid") - F.col("center")) / F.col("spread")
    scored = dec.join(F.broadcast(spread), "key", "left").withColumn(
        "score",
        F.when(
            F.col("resid").isNotNull() & (F.col("spread") > 0), z
        ).otherwise(
            F.when(
                F.col("resid").isNotNull()
                & (F.col("spread") == 0)
                & (F.col("resid") != F.col("center")),
                F.lit(float("inf")),
            )
        ),
    )
    return scored.select(
        "key",
        "bucket_ms",
        "value",
        "resid",
        "center",
        "spread",
        "score",
        F.coalesce(F.col("score") > k, F.lit(False)).alias("anomaly"),
    )
