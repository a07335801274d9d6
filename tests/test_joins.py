"""Temporal / inequality join semantics (operators/joins.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fenix_spark.operators.joins import asof_join, range_join, range_join_bucketed


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 25, 2), ("A", 5, 3), ("B", 10, 4), ("C", 10, 5)],
        "sym string, ts bigint, trade_id bigint",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 100.0), ("A", 10, 101.0), ("A", 20, 102.0), ("B", 11, 200.0)],
        "sym string, ts bigint, px double",
    )
    return trades, quotes


def test_asof_backward_match(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, "sym", "ts", "ts", ["px"])
    got = {r["trade_id"]: (r["right_px"], r["right_ts"]) for r in out.collect()}
    assert got[1] == (101.0, 10)  # tie at ts=10 matches (backward-inclusive)
    assert got[2] == (102.0, 20)  # most recent prior, not first
    assert got[3] == (None, None)  # nothing at-or-before ts=5
    assert got[4] == (None, None)  # B's only quote is later
    assert got[5] == (None, None)  # no quotes for C at all


def test_asof_preserves_left_rows(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, "sym", "ts", "ts", ["px"])
    assert out.count() == trades.count()
    assert set(trades.columns).issubset(set(out.columns))


def test_asof_tolerance(spark):
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, "sym", "ts", "ts", ["px"], tolerance=2)
    got = {r["trade_id"]: r["right_px"] for r in out.collect()}
    assert got[1] == 101.0  # gap 0 ≤ 2
    assert got[2] is None  # gap 5 > 2 → nulled


def test_asof_null_payload_is_not_overwritten(spark):
    """A matched right row whose payload is genuinely NULL must yield
    NULL — not an older row's value carried forward (pandas merge_asof
    / DuckDB ASOF semantics; ADVICE r01). The struct-carry makes the
    match all-or-nothing from a single right row."""
    trades = spark.createDataFrame([(1, "A", 30)], "trade_id int, sym string, ts int")
    quotes = spark.createDataFrame(
        [("A", 10, 101.0), ("A", 20, None)], "sym string, ts int, px double"
    )
    out = asof_join(trades, quotes, "sym", "ts", "ts", ["px"]).collect()
    assert len(out) == 1
    assert out[0]["right_ts"] == 20  # the matched row IS ts=20...
    assert out[0]["right_px"] is None  # ...and its NULL px stays NULL


def test_salted_join_rejects_non_equivalent_how(spark):
    from fenix_spark.operators.joins import salted_join

    l = spark.createDataFrame([(1, "x")], "k int, a string")
    r = spark.createDataFrame([(1, "y")], "k int, b string")
    import pytest

    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="not equivalence-preserving"):
            salted_join(l, r, "k", salts=4, how=how)
    assert salted_join(l, r, "k", salts=4, how="left").count() == 1


def test_asof_plan_single_shuffle(spark):
    """The union+window technique must cost exactly one exchange —
    that's the whole point versus an interval join."""
    trades, quotes = _trades_quotes(spark)
    out = asof_join(trades, quotes, "sym", "ts", "ts", ["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def _bands(spark):
    return spark.createDataFrame(
        [(0.0, 10.0, "a"), (10.0, 20.0, "b"), (20.0, 40.0, "c")],
        "lo double, hi double, band string",
    )


def test_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 39.999), (5, 40.0), (6, -0.5)],
        "id bigint, v double",
    )
    out = range_join(pts, _bands(spark), "v")
    got = {r["id"]: r["band"] for r in out.collect()}
    assert got == {1: "a", 2: "a", 3: "b", 4: "c"}  # hi exclusive; 5, 6 unmatched


def test_range_join_bucketed_equals_broadcast(spark, sf_dir):
    from fenix_spark.suite import events_table

    ev = events_table(spark, sf_dir).limit(500).select("event_id", F.col("value").alias("v"))
    bands = _bands(spark).union(
        spark.createDataFrame([(40.0, 500.0, "d")], "lo double, hi double, band string")
    )
    brute = {(r["event_id"], r["band"]) for r in range_join(ev, bands, "v").collect()}
    bucketed = {
        (r["event_id"], r["band"])
        for r in range_join_bucketed(ev, bands, "v", bucket_width=15.0).collect()
    }
    assert bucketed == brute


def test_range_join_bucketed_is_hash_join(spark, sf_dir):
    from fenix_spark.suite import events_table

    ev = events_table(spark, sf_dir).select("event_id", F.col("value").alias("v"))
    out = range_join_bucketed(ev, _bands(spark), "v", bucket_width=10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan  # the rewrite's purpose


def test_aqe_splits_skewed_join_partition(spark):
    """The session's AQE skew-join config must actually FIRE: a hot key
    holding 90% of a shuffle join's rows gets its partition split into
    parallel sub-partitions at runtime (the no-code-change alternative
    to salted_join for moderate skew — salting remains the tool when
    one KEY exceeds a single executor even after splitting).

    Thresholds are lowered to make local data 'big'; on a real cluster
    the defaults (256 MB) express the same contract.
    """
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pay"),
        )
        right = spark.range(100).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        joined = left.join(right, "k")
        assert len(joined.collect()) == 300_000  # every left row matched once
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_asof_directions_match_pandas(spark):
    """forward/nearest must agree with pandas merge_asof on a
    randomized key/ts layout (backward already oracle-checked)."""
    import pandas as pd

    lrows = [(k, t) for k in (1, 2) for t in (0, 5, 10, 17, 23)]
    rrows = [(1, 3, 100.0), (1, 10, 200.0), (1, 18, 300.0), (2, 24, 400.0)]
    left = spark.createDataFrame(lrows, "k bigint, t bigint")
    right = spark.createDataFrame(rrows, "k bigint, t bigint, v double")
    lp = pd.DataFrame(lrows, columns=["k", "t"]).sort_values("t")
    rp = pd.DataFrame(rrows, columns=["k", "t", "v"]).sort_values("t")
    for direction, tol in (("forward", None), ("nearest", None), ("forward", 4), ("nearest", 3)):
        got = {
            (r["k"], r["t"]): r["right_v"]
            for r in asof_join(
                left, right, "k", "t", "t", ["v"], direction=direction, tolerance=tol
            ).collect()
        }
        exp_df = pd.merge_asof(
            lp, rp, on="t", by="k", direction=direction,
            tolerance=tol if tol is None else int(tol),
        )
        exp = {
            (r.k, r.t): (None if pd.isna(r.v) else r.v) for r in exp_df.itertuples()
        }
        assert got == exp, (direction, tol, got, exp)


def test_asof_direction_validation(spark):
    import pytest

    left = spark.createDataFrame([(1, 1)], "k bigint, t bigint")
    with pytest.raises(ValueError, match="backward/forward/nearest"):
        asof_join(left, left, "k", "t", "t", [], direction="sideways")


# ------------------------------------------------- interval overlap


def test_interval_join_brute_parity_and_no_dupes(spark):
    """Exact parity with the brute nested-loop overlap join across
    random intervals (long spans, touching endpoints, zero-length),
    and every pair emitted exactly once (claim-bucket dedup)."""
    import numpy as np

    from fenix_spark.operators.joins import interval_join

    rng = np.random.default_rng(5)
    a_rows, b_rows = [], []
    for i in range(150):
        lo = float(rng.uniform(0, 1000))
        a_rows.append((f"a{i}", lo, lo + float(rng.exponential(20))))
    for i in range(150):
        lo = float(rng.uniform(0, 1000))
        b_rows.append((f"b{i}", lo, lo + float(rng.exponential(20))))
    # edge cases: zero-length, exactly touching, giant span
    a_rows += [("az", 100.0, 100.0), ("at", 200.0, 210.0), ("ag", 0.0, 1000.0)]
    b_rows += [("bz", 100.0, 100.0), ("bt", 210.0, 220.0)]
    A = spark.createDataFrame(a_rows, "aid string, alo double, ahi double")
    B = spark.createDataFrame(b_rows, "bid string, blo double, bhi double")
    got = [
        (r["aid"], r["bid"])
        for r in interval_join(A, B, "alo", "ahi", "blo", "bhi", 25.0).collect()
    ]
    assert len(got) == len(set(got))  # exactly-once emission
    brute = {
        (r["aid"], r["bid"])
        for r in A.crossJoin(B)
        .where(
            F.greatest(F.col("alo"), F.col("blo"))
            < F.least(F.col("ahi"), F.col("bhi"))
        )
        .collect()
    }
    assert set(got) == brute
    # half-open: touching endpoints don't pair; zero-length never pairs
    assert ("at", "bt") not in brute or ("at", "bt") not in set(got)
    assert not any(p[0] == "az" or p[1] == "bz" for p in got)


def test_interval_join_column_clash_raises_and_plan_keyed(spark):
    import pytest as _pytest

    from fenix_spark.operators.joins import interval_join

    A = spark.createDataFrame([("a", 0.0, 1.0)], "id string, lo double, hi double")
    B = spark.createDataFrame([("b", 0.0, 1.0)], "id string, lo double, hi double")
    with _pytest.raises(ValueError, match="disjoint"):
        interval_join(A, B, "lo", "hi", "lo", "hi", 1.0)
    B2 = B.toDF("rid", "rlo", "rhi")
    out = interval_join(A, B2, "lo", "hi", "rlo", "rhi", 1.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert out.count() == 1


# ---------------------------------------------------------------------------
# bloom_filtered_join


def test_bloom_filtered_join_equals_plain_join(spark):
    import numpy as np

    from fenix_spark.operators.joins import bloom_filtered_join

    rng = np.random.default_rng(13)
    left = spark.createDataFrame(
        [(int(v), f"p{v}") for v in rng.integers(0, 10_000, size=5_000)],
        "k bigint, payload string",
    )
    right = spark.createDataFrame(
        [(int(v), float(v) * 0.5) for v in rng.choice(10_000, size=50, replace=False)],
        "k bigint, w double",
    )
    got = sorted(
        (r.k, r.payload, r.w)
        for r in bloom_filtered_join(left, right, "k").collect()
    )
    want = sorted((r.k, r.payload, r.w) for r in left.join(right, "k").collect())
    assert got == want and want  # non-trivial
    semi = sorted(
        (r.k, r.payload)
        for r in bloom_filtered_join(left, right, "k", how="left_semi").collect()
    )
    want_semi = sorted(
        (r.k, r.payload) for r in left.join(right, "k", "left_semi").collect()
    )
    assert semi == want_semi


def test_bloom_filtered_join_multi_key_and_nulls(spark):
    from fenix_spark.operators.joins import bloom_filtered_join

    left = spark.createDataFrame(
        [(1, "x", "L1"), (1, "y", "L2"), (2, "x", "L3"), (None, "x", "L4"),
         (1, None, "L5")],
        "a int, b string, p string",
    )
    right = spark.createDataFrame(
        [(1, "x", 10.0), (2, "x", 20.0), (None, "x", 0.0)],
        "a int, b string, w double",
    )
    got = sorted(
        (r.a, r.b, r.p, r.w)
        for r in bloom_filtered_join(left, right, ["a", "b"]).collect()
    )
    want = sorted(
        (r.a, r.b, r.p, r.w) for r in left.join(right, ["a", "b"]).collect()
    )
    assert got == want
    # null keys never match in either form
    assert all(r[0] is not None and r[1] is not None for r in got)


def test_bloom_filtered_join_actually_reduces_the_shuffle(spark):
    """The point of the reduction: with a selective right side, the
    pre-filter drops (almost) every non-matching left row BEFORE the
    join — measured on the real pre-join frame."""
    from fenix_spark.operators.joins import bloom_filtered_join
    from fenix_spark.operators.sketches import (
        bloom_build,
        bloom_contains_expr,
        bloom_to_words,
    )

    left = spark.range(0, 100_000).withColumnRenamed("id", "k")
    right = spark.createDataFrame(
        [(int(v),) for v in range(0, 100_000, 1000)], "k bigint"
    )  # 100 keys of 100k
    words = bloom_to_words(
        bloom_build(right.select(F.col("k").cast("string").alias("s")), "s")
    )
    surviving = left.where(
        bloom_contains_expr(F.col("k").cast("string"), words)
    ).count()
    assert surviving < 100_000 * 0.02  # ≥98% of the shuffle gone
    assert surviving >= 100  # one-sided: every real match survives
    # and the full helper stays exact
    assert bloom_filtered_join(left, right, "k").count() == 100


def test_bloom_filtered_join_rejects_unsound_types(spark):
    import pytest as _pytest

    from fenix_spark.operators.joins import bloom_filtered_join

    df = spark.createDataFrame([(1,)], "k bigint")
    with _pytest.raises(ValueError, match="only sound"):
        bloom_filtered_join(df, df, "k", how="left")
    with _pytest.raises(ValueError, match="at least one"):
        bloom_filtered_join(df, df, [])
