"""Sketch-family tests: HLL rollup accuracy + merge consistency,
bitmap rollup EXACTNESS at every grain, CMS one-sided error + merge
linearity + DuckDB mirror, Misra-Gries heavy hitters vs exact counts
(including the completeness guarantee and adversarial partitioning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.sketches import (
    _mg_shrink,
    bitmap_merge,
    bitmap_rollup,
    cms_build,
    cms_estimate,
    cms_merge,
    heavy_hitters,
    hll_estimate,
    hll_merge,
    hll_rollup,
)


# ------------------------------------------------------------------ HLL


def test_hll_rollup_and_merge_accuracy(spark, events):
    exact_per_type = {
        r.event_type: r.d
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    roll = hll_rollup(events, ["event_type"], "user_id", lg_k=12)
    est = {r.event_type: r.distinct_est for r in hll_estimate(roll).collect()}
    assert set(est) == set(exact_per_type)
    for t, d in exact_per_type.items():
        assert abs(est[t] - d) <= max(3, 0.05 * d)

    # merged grand total from the per-type sketches ≈ exact overall
    exact_total = events.agg(F.countDistinct("user_id")).first()[0]
    total = hll_merge(roll, []).first().distinct_est
    assert abs(total - exact_total) <= max(3, 0.05 * exact_total)


def test_hll_merge_of_disjoint_groups_equals_direct_sketch(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    roll = hll_rollup(df, ["g"], "v", lg_k=12)
    merged = hll_merge(roll, []).first().distinct_est
    direct = hll_merge(hll_rollup(df, [], "v", lg_k=12), []).first().distinct_est
    # Datasketches' union gadget runs HLL_8 while a direct sketch may
    # estimate from HLL_4, so the two paths can differ in the last few
    # counts — assert both sit within the lg_k=12 error envelope of
    # the truth and of each other, not register equality.
    assert abs(merged - 10_000) <= 200 and abs(direct - 10_000) <= 200
    assert abs(merged - direct) <= 100


# --------------------------------------------------------------- bitmap


def test_bitmap_rollup_is_exact_at_every_grain(spark, events):
    roll = bitmap_rollup(events, ["event_type"], "user_id")
    per_type = {
        r.event_type: r.distinct_exact
        for r in bitmap_merge(roll, ["event_type"]).collect()
    }
    exact = {
        r.event_type: r.d
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert per_type == exact

    total = bitmap_merge(roll, []).first().distinct_exact
    assert total == events.agg(F.countDistinct("user_id")).first()[0]


# ------------------------------------------------------------------ CMS


@pytest.fixture(scope="module")
def term_stream(spark):
    # skewed stream: term_i appears ~ 1000/(i+1) times (zipf-ish)
    rows = []
    for i in range(50):
        rows += [(f"t{i}",)] * (1000 // (i + 1))
    return spark.createDataFrame(rows, "term string"), {
        f"t{i}": 1000 // (i + 1) for i in range(50)
    }


def test_cms_never_undercounts_and_is_tight_when_wide(spark, term_stream):
    terms, truth = term_stream
    sk = cms_build(terms, "term", depth=4, width=2048)
    cand = spark.createDataFrame([(t,) for t in truth], "term string")
    est = {r.term: r.est for r in cms_estimate(sk, cand, "term", 4, 2048).collect()}
    for t, c in truth.items():
        assert est[t] >= c  # one-sided
    # 50 distinct terms in 4×2048 buckets: collisions ~ never
    assert sum(est[t] - truth[t] for t in truth) == 0


def test_cms_merge_equals_single_build(spark, term_stream):
    terms, truth = term_stream
    a, b = terms.randomSplit([0.5, 0.5], seed=7)
    merged = cms_merge(
        cms_build(a, "term", 4, 256), cms_build(b, "term", 4, 256)
    )
    single = cms_build(terms, "term", 4, 256)
    ma = {(r.r, r.b): r.c for r in merged.collect()}
    sa = {(r.r, r.b): r.c for r in single.collect()}
    assert ma == sa  # linearity


def test_cms_duckdb_mirror(spark, term_stream):
    import duckdb

    terms, _ = term_stream
    W = 256
    sk = {(r.r, r.b): r.c for r in cms_build(terms, "term", 2, W).collect()}
    con = duckdb.connect()
    con.register("terms", terms.toPandas())
    from fenix_spark.functions.texthash import duck_hash60

    want = {}
    for r in range(2):
        h = duck_hash60(f"'{r}|' || term")
        for b, c in con.execute(
            f"SELECT {h} % {W} AS b, count(*) FROM terms GROUP BY 1"
        ).fetchall():
            want[(r, b)] = c
    assert sk == want


# --------------------------------------------------- Misra-Gries top-k


def test_mg_shrink_invariant():
    c = {"a": 10, "b": 7, "c": 3, "d": 1}
    out = _mg_shrink(dict(c), 2)
    # pivot = 3rd largest (3): survivors a:7, b:4
    assert out == {"a": 7, "b": 4}
    assert _mg_shrink({"a": 1}, 2) == {"a": 1}


def test_heavy_hitters_match_exact_topk(spark, documents):
    docs = documents.limit(300)
    got = [(r.term, r["count"]) for r in heavy_hitters(docs, "text", k=15, m=512).collect()]
    from fenix_spark.functions.texthash import tokens

    exact = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("term").asc())
        .limit(15)
        .collect()
    )
    assert got == [(r.term, r["count"]) for r in exact]


def test_heavy_hitters_survive_adversarial_partitioning(spark):
    # heavy term spread thinly across partitions, local noise dominating
    rows = [(f"doc{i}", "common " + f"rare{i} " * 3) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, text string").repartition(16)
    got = heavy_hitters(df, "text", k=1, m=8).collect()
    assert got[0].term == "common" and got[0]["count"] == 200


# ----------------------------------------------- histogram / quantiles


def test_hist_rollup_mergeable_and_quantiles(spark, events):
    from fenix_spark.operators.sketches import (
        hist_merge,
        hist_quantiles,
        hist_rollup,
    )

    LO, HI, BINS = 0.0, 1000.0, 200
    roll = hist_rollup(events, ["event_type"], "value", LO, HI, BINS)

    # merged total counts are exact
    n = hist_merge(roll, []).agg(F.sum("c")).first()[0]
    assert n == events.count()

    # per-type medians within one bin width of the exact median
    width = (HI - LO) / BINS
    got = {
        (r.event_type, r.q): r.value
        for r in hist_quantiles(roll, ["event_type"], [0.5, 0.9], LO, HI, BINS).collect()
    }
    exact = {
        r.event_type: (r.m, r.p90)
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("m"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    }
    for t, (m, p90) in exact.items():
        assert abs(got[(t, 0.5)] - m) <= width + 1e-9
        assert abs(got[(t, 0.9)] - p90) <= width + 1e-9


def test_hist_duckdb_mirror(spark, events):
    import duckdb

    from fenix_spark.operators.sketches import hist_rollup

    LO, HI, BINS = 0.0, 500.0, 64
    got = {
        (r.event_type, r.bin): r.c
        for r in hist_rollup(events, ["event_type"], "value", LO, HI, BINS).collect()
    }
    con = duckdb.connect()
    con.register("ev", events.select("event_type", "value").toPandas())
    want = {
        (t, b): c
        for t, b, c in con.execute(f"""
            SELECT event_type,
                   least({BINS - 1}, greatest(0,
                       floor((value::DOUBLE - {LO}) / {(HI - LO) / BINS})::INT)) AS bin,
                   count(*) AS c
            FROM ev GROUP BY 1, 2
        """).fetchall()
    }
    assert got == want


# ------------------------------------------------------ plan contracts


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_cms_plan_single_partial_agg_shuffle(spark, term_stream):
    terms, _ = term_stream
    p = _plan(cms_build(terms, "term", 4, 256))
    # partial + final HashAggregate around exactly one exchange: the
    # shuffle carries ≤ d·w keys, map-side combined
    assert p.count("HashAggregate") == 2
    assert p.count("Exchange") == 1


def test_heavy_hitters_exact_pass_is_broadcast_semi(spark, documents):
    from fenix_spark.functions.texthash import tokens
    from fenix_spark.operators.sketches import heavy_hitters

    p = _plan(heavy_hitters(documents.limit(50), "text", k=5, m=64))
    assert "BroadcastHashJoin" in p and "LeftSemi" in p


def test_hll_rollup_partial_aggregates(spark, events):
    p = _plan(hll_rollup(events, ["event_type"], "user_id"))
    # sketch agg is object-hash-aggregated with a partial phase
    assert "ObjectHashAggregate" in p
    assert p.count("Exchange") == 1


def test_heavy_hitters_weighted(spark):
    rows = [("a", 100), ("b", 1)] * 30 + [("c", 5)] * 30
    df = spark.createDataFrame(rows, "term string, w bigint")
    got = [
        (r.term, r["count"])
        for r in heavy_hitters(
            df, "term", k=3, m=16, tokenize=False, weight_col="w"
        ).collect()
    ]
    assert got == [("a", 3000), ("c", 150), ("b", 30)]


def test_hist_rollup_auto_range(spark, events):
    from fenix_spark.operators.sketches import hist_merge, hist_rollup_auto

    roll, lo, hi = hist_rollup_auto(events, ["event_type"], "value", bins=64)
    assert lo <= hi
    n = hist_merge(roll, []).agg(F.sum("c")).first()[0]
    assert n == events.count()


def test_hist_rollup_excludes_nulls(spark):
    from fenix_spark.operators.sketches import hist_merge, hist_rollup

    df = spark.createDataFrame(
        [(1, 900.0)] * 5 + [(1, None)] * 10, "g int, v double"
    )
    roll = hist_rollup(df, ["g"], "v", 0.0, 1000.0, 10)
    n = hist_merge(roll, []).agg(F.sum("c")).first()[0]
    assert n == 5  # nulls are not silently binned at lo
    bins = {r.bin for r in roll.collect()}
    assert bins == {9}


def test_heavy_hitters_attaches_count_floor(spark, documents):
    docs = documents.limit(100)
    rows = heavy_hitters(docs, "text", k=5, m=256).collect()
    assert all(r.count_floor == rows[0].count_floor for r in rows)
    from fenix_spark.functions.texthash import tokens

    n = docs.select(F.explode(tokens(F.col("text")))).count()
    assert rows[0].count_floor == n // 257


# ---------------------------------------------------------------- Bloom


def _py_bloom_positions(v: str, m: int, k: int) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"{i}|{v}".encode()).hexdigest()[:15], 16) % m
        for i in range(k)
    ]


def test_bloom_build_matches_python_reference(spark):
    from fenix_spark.operators.sketches import bloom_build

    m, k = 1 << 14, 5
    vals = [f"key{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r.word: r.bits for r in bloom_build(df, "v", m, k).collect()}
    words = [0] * (m // 32)
    for v in vals:
        for p in _py_bloom_positions(v, m, k):
            words[p >> 5] |= 1 << (p & 31)
    assert got == {i: w for i, w in enumerate(words) if w}


def test_bloom_no_false_negatives_and_fp_rate(spark):
    from fenix_spark.operators.sketches import (
        bloom_build,
        bloom_contains_expr,
        bloom_to_words,
    )

    m, k = 1 << 16, 5
    present = [f"in{i}" for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in present], "v string")
    words = bloom_to_words(bloom_build(df, "v", m, k), m)
    probe = spark.createDataFrame(
        [(v, True) for v in present]
        + [(f"out{i}", False) for i in range(2000)],
        "v string, is_in boolean",
    ).withColumn("maybe", bloom_contains_expr(F.col("v"), words, m, k))
    rows = probe.collect()
    # one-sided: every inserted value MUST test positive
    assert all(r.maybe for r in rows if r.is_in)
    fp = sum(1 for r in rows if not r.is_in and r.maybe) / 2000
    assert fp <= 0.01  # sized for ~2e-6 expected


def test_bloom_merge_equals_union_build(spark):
    from fenix_spark.operators.sketches import bloom_build, bloom_merge

    m, k = 1 << 12, 4
    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "v string")
    merged = {
        r.word: r.bits
        for r in bloom_merge(
            bloom_build(a, "v", m, k), bloom_build(b, "v", m, k)
        ).collect()
    }
    full = {
        r.word: r.bits
        for r in bloom_build(a.unionByName(b), "v", m, k).collect()
    }
    assert merged == full
    # idempotent under re-merge (at-least-once folds are safe)
    twice = {
        r.word: r.bits
        for r in bloom_merge(
            bloom_build(a, "v", m, k),
            bloom_build(b, "v", m, k),
            bloom_build(b, "v", m, k),
        ).collect()
    }
    assert twice == full


def test_bloom_nulls_skipped_and_prefilter_keeps_all_matches(spark):
    from fenix_spark.operators.sketches import (
        bloom_build,
        bloom_contains_expr,
        bloom_to_words,
    )

    m, k = 1 << 12, 4
    right = spark.createDataFrame(
        [("k1",), (None,), ("k2",)], "key string"
    )
    words = bloom_to_words(bloom_build(right, "key", m, k), m)
    left = spark.createDataFrame(
        [(i, f"k{i % 5}") for i in range(100)], "id bigint, key string"
    )
    pre = left.where(bloom_contains_expr(F.col("key"), words, m, k))
    joined_pre = pre.join(right.where(F.col("key").isNotNull()), "key").count()
    joined_full = left.join(right.where(F.col("key").isNotNull()), "key").count()
    assert joined_pre == joined_full  # the pre-filter NEVER drops a match


def test_bloom_to_words_raises_on_m_bits_mismatch(spark):
    """An m_bits mismatch between build and densify must raise, not
    silently drop bits (which would mean FALSE NEGATIVES) (ADVICE r5)."""
    import pytest as _pytest

    from fenix_spark.operators.sketches import bloom_build, bloom_to_words

    df = spark.createDataFrame([(f"v{i}",) for i in range(50)], "v string")
    sketch = bloom_build(df, "v", m_bits=1 << 16, k=3)
    with _pytest.raises(ValueError, match="different m_bits"):
        bloom_to_words(sketch, m_bits=1 << 10)  # smaller than build


# ----------------------------------------------------------------- KLL


def _rank_err(vals_sorted, v, q):
    import numpy as np

    rank = np.searchsorted(vals_sorted, v, side="right") / len(vals_sorted)
    return abs(rank - q)


def test_kll_rank_error_and_weight_conservation(spark):
    """k=200 must land every decile within 3% rank error on 50k skewed
    values (theory says ~1%; slack for the deterministic coin), and the
    sketch's total weight must equal n EXACTLY (odd leftovers stay at
    their level — compaction never loses mass)."""
    import numpy as np

    from fenix_spark.operators.sketches import kll_quantiles, kll_rollup

    rng = np.random.default_rng(5)
    vals = np.concatenate(
        [rng.lognormal(0.0, 1.5, 40_000), rng.uniform(-50, -1, 10_000)]
    )
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "v double"
    ).repartition(16)
    sk = kll_rollup(df, [], "v", k=200).localCheckpoint()
    assert sk.agg(F.sum("weight")).first()[0] == len(vals)
    assert sk.count() < 3_000  # bounded summary, not the data
    qs = [i / 10 for i in range(1, 10)]
    got = {r["q"]: r["value"] for r in kll_quantiles(sk, [], qs).collect()}
    srt = np.sort(vals)
    for q in qs:
        assert _rank_err(srt, got[q], q) <= 0.03, (q, got[q])


def test_kll_grouped_rollup_and_merge(spark):
    """Per-group sketches at the fine grain; merging to the coarse
    grain must agree with a direct coarse build within the error class
    — the persist-once-query-forever contract."""
    import numpy as np

    from fenix_spark.operators.sketches import (
        kll_merge,
        kll_quantiles,
        kll_rollup,
    )

    rng = np.random.default_rng(11)
    rows = []
    for day in range(4):
        for src in ("a", "b"):
            base = 10.0 * day + (0.0 if src == "a" else 100.0)
            rows += [
                (day, src, float(base + v)) for v in rng.normal(0, 3, 5_000)
            ]
    df = spark.createDataFrame(rows, "day int, src string, v double").repartition(16)
    fine = kll_rollup(df, ["day", "src"], "v", k=160).localCheckpoint()
    assert fine.select("day", "src").distinct().count() == 8
    # per-group weight conservation
    w = {(r["day"], r["src"]): r["s"] for r in
         fine.groupBy("day", "src").agg(F.sum("weight").alias("s")).collect()}
    assert all(v == 5_000 for v in w.values())

    coarse = kll_merge(fine, ["src"], k=160)
    got = {
        (r["src"], r["q"]): r["value"]
        for r in kll_quantiles(coarse, ["src"], [0.25, 0.5, 0.75]).collect()
    }
    by_src = {"a": [], "b": []}
    for day, src, v in rows:
        by_src[src].append(v)
    for src in ("a", "b"):
        srt = np.sort(by_src[src])
        for q in (0.25, 0.5, 0.75):
            assert _rank_err(srt, got[(src, q)], q) <= 0.04, (src, q)


def test_kll_extremes_and_partition_invariance(spark):
    """q=0/q=1 return the held extremes — within rank ε of the true
    min/max (the documented contract: compaction may drop the exact
    extremes); repartitioning shifts quantiles only within the error
    class; nulls are excluded like percentile aggregates."""
    import numpy as np

    from fenix_spark.operators.sketches import kll_quantiles, kll_rollup

    vals = [float(v) for v in range(1000)]
    rows = [(v,) for v in vals] + [(None,)] * 50
    med = {}
    for parts in (2, 13):
        df = spark.createDataFrame(rows, "v double").repartition(parts)
        sk = kll_rollup(df, [], "v", k=128).localCheckpoint()
        assert sk.agg(F.sum("weight")).first()[0] == 1000  # nulls out
        got = {
            r["q"]: r["value"]
            for r in kll_quantiles(sk, [], [0.0, 0.5, 1.0]).collect()
        }
        assert _rank_err(np.sort(np.array(vals)), got[0.0], 0.0) <= 0.04
        assert got[1.0] == max(vals) or (
            _rank_err(np.sort(np.array(vals)), got[1.0], 1.0) <= 0.04
        )
        med[parts] = got[0.5]
    srt = np.sort(np.array(vals))
    for parts, m in med.items():
        assert _rank_err(srt, m, 0.5) <= 0.04


# ----------------------------------------------------- theta / KMV


def _planted_sets(spark):
    """Three labeled id sets with known overlaps: A=0..19999,
    B=15000..29999 (|A∩B|=5000), C=disjoint 50000..52999."""
    rows = (
        [("A", f"id{i}") for i in range(20_000)]
        + [("B", f"id{i}") for i in range(15_000, 30_000)]
        + [("C", f"id{i}") for i in range(50_000, 53_000)]
    )
    return spark.createDataFrame(rows, "src string, item string")


def test_theta_estimate_bounds_and_exact_arm(spark):
    from fenix_spark.operators.sketches import theta_estimate, theta_rollup

    df = _planted_sets(spark)
    k = 1024
    roll = theta_rollup(df, ["src"], "item", k)
    got = {r["src"]: (r["distinct_est"], r["exact"]) for r in
           theta_estimate(roll, ["src"], k).collect()}
    # C has 3000 < k·? no — 3000 ≥ 1024 → estimated; check bounds
    rse = 1.0 / (k - 2) ** 0.5
    for src, n in (("A", 20_000), ("B", 15_000), ("C", 3_000)):
        est, exact = got[src]
        assert abs(est - n) / n <= 5 * rse, (src, est, n)
    # a genuinely small group is EXACT
    small = spark.createDataFrame(
        [("S", f"x{i}") for i in range(700)], "src string, item string"
    )
    sroll = theta_rollup(small, ["src"], "item", k)
    r = theta_estimate(sroll, ["src"], k).collect()[0]
    assert r["exact"] and r["distinct_est"] == 700.0


def test_theta_deterministic_and_partition_invariant(spark):
    """Bottom-k of a set is layout-independent: 2 vs 32 partitions
    produce the IDENTICAL sketch rows (not just close estimates)."""
    from fenix_spark.operators.sketches import theta_rollup

    df = _planted_sets(spark)
    a = set(
        (r["src"], r["value"])
        for r in theta_rollup(df.repartition(2), ["src"], "item", 512).collect()
    )
    b = set(
        (r["src"], r["value"])
        for r in theta_rollup(df.repartition(32), ["src"], "item", 512).collect()
    )
    assert a == b


def test_theta_merge_equals_direct(spark):
    """Merging per-shard sketches == sketching the union directly,
    EXACTLY (the determinism HLL can't give)."""
    from fenix_spark.operators.sketches import theta_merge, theta_rollup

    df = _planted_sets(spark)
    k = 256
    shard1 = theta_rollup(df.where("item < 'id2'"), ["src"], "item", k)
    shard2 = theta_rollup(df.where("item >= 'id2'"), ["src"], "item", k)
    merged = set(
        (r["src"], r["value"])
        for r in theta_merge(shard1.unionByName(shard2), ["src"], k).collect()
    )
    direct = set(
        (r["src"], r["value"])
        for r in theta_rollup(df, ["src"], "item", k).collect()
    )
    assert merged == direct
    # grand-total grain too
    grand = theta_merge(shard1.unionByName(shard2), [], k)
    dgrand = theta_rollup(df.select("item"), [], "item", k)
    assert set(r["value"] for r in grand.collect()) == set(
        r["value"] for r in dgrand.collect()
    )


def test_theta_set_ops_planted_overlap(spark):
    from fenix_spark.operators.sketches import theta_rollup, theta_set_ops

    df = _planted_sets(spark).withColumn("g", F.lit(1))
    k = 2048
    a = theta_rollup(df.where("src = 'A'"), ["g"], "item", k)
    b = theta_rollup(df.where("src = 'B'"), ["g"], "item", k)
    r = theta_set_ops(a, b, ["g"], k).collect()[0]
    assert abs(r["a_est"] - 20_000) / 20_000 < 0.15
    assert abs(r["b_est"] - 15_000) / 15_000 < 0.15
    assert abs(r["intersect_est"] - 5_000) / 5_000 < 0.25
    assert abs(r["union_est"] - 30_000) / 30_000 < 0.15
    assert abs(r["jaccard_est"] - 5_000 / 30_000) < 0.05

    # exact ⊗ exact ⇒ exact everywhere
    sa = spark.createDataFrame(
        [(1, f"p{i}") for i in range(100)], "g int, item string"
    )
    sb = spark.createDataFrame(
        [(1, f"p{i}") for i in range(60, 160)], "g int, item string"
    )
    ra = theta_rollup(sa, ["g"], "item", k)
    rb = theta_rollup(sb, ["g"], "item", k)
    r = theta_set_ops(ra, rb, ["g"], k).collect()[0]
    assert (r["a_est"], r["b_est"]) == (100.0, 100.0)
    assert r["intersect_est"] == 40.0 and r["union_est"] == 160.0
    assert abs(r["jaccard_est"] - 0.25) < 1e-12

    # disjoint keys: one-sided rows survive the full-outer
    oa = theta_rollup(
        spark.createDataFrame([(2, "z1")], "g int, item string"), ["g"], "item", k
    )
    r2 = {row["g"]: row for row in theta_set_ops(oa, rb, ["g"], k).collect()}
    assert r2[2]["intersect_est"] == 0.0 and r2[2]["b_est"] is None


def test_overlap_matrix_planted(spark):
    from fenix_spark.operators.sketches import overlap_matrix, theta_rollup

    df = _planted_sets(spark)
    k = 2048
    roll = theta_rollup(df, ["src"], "item", k)
    got = {
        (r["label_a"], r["label_b"]): r for r in overlap_matrix(roll, "src", k).collect()
    }
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    assert abs(ab["intersect_est"] - 5_000) / 5_000 < 0.25
    assert abs(ab["jaccard_est"] - 1 / 6) < 0.05
    assert got[("A", "C")]["intersect_est"] == 0.0
    assert got[("B", "C")]["jaccard_est"] == 0.0


# ------------------------------------------------- bottom-k samples


def test_bottomk_sample_fixed_size_and_invariant(spark):
    from fenix_spark.operators.sampling import bottomk_sample

    rows = [(f"g{i % 3}", f"id{i}", i * 1.5) for i in range(5_000)]
    df = spark.createDataFrame(rows, "grp string, id string, payload double")
    got = bottomk_sample(df.repartition(16), ["grp"], "id", 50).collect()
    per = {}
    for r in got:
        per.setdefault(r["grp"], set()).add((r["id"], r["payload"]))
    assert all(len(v) == 50 for v in per.values())
    # layout-independent: same rows under a different partitioning
    got2 = bottomk_sample(df.repartition(3), ["grp"], "id", 50).collect()
    per2 = {}
    for r in got2:
        per2.setdefault(r["grp"], set()).add((r["id"], r["payload"]))
    assert per == per2
    # small groups come back whole
    tiny = spark.createDataFrame(
        [("t", f"i{j}", 0.0) for j in range(7)], "grp string, id string, payload double"
    )
    assert bottomk_sample(tiny, ["grp"], "id", 50).count() == 7


def test_bottomk_same_id_under_two_groups_one_batch(spark):
    """An id appearing under TWO different group keys, forced into one
    Arrow batch (coalesce(1)), must survive in BOTH groups: the partial
    phase dedups per (keys, id), not globally by id — otherwise the
    result would depend on batch layout."""
    from fenix_spark.operators.sampling import bottomk_sample

    rows = [(g, "dup", 1.0) for g in ("g0", "g1")] + [
        (f"g{i % 2}", f"id{i}", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "grp string, id string, payload double"
    ).coalesce(1)
    got = bottomk_sample(df, ["grp"], "id", 50).collect()
    per = {}
    for r in got:
        per.setdefault(r["grp"], set()).add(r["id"])
    assert "dup" in per["g0"] and "dup" in per["g1"]
    assert len(per["g0"]) == 6 and len(per["g1"]) == 6
    # and the result is identical under a spread layout
    got2 = bottomk_sample(df.repartition(8), ["grp"], "id", 50).collect()
    per2 = {}
    for r in got2:
        per2.setdefault(r["grp"], set()).add(r["id"])
    assert per == per2


def test_bottomk_merge_equals_direct_and_uniformity(spark):
    from fenix_spark.operators.sampling import bottomk_merge, bottomk_sample

    rows = [(f"g{i % 2}", f"id{i}", i) for i in range(8_000)]
    df = spark.createDataFrame(rows, "grp string, id string, v long")
    k = 64
    s1 = bottomk_sample(df.where("v < 4000"), ["grp"], "id", k)
    s2 = bottomk_sample(df.where("v >= 4000"), ["grp"], "id", k)
    merged = {
        (r["grp"], r["id"]) for r in
        bottomk_merge(s1.unionByName(s2), ["grp"], "id", k).collect()
    }
    direct = {
        (r["grp"], r["id"]) for r in bottomk_sample(df, ["grp"], "id", k).collect()
    }
    assert merged == direct
    # uniformity: the sampled v's mean sits near the population mean
    # (hash-uniform selection; generous 3-sigma-ish tolerance)
    import numpy as np

    vs = [r["v"] for r in bottomk_sample(df, [], "id", 512).collect()]
    assert len(vs) == 512
    assert abs(np.mean(vs) - 3999.5) < 3 * 8000 / (12 ** 0.5) / (512 ** 0.5)


def test_theta_rollup_is_exactly_bottom_k_of_hash_set(spark):
    """The precise spec: the sketch IS the k smallest distinct
    xxhash64 values (signed order) — checked against an independently
    computed exact hash set for several (n, k, dup-rate, partitioning)
    configs. This is what makes every downstream estimate auditable:
    no RNG, no approximation in the STATE, only in the estimator."""
    from fenix_spark.operators.sketches import theta_rollup

    for n, k, parts, dup in [(50, 8, 1, 1), (1000, 64, 7, 3), (300, 512, 4, 2)]:
        rows = [(f"g{i % 2}", f"v{i // dup}") for i in range(n)]
        df = spark.createDataFrame(rows, "g string, item string").repartition(parts)
        got = {}
        for r in theta_rollup(df, ["g"], "item", k).collect():
            got.setdefault(r["g"], []).append(r["value"])
        exact = {}
        for r in (
            df.select("g", F.xxhash64("item").alias("h")).distinct().collect()
        ):
            exact.setdefault(r["g"], []).append(r["h"])
        for g, hs in exact.items():
            assert sorted(got[g]) == sorted(hs)[:k], (n, k, parts, g)


def test_theta_rollup_excludes_nulls_and_empty_group(spark):
    from fenix_spark.operators.sketches import theta_estimate, theta_rollup

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("b", None)], "g string, item string"
    )
    roll = theta_rollup(df, ["g"], "item", 16)
    got = {r["g"] for r in roll.collect()}
    assert got == {"a"}  # all-null group contributes no sketch rows
    est = {r["g"]: r["distinct_est"] for r in theta_estimate(roll, ["g"], 16).collect()}
    assert est == {"a": 1.0}


def test_theta_set_ops_grand_sketches(spark):
    """keys=[] (grand sketches) — the snapshot-vs-snapshot shape."""
    from fenix_spark.operators.sketches import theta_rollup, theta_set_ops

    a = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "item string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(1000, 3000)], "item string"
    )
    k = 1024
    r = theta_set_ops(
        theta_rollup(a, [], "item", k), theta_rollup(b, [], "item", k), [], k
    ).collect()
    assert len(r) == 1
    r = r[0]
    assert abs(r["intersect_est"] - 1000) / 1000 < 0.3
    assert abs(r["union_est"] - 3000) / 3000 < 0.15
    assert abs(r["jaccard_est"] - 1 / 3) < 0.07
    assert "__g" not in r.asDict()  # internal grouping column dropped


def test_theta_query_path_is_native_and_keyed(spark):
    """Python ends at the rollup build: estimate and set-ops plans
    contain NO Arrow/Python evaluation and no cartesian product —
    every join is keyed, every agg partial-aggregable."""
    from fenix_spark.operators.sketches import (
        theta_estimate,
        theta_rollup,
        theta_set_ops,
    )

    df = _planted_sets(spark)
    a = theta_rollup(df.where("src = 'A'"), ["src"], "item", 128).localCheckpoint()
    b = theta_rollup(df.where("src = 'B'"), ["src"], "item", 128).localCheckpoint()
    for q in (theta_estimate(a, ["src"], 128), theta_set_ops(a, b, ["src"], 128)):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan and "MapInPandas" not in plan
        assert "CartesianProduct" not in plan


def test_ngram_novelty_planted(spark):
    """Known composition: cur = half ref text + half fresh text →
    novelty lands near the planted fraction; scoring ref against
    itself gives ~0 novelty, disjoint text ~1."""
    import numpy as np

    from fenix_spark.operators.sketches import ngram_novelty

    rng = np.random.default_rng(17)
    vocab_a = [f"alpha{i}" for i in range(400)]
    vocab_b = [f"beta{i}" for i in range(400)]

    def doc(vocab, m=40):
        return " ".join(rng.choice(vocab, m))

    ref_docs = [(i, doc(vocab_a)) for i in range(300)]
    ref = spark.createDataFrame(ref_docs, "id int, text string")
    # cur = half VERBATIM ref docs (their grams are all shared) + half
    # fresh-vocab docs (their grams are all new) → novelty ≈ 0.5
    rows = ref_docs[:150] + [(1000 + i, doc(vocab_b)) for i in range(150)]
    cur = spark.createDataFrame(rows, "id int, text string")

    r = ngram_novelty(ref, cur, "text", n=3, k=4096)
    assert 0.35 <= r["novelty"] <= 0.65, r
    self_r = ngram_novelty(ref, ref, "text", n=3, k=4096)
    assert self_r["novelty"] < 0.05, self_r
    disjoint = ngram_novelty(
        ref,
        spark.createDataFrame(
            [(i, doc(vocab_b)) for i in range(100)], "id int, text string"
        ),
        "text", n=3, k=4096,
    )
    assert disjoint["novelty"] > 0.95, disjoint
    # bookkeeping identities hold
    assert r["new_grams"] + r["shared_grams"] == pytest.approx(r["cur_grams"])


def test_ngram_novelty_zero_gram_corpora(spark):
    """Zero-row corpora produce zero grams on both sides (the theta
    set-ops frame is empty, .first() is None) — the report must be the
    zeroed dict, not a TypeError."""
    from fenix_spark.operators.sketches import ngram_novelty

    empty = spark.createDataFrame([], "id int, text string")
    r = ngram_novelty(empty, empty, "text", n=3, k=64)
    assert r == {
        "ref_grams": 0.0,
        "cur_grams": 0.0,
        "shared_grams": 0.0,
        "new_grams": 0.0,
        "novelty": 0.0,
    }


# ------------------------------------------------ CMS join-size


def test_cms_join_size_one_sided_and_tight(spark):
    """est >= true ALWAYS (fixed hashes, non-negative collision
    terms); on realistic cardinalities the overshoot is small; the
    exact join size Σ f_A(v)·f_B(v) is computed independently."""
    from fenix_spark.operators.sketches import cms_build, cms_join_size

    rows_a = [(f"k{i % 300}",) for i in range(6_000)]
    rows_b = [(f"k{i % 450}",) for i in range(4_500)]
    A = spark.createDataFrame(rows_a, "key string")
    B = spark.createDataFrame(rows_b, "key string")
    true = A.join(B, "key").count()
    d, w = 4, 2048
    est = cms_join_size(
        cms_build(A, "key", d, w), cms_build(B, "key", d, w), depth=d
    ).head()["join_size_est"]
    assert est >= true
    # the CM inner-product residue is ≈ ||f_A||₁·||f_B||₁/w per row;
    # the min over rows must stay inside a small multiple of it
    assert est - true <= 2 * (6_000 * 4_500 / w), (est, true)
    # width buys accuracy: at 8x the width the estimate is tight
    w2 = 16_384
    est2 = cms_join_size(
        cms_build(A, "key", d, w2), cms_build(B, "key", d, w2), depth=d
    ).head()["join_size_est"]
    assert true <= est2 <= 1.05 * true, (est2, true)


def test_cms_join_size_disjoint_is_zero_or_tiny(spark):
    from fenix_spark.operators.sketches import cms_build, cms_join_size

    A = spark.createDataFrame([(f"a{i}",) for i in range(500)], "key string")
    B = spark.createDataFrame([(f"b{i}",) for i in range(500)], "key string")
    d, w = 4, 4096
    est = cms_join_size(
        cms_build(A, "key", d, w), cms_build(B, "key", d, w), depth=d
    ).head()["join_size_est"]
    true = A.join(B, "key").count()
    assert true == 0
    # collisions may leave a small residue; it must stay ≪ |A|·|B|
    assert est <= 500 * 500 * (4.0 / w)


def test_cms_join_size_empty_row_proves_empty(spark):
    """If any hash row has no overlapping cells the estimate is
    EXACTLY zero (shared keys would populate every row)."""
    from fenix_spark.operators.sketches import cms_build, cms_join_size

    A = spark.createDataFrame([("x",)], "key string")
    B = spark.createDataFrame([("y",)], "key string")
    d, w = 4, 1 << 20  # huge width → no collisions → some row empty
    est = cms_join_size(
        cms_build(A, "key", d, w), cms_build(B, "key", d, w), depth=d
    ).head()["join_size_est"]
    assert est == 0


def test_cms_join_size_weighted_and_skewed(spark):
    """Heavy-key joins (the case that melts reducers) are where the
    planner needs the number: a 100x hot key dominates Σ f_A·f_B and
    the estimate tracks it."""
    from fenix_spark.operators.sketches import cms_build, cms_join_size

    rows_a = [("HOT",)] * 2_000 + [(f"k{i}",) for i in range(1_000)]
    rows_b = [("HOT",)] * 300 + [(f"k{i}",) for i in range(1_000)]
    A = spark.createDataFrame(rows_a, "key string")
    B = spark.createDataFrame(rows_b, "key string")
    true = A.join(B, "key").count()  # 600_000 + 1_000
    d, w = 4, 2048
    est = cms_join_size(
        cms_build(A, "key", d, w), cms_build(B, "key", d, w), depth=d
    ).head()["join_size_est"]
    assert true <= est <= 1.1 * true, (est, true)


# ---------------------------------------------------------------------------
# equi-depth binning


def test_equi_depth_edges_exact_when_sketch_exact(spark):
    # < k distinct values: KLL retains everything → edges are the
    # EXACT lower weighted quantiles; mirror in plain python
    from fenix_spark.operators.sketches import equi_depth_edges

    vals = [float(v) for v in [1, 2, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144]]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    [row] = equi_depth_edges(df, "v", 4, k=200).collect()
    sv = sorted(vals)
    n = len(sv)

    def lower_q(q):
        # smallest item whose cumulative weight ≥ q·n
        import math

        return sv[max(0, math.ceil(q * n) - 1)]

    assert row.edges == [lower_q(0.25), lower_q(0.5), lower_q(0.75)]


def test_equi_depth_bins_balanced_on_skewed_data(spark):
    import numpy as np

    from fenix_spark.operators.sketches import (
        assign_equi_depth,
        equi_depth_edges,
    )

    rng = np.random.default_rng(2)
    vals = [float(v) for v in rng.lognormal(0, 2, size=20_000)]  # heavy tail
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    edges = equi_depth_edges(df, "v", 10, k=200)
    binned = assign_equi_depth(df, edges, "v")
    counts = {r.bin: r.c for r in binned.groupBy("bin").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("c")
    ).collect()}
    assert set(counts) == set(range(10))
    for b, c in counts.items():
        # 10% ± sketch rank error (k=200 → ~1%; generous 3× slack)
        assert abs(c - 2000) < 0.03 * 20_000, (b, c)


def test_equi_depth_per_key_and_null_semantics(spark):
    from fenix_spark.operators.sketches import (
        assign_equi_depth,
        equi_depth_edges,
    )

    rows = [("a", float(i)) for i in range(100)] + [
        ("b", float(1000 + i)) for i in range(100)
    ] + [("a", None), ("c", None)]
    df = spark.createDataFrame(rows, "k string, v double")
    edges = equi_depth_edges(df, "v", 4, keys=("k",))
    # group c is all-null: no edges row at all
    erows = {r.k: r.edges for r in edges.collect()}
    assert set(erows) == {"a", "b"}
    # 100 values, < k retained → exact lower quantiles: ceil(q·100)−1
    assert erows["a"] == [24.0, 49.0, 74.0]
    out = assign_equi_depth(df, edges, "v", keys=("k",)).collect()
    for r in out:
        if r.v is None or r.k == "c":
            assert r.bin is None
        elif r.k == "a":
            assert r.bin == sum(1 for e in erows["a"] if e <= r.v)
        else:
            assert 0 <= r.bin <= 3
    # per-key isolation: b's values all exceed a's edges but still
    # spread across b's own four bins
    bbins = {r.bin for r in out if r.k == "b"}
    assert bbins == {0, 1, 2, 3}


def test_equi_depth_edge_value_lands_lower_inclusive(spark):
    from fenix_spark.operators.sketches import (
        assign_equi_depth,
        equi_depth_edges,
    )

    df = spark.createDataFrame([(float(i),) for i in range(1, 9)], "v double")
    edges = equi_depth_edges(df, "v", 2)
    [erow] = edges.collect()
    [edge] = erow.edges
    got = {
        r.v: r.bin for r in assign_equi_depth(df, edges, "v").collect()
    }
    assert got[edge] == 1  # exactly-on-edge → upper bin (lower-inclusive)
    assert got[edge - 1.0] == 0


def test_equi_depth_validation(spark):
    import pytest as _pytest

    from fenix_spark.operators.sketches import equi_depth_edges

    df = spark.createDataFrame([(1.0,)], "v double")
    with _pytest.raises(ValueError):
        equi_depth_edges(df, "v", 1)
