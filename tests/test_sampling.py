"""Reproducible sampling / quota semantics (operators/sampling.py)
and the salted join (operators/joins.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fenix_spark.operators.joins import salted_join
from fenix_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    per_group_limit,
)


def test_sample_deterministic_and_partition_invariant(documents):
    a = {r["doc_id"] for r in deterministic_sample(documents, "doc_id", 0.2).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(documents.repartition(13), "doc_id", 0.2).collect()
    }
    assert a == b
    n = documents.count()
    assert 0.1 * n < len(a) < 0.3 * n  # ~20%, loose bounds for 500 rows


def test_sample_salt_decorrelates(documents):
    a = {r["doc_id"] for r in deterministic_sample(documents, "doc_id", 0.2).collect()}
    c = {r["doc_id"] for r in deterministic_sample(documents, "doc_id", 0.2, salt="x").collect()}
    assert a != c


def test_sample_is_scan_filter(documents):
    plan = (
        deterministic_sample(documents, "doc_id", 0.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure map-side filter


def test_split_disjoint_exhaustive(embeddings):
    out = hash_split(embeddings, "vec_id", [0.8, 0.1, 0.1], ["train", "val", "test"])
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == embeddings.count()
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_split_stable_across_calls(embeddings):
    one = {(r["vec_id"], r["split"]) for r in hash_split(embeddings, "vec_id", [0.5, 0.5], ["a", "b"]).select("vec_id", "split").collect()}
    two = {(r["vec_id"], r["split"]) for r in hash_split(embeddings, "vec_id", [0.5, 0.5], ["a", "b"]).select("vec_id", "split").collect()}
    assert one == two


def test_per_group_limit(documents):
    out = per_group_limit(documents, ["lang"], [F.col("doc_id").asc()], 5)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 5 for v in counts.values())
    first = out.where(F.col("lang") == max(counts)).select("doc_id").collect()
    expect = (
        documents.where(F.col("lang") == max(counts))
        .orderBy("doc_id")
        .limit(5)
        .select("doc_id")
        .collect()
    )
    assert sorted(r["doc_id"] for r in first) == sorted(r["doc_id"] for r in expect)


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for k in ("hot", "cold") for i in range(50 if k == "hot" else 3)],
        "k string, lval int",
    )
    right = spark.createDataFrame([("hot", 1.5), ("cold", 2.5), ("never", 9.9)], "k string, rval double")
    plain = {(r["k"], r["lval"], r["rval"]) for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["lval"], r["rval"]) for r in salted_join(left, right, "k", salts=4).collect()}
    assert salted == plain
    outer = {(r["k"], r["lval"], r["rval"]) for r in salted_join(left, right, "k", salts=4, how="left").collect()}
    plain_outer = {(r["k"], r["lval"], r["rval"]) for r in left.join(right, "k", "left").collect()}
    assert outer == plain_outer


def test_mixture_weights_and_provenance(documents, embeddings):
    from fenix_spark.operators.sampling import mixture

    docs = documents.select(F.col("doc_id").alias("rid"), "lang")
    vecs = embeddings.select(F.col("vec_id").alias("rid"), "label")
    out = mixture([(docs, 1.0), (vecs, 0.25)], "rid", salt="s1")
    by_src = {r["__source"]: r["n"] for r in out.groupBy("__source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src[0] == docs.count()  # weight 1.0 keeps everything
    frac = by_src.get(1, 0) / vecs.count()
    assert 0.15 < frac < 0.35  # ~0.25, hash-uniform
    assert sorted(out.columns) == sorted(["rid", "lang", "label", "__source"])
    # deterministic: same salt, same subset
    again = mixture([(docs, 1.0), (vecs, 0.25)], "rid", salt="s1")
    a = {(r["rid"], r["__source"]) for r in out.collect()}
    b = {(r["rid"], r["__source"]) for r in again.collect()}
    assert a == b


def test_write_shards_deterministic_and_sized(spark, embeddings, tmp_path):
    import os

    from fenix_spark.operators.sampling import write_shards

    n = embeddings.count()
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    k1 = write_shards(embeddings, p1, "vec_id", shard_rows=150, salt="v0")
    k2 = write_shards(embeddings, p2, "vec_id", shard_rows=150, salt="v0")
    assert k1 == k2 == -(-n // 150)
    back = spark.read.parquet(p1)
    assert back.count() == n
    assert {r["vec_id"] for r in back.select("vec_id").collect()} == {
        r["vec_id"] for r in embeddings.select("vec_id").collect()
    }
    # same salt → byte-identical shard membership (per-file row sets)
    def layout(p):
        files = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
        return [
            frozenset(r["vec_id"] for r in spark.read.parquet(os.path.join(p, f)).collect())
            for f in files
        ]
    assert layout(p1) == layout(p2)
    # shards are balanced-ish: no shard more than 2x target
    assert all(len(s) <= 300 for s in layout(p1))


def test_weighted_sample_properties(spark):
    from fenix_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, [0.0, 0.2, 1.0, 5.0][i % 4]) for i in range(8000)],
        "id bigint, w double",
    )
    out = weighted_sample(df, "id", "w", keep_per_unit_weight=0.5)
    got = {r.id for r in out.collect()}
    # zero weight never survives
    assert not any(i % 4 == 0 for i in got)
    # w=5.0 → p=min(1, 2.5)=1: all survive
    assert all(i in got for i in range(8000) if i % 4 == 3)
    # w=0.2 → p=0.1 and w=1.0 → p=0.5: proportions within tolerance
    n_02 = sum(1 for i in got if i % 4 == 1)
    n_10 = sum(1 for i in got if i % 4 == 2)
    assert abs(n_02 / 2000 - 0.1) < 0.03
    assert abs(n_10 / 2000 - 0.5) < 0.04
    # deterministic under repartitioning; salted sample decorrelates
    again = {r.id for r in weighted_sample(df.repartition(7), "id", "w", 0.5).collect()}
    assert again == got
    salted = {r.id for r in weighted_sample(df, "id", "w", 0.5, salt="x").collect()}
    assert salted != got


# ------------------------------------------------- temperature mixing


def test_temperature_rates_natural_and_flat():
    from fenix_spark.operators.sampling import temperature_rates

    counts = [8000, 1000, 1000]
    # T=1: shares ∝ counts → rates all equal (budget/total)
    r1 = temperature_rates(counts, 1.0, 5000)
    assert all(abs(r - 0.5) < 1e-12 for r in r1)
    # T→0 limit: shares uniform → equal row counts per source
    r0 = temperature_rates(counts, 1e-9, 3000)
    got = [r * c for r, c in zip(r0, counts)]
    assert all(abs(g - 1000) < 1.0 for g in got)


def test_temperature_rates_water_filling():
    from fenix_spark.operators.sampling import temperature_rates

    counts = [10_000, 100]
    # uniform shares want 2500 from each; source 1 has only 100 —
    # overflow refills source 0
    r = temperature_rates(counts, 1e-9, 5000)
    assert r[1] == 1.0
    assert abs(r[0] * counts[0] - 4900) < 1.0


def test_temperature_rates_budget_exceeds_total():
    from fenix_spark.operators.sampling import temperature_rates

    r = temperature_rates([50, 70], 0.5, 10_000)
    assert r == [1.0, 1.0]


def test_temperature_mixture_realized_counts(spark):
    from fenix_spark.operators.sampling import temperature_mixture

    a = spark.range(8000).select(F.col("id").alias("doc_id"))
    b = spark.range(2000).select((F.col("id") + 100_000).alias("doc_id"))
    out = temperature_mixture([a, b], "doc_id", 1e-9, 2000, salt="t")
    per_src = {r["__source"]: r.c for r in out.groupBy("__source").agg(F.count(F.lit(1)).alias("c")).collect()}
    # uniform shares: ~1000 from each; hash sampling is ±~3σ of binomial
    for s in (0, 1):
        assert abs(per_src[s] - 1000) < 120


def test_cluster_balanced_sample(spark):
    from fenix_spark.operators.sampling import cluster_balanced_sample

    # three lopsided clusters: 6000 / 3000 / 60 rows
    df = spark.range(9060).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 6000, "a")
        .when(F.col("id") < 9000, "b")
        .otherwise("c")
        .alias("cluster"),
    )
    out = cluster_balanced_sample(df, "cluster", "doc_id", budget=3000, salt="s")
    per = {r.cluster: r.n for r in out.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()}
    # c (60 rows) is fully taken; a/b water-fill the remainder ~1470 each
    assert per["c"] == 60
    assert abs(per["a"] - 1470) < 130 and abs(per["b"] - 1470) < 130
    # deterministic under repartition
    again = cluster_balanced_sample(
        df.repartition(11), "cluster", "doc_id", budget=3000, salt="s"
    )
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in out.collect()
    )


def test_cluster_balanced_fine_rates_and_null_exclusion(spark):
    from fenix_spark.operators.sampling import cluster_balanced_sample

    # tiny budget over a huge cluster: the old 1/10000 rate grid would
    # round the rate to zero; the fine threshold must keep ~its share
    df = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 50 == 0, None).otherwise(
            (F.col("id") % 2).cast("string")
        ).alias("cluster"),
    )
    out = cluster_balanced_sample(df, "cluster", "doc_id", budget=40, salt="s")
    n = out.count()
    assert 10 <= n <= 90  # ~40 expected; 1/10000 rounding would give 0
    assert out.where(F.col("cluster").isNull()).count() == 0


def test_cluster_balanced_gate_high_cardinality(spark):
    """A document-level cluster_col must raise LOUDLY instead of
    collecting every distinct value to the driver (the quota table is
    driver-side; the gate is limit(cap+1) so the check itself is
    bounded)."""
    import pytest

    from fenix_spark.operators.sampling import cluster_balanced_sample

    df = spark.range(500).selectExpr("id AS doc_id", "id AS cluster")
    with pytest.raises(ValueError, match="distinct values"):
        cluster_balanced_sample(
            df, "cluster", "doc_id", budget=10, max_clusters=100
        )
    # at-or-under the cap still works
    coarse = spark.range(500).selectExpr("id AS doc_id", "id % 50 AS cluster")
    out = cluster_balanced_sample(
        coarse, "cluster", "doc_id", budget=100, max_clusters=100
    )
    assert out.count() > 0


# --------------------------------------------- epoch (upsampling) mixing


def test_temperature_rates_cap_backcompat_and_upsampling():
    from fenix_spark.operators.sampling import temperature_rates

    counts = [10_000, 100]
    # cap=1 (default) is byte-for-byte the old behavior
    assert temperature_rates(counts, 1e-9, 5000) == temperature_rates(
        counts, 1e-9, 5000, cap=1.0
    )
    # cap=4: the tiny source can now repeat — uniform shares want 2500
    # each; source 1 saturates at 4 epochs (400 rows), the remainder
    # water-fills source 0
    r = temperature_rates(counts, 1e-9, 5000, cap=4.0)
    assert r[1] == 4.0
    assert abs(r[0] * counts[0] - 4600) < 1.0
    # realized budget is conserved when feasible
    assert abs(sum(r_ * c for r_, c in zip(r, counts)) - 5000) < 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cap"):
        temperature_rates(counts, 1.0, 100, cap=0.5)


def test_epoch_repeat_full_epochs_are_complete_and_tagged(spark):
    from fenix_spark.operators.sampling import epoch_repeat

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = epoch_repeat(df, "doc_id", 2.3, salt="e").collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r["__epoch"], set()).add(r["doc_id"])
    # epochs 0 and 1 contain EVERY row exactly once
    assert by_epoch[0] == set(range(1000))
    assert by_epoch[1] == set(range(1000))
    # the fractional epoch holds ~30% of rows, a strict hash-subset
    assert 200 <= len(by_epoch[2]) <= 400
    assert by_epoch[2] < set(range(1000))
    assert set(by_epoch) == {0, 1, 2}
    # per-(epoch, id) uniqueness — the downstream dedup key
    assert len(out) == 2000 + len(by_epoch[2])


def test_epoch_repeat_is_deterministic_and_rate_le_1_degrades(spark):
    from fenix_spark.operators.sampling import deterministic_sample, epoch_repeat

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = sorted((r["doc_id"], r["__epoch"]) for r in epoch_repeat(df, "doc_id", 1.7, salt="s").collect())
    b = sorted((r["doc_id"], r["__epoch"]) for r in epoch_repeat(df, "doc_id", 1.7, salt="s").collect())
    assert a == b
    # rate <= 1: one fractional epoch, same subset law as
    # deterministic_sample under the epoch salt
    got = {r["doc_id"] for r in epoch_repeat(df, "doc_id", 0.4, salt="s").collect()}
    want = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.4, salt="s/ep0").collect()}
    assert got == want


def test_epoch_mixture_realizes_budget_with_upsampling(spark):
    from fenix_spark.operators.sampling import epoch_mixture

    a = spark.range(8000).select(F.col("id").alias("doc_id"))
    b = spark.range(300).select((F.col("id") + 100_000).alias("doc_id"))
    out = epoch_mixture([a, b], "doc_id", 1e-9, 4000, max_epochs=4.0, salt="m")
    rows = out.collect()
    per_source = {}
    for r in rows:
        per_source[r["__source"]] = per_source.get(r["__source"], 0) + 1
    # T→0 wants 2000 from each; source 1 (300 rows) upsamples — capped
    # at 4 epochs = 1200 rows, overflow water-fills source 0 to 2800
    assert abs(per_source[1] - 1200) < 2
    assert abs(per_source[0] - 2800) < 60  # hash-grid quantization
    # provenance columns present; (source, epoch, id) unique
    keys = {(r["__source"], r["__epoch"], r["doc_id"]) for r in rows}
    assert len(keys) == len(rows)


def test_epoch_mixture_is_shuffle_free(spark):
    """The whole mixing law — rates, epochs, fractional passes, the
    union — is scans only: zero exchanges at any scale."""
    from fenix_spark.operators.sampling import epoch_mixture
    from fenix_spark.plans import shuffle_count

    a = spark.range(1000).select(F.col("id").alias("doc_id"))
    b = spark.range(100).select((F.col("id") + 5000).alias("doc_id"))
    out = epoch_mixture([a, b], "doc_id", 0.5, 1500, counts=[1000, 100], max_epochs=3.0)
    assert shuffle_count(out) == 0


def test_epoch_repeat_duckdb_mirror(spark):
    """The module's oracle-checkability claim extended to upsampling:
    full epochs are generate_series in SQL, the fractional epoch is
    the same md5-bucket law as deterministic_sample — row-identical
    on both engines."""
    import duckdb

    from fenix_spark.functions.texthash import duck_hash60
    from fenix_spark.operators.sampling import _BUCKETS, epoch_repeat

    df = spark.range(800).select(F.col("id").alias("doc_id"))
    rate, salt = 2.3, "mir"
    got = sorted(
        (r["doc_id"], r["__epoch"])
        for r in epoch_repeat(df, "doc_id", rate, salt=salt).collect()
    )
    full, thresh = int(rate), int(round((rate - int(rate)) * _BUCKETS))
    h = duck_hash60(f"doc_id::VARCHAR || '{salt}/ep{full}'")
    want = duckdb.connect().execute(f"""
        WITH ids AS (SELECT range AS doc_id FROM range(800))
        SELECT doc_id, e.generate_series AS epoch
        FROM ids, generate_series(0, {full - 1}) e
        UNION ALL
        SELECT doc_id, {full} FROM ids WHERE ({h} % {_BUCKETS}) < {thresh}
        ORDER BY doc_id, epoch
    """).fetchall()
    assert got == [(d, e) for d, e in want]
