"""Catalog semantics (catalog.py), mirroring the reference's table
API invariants (/root/reference/src/fenix/io/table/table.py:9-56 and
tests/test_flight.py:42-50 round-trip exactness)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fenix_spark import catalog


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "store")


def _df(spark, n=20, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_make_load_roundtrip(spark, root):
    src = _df(spark)
    catalog.make(root, "t1", src)
    got = catalog.load(spark, root, "t1")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in src.collect()}


def test_multi_load_unions_by_name(spark, root):
    catalog.make(root, "a", _df(spark, 5))
    catalog.make(root, "b", _df(spark, 5, offset=100))
    got = catalog.load(spark, root, ["a", "b"])
    assert got.count() == 10
    assert set(got.columns) == {"k", "v"}


def test_list_and_drop(spark, root):
    catalog.make(root, "x", _df(spark))
    catalog.make(root, "y", _df(spark))
    assert list(catalog.list_tables(root)) == ["x", "y"]
    catalog.drop(root, "x")
    assert list(catalog.list_tables(root)) == ["y"]
    catalog.drop(root, "x")  # idempotent, like unlink+exists guard


def test_remove_whole_store(spark, root):
    catalog.make(root, "x", _df(spark))
    catalog.remove(root)
    assert not os.path.isdir(root)
    assert list(catalog.list_tables(root)) == []


def test_make_overwrites(spark, root):
    catalog.make(root, "t", _df(spark, 10))
    catalog.make(root, "t", _df(spark, 3, offset=50))
    assert catalog.load(spark, root, "t").count() == 3


def test_hstack_last_wins(spark):
    """Duplicate non-key columns resolve to the RIGHT side, matching
    the reference's dict-comprehension last-wins (table.py:39-40)."""
    left = spark.createDataFrame([(1, "l1", 10), (2, "l2", 20)], "k int, v string, only_l int")
    right = spark.createDataFrame([(1, "r1", 5), (2, "r2", 6)], "k int, v string, only_r int")
    out = catalog.hstack(left, right, "k")
    rows = {r["k"]: (r["v"], r["only_l"], r["only_r"]) for r in out.collect()}
    assert rows == {1: ("r1", 10, 5), 2: ("r2", 20, 6)}


def test_partitioned_make_prunes(spark, root):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("part")
    )
    catalog.make(root, "p", df, partition_by=["part"])
    got = catalog.load(spark, root, "p").where(F.col("part") == 2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert got.count() == 25


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based join strategies so bucket co-location (not
    a broadcast) is what eliminates the exchange."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_is_shuffle_free(spark, root, no_broadcast):
    """Two tables bucketed+sorted on the join key must sort-merge-join
    with ZERO exchanges AND zero sorts: the scan itself provides the
    partitioning and order. This is the co-location contract that makes
    fact-to-fact joins shuffle-free at 100 TB."""
    from fenix_spark.plans import shuffle_count

    catalog.make_bucketed(spark, root, "bl", _df(spark, 100), "k", buckets=8)
    catalog.make_bucketed(spark, root, "br", _df(spark, 60, offset=40), "k", buckets=8)
    left, right = catalog.load_bucketed(spark, "bl"), catalog.load_bucketed(spark, "br")
    joined = left.join(right.withColumnRenamed("v", "v2"), "k")
    assert shuffle_count(joined) == 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    rows = {r["k"] for r in joined.collect()}
    assert rows == set(range(40, 100))


def test_bucketed_groupby_is_shuffle_free(spark, root, no_broadcast):
    """Aggregation on the bucket key reuses the scan's partitioning —
    no exchange before the final agg."""
    from fenix_spark.plans import shuffle_count

    catalog.make_bucketed(spark, root, "bg", _df(spark, 100), "k", buckets=8)
    agg = catalog.load_bucketed(spark, "bg").groupBy("k").agg(F.sum("v").alias("s"))
    assert shuffle_count(agg) == 0
    assert agg.count() == 100


def test_bucketed_overwrite_and_load(spark, root):
    catalog.make_bucketed(spark, root, "bo", _df(spark, 10), "k", buckets=4)
    catalog.make_bucketed(spark, root, "bo", _df(spark, 3, offset=7), "k", buckets=4)
    got = catalog.load_bucketed(spark, "bo")
    assert {r["k"] for r in got.collect()} == {7, 8, 9}


def test_compact_merges_small_files_and_sorts(spark, root):
    """Many small ingest files → few size-targeted files; with sort_by,
    per-file key ranges are disjoint so min/max stats prune lookups."""
    from fenix_spark import manifest

    df = spark.range(10_000).select(F.col("id").alias("k"), F.rand(7).alias("v"))
    df.repartition(64).write.mode("overwrite").parquet(catalog.source_path(root, "c"))
    path = catalog.source_path(root, "c")
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before == 64
    catalog.compact(spark, root, "c", target_file_bytes=1 << 30, sort_by=["k"])
    live = manifest.resolve(path)  # compaction commits a manifest generation
    files = [f for f in os.listdir(live) if f.endswith(".parquet")]
    assert len(files) == 1
    back = catalog.load(spark, root, "c")
    assert back.count() == 10_000
    assert back.agg(F.sum("k")).head()[0] == sum(range(10_000))


def test_compact_range_partitions_are_disjoint(spark, root):
    import pyarrow.parquet as pq

    df = spark.range(50_000).select(F.col("id").alias("k"), F.lit("x" * 200).alias("pay"))
    df.repartition(32).write.mode("overwrite").parquet(catalog.source_path(root, "d"))
    path = catalog.source_path(root, "d")
    on_disk = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n = catalog.compact(spark, root, "d", target_file_bytes=on_disk // 4, sort_by=["k"])
    assert n >= 3
    from fenix_spark import manifest

    live = manifest.resolve(path)
    ranges = []
    for f in sorted(os.listdir(live)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(live, f))
        mins = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        maxs = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        ranges.append((mins, maxs))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint key ranges across files


def test_artifact_stamp_rebuilds_on_source_change(spark, tmp_path, monkeypatch):
    """Embeddings-content drift must invalidate committed codings/
    indexes (r03 drift class, data edition): same schema, different
    values → stamp mismatch → embeddings-derived artifact dirs wiped
    and rebuilt from the new data."""
    import os
    import shutil

    import fenix_spark.artifacts as A

    sf = str(tmp_path / "sfX")
    os.makedirs(sf)
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet", f"{sf}/embeddings.parquet")
    monkeypatch.setattr(A, "REPO_ROOT", str(tmp_path / "repo"))
    coding1, _ = A._ensure_artifacts(spark, sf)
    c1 = {(r["codebook"], r["cell"]): r["centroid"] for r in coding1.collect()}
    # same content again: no rebuild (stamp matches, _SUCCESS kept)
    marker = os.path.join(A.coding_path(sf), "_marker")
    open(marker, "w").close()
    A._ensure_artifacts(spark, sf)
    assert os.path.isfile(marker)
    # different content (half the rows): stamp mismatch → wipe + retrain
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf}/embeddings.parquet")
    pq.write_table(tbl.slice(0, tbl.num_rows // 2), f"{sf}/embeddings.parquet")
    coding2, _ = A._ensure_artifacts(spark, sf)
    assert not os.path.isfile(marker)
    c2 = {(r["codebook"], r["cell"]): r["centroid"] for r in coding2.collect()}
    assert c1 != c2  # retrained on the new distribution


def test_tune_session_idempotent_and_utc(spark):
    from fenix_spark.session import tune_session

    out = tune_session(spark)
    assert out is spark
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # safe to call repeatedly (the driver entry point does)
    tune_session(spark)


def test_recommend_confs_arithmetic():
    from fenix_spark.session import recommend_confs

    # 100 TB on 1000 executors × 4 cores, 16g each
    rec = recommend_confs(
        100 << 40, cores_total=4000, executor_mem_bytes=16 << 30,
        cores_per_executor=4, memory_safety=5,
    )
    width = int(rec["confs"]["spark.sql.shuffle.partitions"])
    # per-task budget 16g/4/5 ≈ 819 MiB → ~131k partitions, ×cores rounded
    assert 120_000 <= width <= 140_000
    assert width % 4000 == 0
    # tiny input floors at 2× cores
    small = recommend_confs(1 << 30, cores_total=32)
    assert int(small["confs"]["spark.sql.shuffle.partitions"]) == 64
    assert "rationale" in small and "spark.sql.shuffle.partitions" in small["rationale"]


def test_apply_confs(spark):
    from fenix_spark.session import apply_confs, recommend_confs

    before = spark.conf.get("spark.sql.shuffle.partitions")
    rec = recommend_confs(1 << 30, cores_total=16)
    apply_confs(spark, rec)
    assert spark.conf.get("spark.sql.shuffle.partitions") == rec["confs"]["spark.sql.shuffle.partitions"]
    # restore the session conf for the rest of the suite
    spark.conf.set("spark.sql.shuffle.partitions", before)


def test_catalog_bloom_index_lifecycle(spark, tmp_path):
    from pyspark.sql import functions as F

    from fenix_spark import catalog

    root = str(tmp_path / "cat")
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).repartition(4)
    catalog.make(root, "t", df)
    catalog.make_bloom_index(spark, root, "t", "k", m_bits=1 << 15)
    got = sorted(
        r.k for r in catalog.bloom_point_lookup(spark, root, "t", "k", [5, 3999]).collect()
    )
    assert got == [5, 3999]
    # geometry travels with the index: a lookup never needs m_bits/k
    # append new data through the catalog path and refresh the delta
    spark.range(10_000, 10_100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).coalesce(1).write.mode("append").parquet(catalog.source_path(root, "t"))
    catalog.refresh_bloom_index(spark, root, "t", "k")
    got = sorted(
        r.k
        for r in catalog.bloom_point_lookup(
            spark, root, "t", "k", [5, 10_050]
        ).collect()
    )
    assert got == [5, 10_050]
    # manifest commit leaves a clean state: geometry lives IN the
    # committed generation; the superseded one is retained one more
    # commit (vacuum's retention window for in-flight readers)
    import os as _os

    from fenix_spark import manifest

    p = catalog.bloom_index_path(root, "t", "k")
    live = manifest.resolve(p)
    assert _os.path.exists(_os.path.join(live, "_geometry.json"))
    cur = manifest.current_gen(p)
    assert manifest.list_gens(p) == [cur - 1, cur]
    # wrong column is loud
    import pytest as _pytest

    with _pytest.raises((ValueError, FileNotFoundError)):
        catalog.bloom_point_lookup(spark, root, "t", "v", [1])


def test_catalog_names_are_validated_as_path_segments():
    """check_name is the single chokepoint (source/coding/index paths
    all pass through it): traversal and separator names raise before
    any path is built."""
    import pytest as _pytest

    from fenix_spark.catalog import check_name, coding_path, index_path, source_path

    for ok in ("lineitem", "t1", "a.b-c_d", "X9"):
        assert check_name(ok) == ok
    for bad in ("../x", "/abs", "a/b", "a\\b",
                "..", ".", ".hidden", "", "a..b", "_gen-000001"):
        with _pytest.raises(ValueError, match="invalid catalog name"):
            check_name(bad)
    with _pytest.raises(ValueError):
        source_path("/root/store", "../../etc")
    with _pytest.raises(ValueError):
        coding_path("/root/store", "/etc")
    with _pytest.raises(ValueError):
        index_path("/root/store", "t", "col", "../c")
