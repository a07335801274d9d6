"""File-level Bloom index: exact-equality with the full-scan filter,
measured file skipping, soundness under false positives, persistence
round trip, and the null/empty contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.sources.file_bloom import (
    build_file_bloom,
    candidate_files,
    point_lookup,
)


@pytest.fixture(scope="module")
def dataset(spark, tmp_path_factory):
    """8 files, ids partitioned in known 1000-wide ranges per file."""
    p = str(tmp_path_factory.mktemp("fb") / "t")
    for i in range(8):
        spark.range(i * 1000, (i + 1) * 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).coalesce(1).write.mode("append").parquet(p)
    return p


def test_point_lookup_equals_full_scan(spark, dataset):
    idx = build_file_bloom(spark, dataset, "k")
    probes = [5, 4321, 7999]
    got = sorted(
        (r.k, r.v) for r in point_lookup(spark, dataset, "k", probes, idx).collect()
    )
    want = sorted(
        (r.k, r.v)
        for r in spark.read.parquet(dataset)
        .where(F.col("k").isin(probes))
        .collect()
    )
    assert got == want == [(5, 10), (4321, 8642), (7999, 15998)]


def test_lookup_skips_most_files(spark, dataset):
    idx = build_file_bloom(spark, dataset, "k")
    cand = candidate_files(idx, [4321]).collect()
    # the value lives in exactly one file; fp may add a couple more,
    # but 16 KB filters over 1000 distinct values sit far below 1% fp
    assert 1 <= len(cand) <= 2
    # absent value: sound to return nothing (or rare fp files only)
    missing = candidate_files(idx, [999_999]).collect()
    assert len(missing) <= 1


def test_typed_probes_no_false_negatives(spark, tmp_path):
    """The index hashes Spark's cast('string') of the column; probes
    must hash the SAME rendering. Python str() differs for floats
    ('1e+20' vs Spark '1.0E20') and booleans ('True' vs 'true') — the
    probe frame is built typed so Spark does the cast, and point_lookup
    compares typed. A rendering mismatch would be a silent false
    negative, violating the module's soundness claim."""
    p = str(tmp_path / "t")
    rows = [(1, 1e20, True), (2, 0.5, False), (3, -3.25, True)]
    spark.createDataFrame(
        rows, "id int, f double, b boolean"
    ).coalesce(1).write.parquet(p)

    idx_f = build_file_bloom(spark, p, "f")
    assert candidate_files(idx_f, [1e20]).count() >= 1
    got = point_lookup(spark, p, "f", [1e20, -3.25], idx_f).collect()
    assert sorted(r.id for r in got) == [1, 3]

    idx_b = build_file_bloom(spark, p, "b")
    assert candidate_files(idx_b, [True]).count() >= 1
    got_b = point_lookup(spark, p, "b", [True], idx_b).collect()
    assert sorted(r.id for r in got_b) == [1, 3]


def test_soundness_under_forced_false_positives(spark, dataset):
    # a tiny filter (256 bits for 1000 values/file) saturates → every
    # file becomes a candidate, and results are STILL exact
    idx = build_file_bloom(spark, dataset, "k", m_bits=256, k=3)
    cand = candidate_files(idx, [4321], m_bits=256, k=3).collect()
    assert len(cand) == 8  # saturated: no skipping...
    got = point_lookup(spark, dataset, "k", [4321], idx, m_bits=256, k=3).collect()
    assert [(r.k, r.v) for r in got] == [(4321, 8642)]  # ...but exact


def test_index_persists_through_parquet(spark, dataset, tmp_path):
    idx = build_file_bloom(spark, dataset, "k")
    ip = str(tmp_path / "idx")
    idx.write.parquet(ip)
    idx2 = spark.read.parquet(ip)
    a = sorted((r.value, r.file) for r in candidate_files(idx, [77, 6543]).collect())
    b = sorted((r.value, r.file) for r in candidate_files(idx2, [77, 6543]).collect())
    assert a == b


def test_absent_value_returns_empty_with_schema(spark, dataset):
    idx = build_file_bloom(spark, dataset, "k")
    out = point_lookup(spark, dataset, "k", [123_456_789], idx)
    assert out.columns == ["k", "v"]
    assert out.count() == 0


def test_validation_contracts(spark, dataset):
    idx = build_file_bloom(spark, dataset, "k")
    with pytest.raises(ValueError, match="non-empty"):
        candidate_files(idx, [])
    with pytest.raises(ValueError, match="NULL"):
        candidate_files(idx, [1, None])


def test_append_indexes_only_new_files(spark, dataset, tmp_path):
    from pyspark.sql import functions as F

    from fenix_spark.sources.file_bloom import append_file_bloom

    # copy the dataset so appends don't pollute the shared fixture
    p = str(tmp_path / "grow")
    spark.read.parquet(dataset).write.parquet(p)
    idx = build_file_bloom(spark, p, "k")
    n_before = idx.select("file").distinct().count()
    # no new files → the index comes back as-is
    same = append_file_bloom(spark, idx, p, "k")
    assert same.count() == idx.count()
    # append a new file with fresh keys, extend, and find them
    spark.range(50_000, 51_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("append").parquet(p)
    idx2 = append_file_bloom(spark, idx, p, "k")
    assert idx2.select("file").distinct().count() == n_before + 1
    got = point_lookup(spark, p, "k", [50_123, 42], idx2).collect()
    assert sorted((r.k, r.v) for r in got) == [(42, 84), (50_123, 100_246)]
    # old rows untouched: the original files' words are byte-identical
    a = sorted(map(tuple, idx.collect()))
    b = sorted(
        map(tuple, idx2.join(idx.select("file").distinct(), "file").collect())
    )
    assert a == b
