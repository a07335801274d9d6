"""Parquet footer stats + pruning audit (sources/parquet_stats.py)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fenix_spark.sources.parquet_stats import (
    pruning_fraction,
    pruning_report,
    rowgroup_stats,
)


def _strip(f: str) -> str:
    return f[len("file:") :] if f.startswith("file:") else f


def test_stats_match_pyarrow_footers(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(0, 10_000).withColumn(
        "v", (F.col("id") * 7 % 100).cast("double")
    ).repartition(4).write.parquet(p)
    rows = rowgroup_stats(spark, p, columns=["v"]).collect()
    assert rows
    for r in rows:
        md = pq.ParquetFile(_strip(r["file"])).metadata
        rg = md.row_group(r["rg"])
        col = next(
            rg.column(i)
            for i in range(rg.num_columns)
            if rg.column(i).path_in_schema == "v"
        )
        assert r["n_rows"] == rg.num_rows
        assert r["min_num"] == pytest.approx(float(col.statistics.min))
        assert r["max_num"] == pytest.approx(float(col.statistics.max))


def test_skip_decisions_are_sound_exhaustively(spark, tmp_path):
    """Every row group marked skippable PROVABLY contains no matching
    row — read each one back and check."""
    import pyarrow.compute as pc

    p = str(tmp_path / "t2")
    spark.range(0, 50_000).withColumn(
        "v", F.col("id").cast("double")
    ).orderBy("v").write.parquet(p)
    lo, hi = 10_000.0, 12_000.0
    stats = rowgroup_stats(spark, p, columns=["v"]).collect()
    rep = {r["file"]: r for r in pruning_report(spark, p, "v", lo, hi).collect()}
    total = sum(r["n_rows"] for r in rep.values())
    assert total == 50_000
    # exhaustive soundness: per-rg re-derive the skip flag and verify
    for s in stats:
        skip = s["has_stats"] and (s["max_num"] < lo or s["min_num"] > hi)
        if skip:
            tbl = pq.ParquetFile(_strip(s["file"])).read_row_group(
                s["rg"], columns=["v"]
            )
            inside = pc.sum(
                pc.and_(
                    pc.greater_equal(tbl["v"], lo),
                    pc.less_equal(tbl["v"], hi),
                )
            ).as_py()
            assert not inside, (s["file"], s["rg"])


def test_layout_determines_pruning_fraction(spark, tmp_path):
    """The point of the tool: identical data, three layouts — sorted
    prunes nearly everything for a narrow range, shuffled prunes
    nothing."""
    n = 100_000
    base = spark.range(0, n).withColumn(
        "v", (F.xxhash64("id") % 1000 + 1000) % 1000
    )
    sorted_p = str(tmp_path / "sorted")
    shuffled_p = str(tmp_path / "shuffled")
    base.repartitionByRange(8, "v").sortWithinPartitions("v").write.parquet(
        sorted_p
    )
    base.repartition(8).write.parquet(shuffled_p)
    lo, hi = 100, 150
    f_sorted = pruning_fraction(pruning_report(spark, sorted_p, "v", lo, hi))
    f_shuffled = pruning_fraction(
        pruning_report(spark, shuffled_p, "v", lo, hi)
    )
    assert f_sorted > 0.7
    assert f_shuffled < 0.05
    # and the skipped fraction is consistent with the true selectivity:
    # unskipped rows must cover all matches
    true_matches = base.where((F.col("v") >= lo) & (F.col("v") <= hi)).count()
    rep = pruning_report(spark, sorted_p, "v", lo, hi)
    unskipped = rep.agg(
        F.sum(F.col("n_rows") - F.col("rows_skippable"))
    ).head()[0]
    assert unskipped >= true_matches


def test_string_predicate_lexicographic(spark, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "t3")
    os.makedirs(p)
    # one file per letter, written deterministically (pyarrow, driver
    # side — six sequential Spark coalesce(1) writes cost ~20 s of
    # pure job latency for the same six files; repartitionByRange
    # SAMPLES its boundaries, which can straddle the 'c' region across
    # several files and make the skippable fraction layout-dependent)
    for c in "abcdef":
        pq.write_table(
            pa.table({"s": [f"{c}{i:03d}" for i in range(500)]}),
            os.path.join(p, f"part-{c}.parquet"),
        )
    rep = pruning_report(spark, p, "s", "c", "c~")
    frac = pruning_fraction(rep)
    assert frac > 0.8  # the five non-'c' files provably skipped
    # soundness: unskipped region contains every 'c*' row
    total_c = 500
    unskipped = rep.agg(
        F.sum(F.col("n_rows") - F.col("rows_skippable"))
    ).head()[0]
    assert unskipped >= total_c


def test_zorder_compact_improves_two_column_pruning(spark, tmp_path):
    """Close the loop with catalog.compact(zorder_by=...): after a
    z-order rewrite, BOTH columns prune; row-major sorted data prunes
    only its leading column."""
    from fenix_spark import catalog

    n = 60_000
    rng = np.random.default_rng(3)
    rows = [
        (int(x), int(y)) for x, y in rng.integers(0, 1000, size=(n, 2))
    ]
    df = spark.createDataFrame(rows, "x long, y long")
    root = str(tmp_path / "store")
    catalog.make(root, "t", df)
    catalog.compact(
        spark, root, "t", target_file_bytes=16 << 10, zorder_by=["x", "y"]
    )
    from fenix_spark import manifest

    path = manifest.resolve(catalog.source_path(root, "t"))
    f_x = pruning_fraction(pruning_report(spark, path, "x", 0, 60))
    f_y = pruning_fraction(pruning_report(spark, path, "y", 0, 60))
    # z-order gives BOTH dimensions real pruning power
    assert f_x > 0.4, f_x
    assert f_y > 0.4, f_y


def test_compaction_report_flags_fragmented_layout(spark, tmp_path):
    from fenix_spark.sources.parquet_stats import compaction_report

    frag = str(tmp_path / "frag")
    spark.range(0, 50_000).repartition(64).write.parquet(frag)
    rep = compaction_report(spark, frag, target_file_bytes=1 << 20)
    assert rep["n_files"] == 64
    assert rep["total_rows"] == 50_000
    assert rep["small_file_frac"] > 0.9
    assert rep["compaction_recommended"]
    assert rep["recommended_files"] < rep["n_files"]

    healthy = str(tmp_path / "ok")
    spark.range(0, 50_000).coalesce(1).write.parquet(healthy)
    rep2 = compaction_report(spark, healthy, target_file_bytes=1 << 20)
    assert rep2["n_files"] == 1
    assert not rep2["compaction_recommended"]

    with pytest.raises(Exception):
        compaction_report(spark, str(tmp_path / "missing"))
