"""Z-order clustering (functions/zorder.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.functions.zorder import interleave_bits, zorder_key


def test_interleave_known_values(spark):
    # x=0b11, y=0b01 at 2 bits → bits: pos0=x0=1, pos1=y0=1, pos2=x1=1,
    # pos3=y1=0 → 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], "x int, y int")
    out = df.select(interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z"))
    assert out.first()["z"] == 7


def test_interleave_bit_budget_guard():
    with pytest.raises(ValueError, match="64-bit"):
        interleave_bits([F.lit(1)] * 7, bits=10)


def test_zorder_key_expression_only_after_stats(spark):
    df = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 1000).alias("b")
    )
    out = zorder_key(df, ["a", "b"], bits=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # key add itself is shuffle-free
    rows = out.collect()
    assert all(0 <= r["__zkey"] < (1 << 16) for r in rows)


def test_zorder_improves_multi_column_locality(spark, tmp_path):
    """The point of z-order: after sorting by __zkey, per-FILE min/max
    ranges are narrow for BOTH columns, so predicates on either prune
    files. Compare against a single-column sort where the second
    column's per-file ranges stay ~full-width."""
    import pyarrow.parquet as pq

    n, files = 4096, 16
    df = spark.range(n).select(
        (F.xxhash64("id") % 1000).alias("a"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("b"),
    )

    def file_span_frac(path, col):
        spans, lo_all, hi_all = [], None, None
        import glob as g

        for f in g.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            names = md.schema.names
            idx = names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append((lo, hi))
            lo_all = lo if lo_all is None else min(lo_all, lo)
            hi_all = hi if hi_all is None else max(hi_all, hi)
        width = hi_all - lo_all
        return sum(h - l for l, h in spans) / (len(spans) * width)

    zpath = str(tmp_path / "z")
    (
        zorder_key(df, ["a", "b"], bits=8)
        .repartitionByRange(files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.parquet(zpath)
    )
    apath = str(tmp_path / "a_only")
    df.repartitionByRange(files, "a").sortWithinPartitions("a").write.parquet(apath)

    # single-column sort: 'b' files span ~everything; z-order: both
    # columns' per-file spans shrink well below full width
    assert file_span_frac(apath, "b") > 0.8
    za, zb = file_span_frac(zpath, "a"), file_span_frac(zpath, "b")
    assert za < 0.5 and zb < 0.5, (za, zb)


def test_compact_zorder_by(spark, tmp_path):
    from fenix_spark import catalog
    from fenix_spark.catalog import compact

    root = str(tmp_path / "store")
    df = spark.range(2000).select(
        (F.xxhash64("id") % 100).alias("a"), (F.xxhash64("id", F.lit(2)) % 100).alias("b")
    )
    catalog.make(root, "t", df)
    n = compact(spark, root, "t", target_file_bytes=4 << 10, zorder_by=["a", "b"])
    back = catalog.load(spark, root, "t")  # resolves the manifest commit
    assert back.count() == 2000 and set(back.columns) == {"a", "b"}
    assert n >= 1
    with pytest.raises(ValueError, match="not both"):
        compact(spark, root, "t", sort_by=["a"], zorder_by=["b"])


def test_zorder_nan_rows_dont_collapse_clustering(spark):
    """A NaN row must not poison a column's (min, max): finite rows
    keep their spread; the NaN row lands in bucket 0."""
    df = spark.createDataFrame(
        [(float("nan"), 1.0)] + [(float(i), float(i)) for i in range(100)],
        "a double, b double",
    )
    out = zorder_key(df, ["a", "b"], bits=4)
    keys = {r["__zkey"] for r in out.collect()}
    assert len(keys) > 10  # clustering survives (collapse would give ~few keys)
