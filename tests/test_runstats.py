"""Runtime execution stats (operators/runstats.py): the dynamic
complement to the static plan linter. Proof bar: the reported numbers
must match ground truth the test CONTROLS — a shuffle job reports
write≈read bytes on the right stages; a single-hot-key shuffle shows
byte skew the uniform twin doesn't; result pass-through is exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from fenix_spark.operators.runstats import (
    format_stats,
    run_with_stats,
    skew_findings,
)


def test_shuffle_job_reports_bytes_and_result(spark):
    df = (
        spark.range(0, 200_000)
        .withColumn("k", F.col("id") % 100)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    result, stats = run_with_stats(df, "count")
    assert result == 100
    assert stats, "job must produce completed stages"
    wrote = [s for s in stats if s.shuffle_write_bytes > 0]
    read = [s for s in stats if s.shuffle_read_bytes > 0]
    assert wrote and read, format_stats(stats)
    # conservation: total written == total read (one exchange)
    assert sum(s.shuffle_write_bytes for s in stats) == sum(
        s.shuffle_read_bytes for s in stats
    )
    # map side counted all its tasks
    assert all(s.tasks >= 1 for s in stats)


def test_skipped_stages_excluded_on_rerun(spark):
    df = (
        spark.range(0, 50_000)
        .withColumn("k", F.col("id") % 10)
        .groupBy("k")
        .count()
    )
    _, first = run_with_stats(df, "count")
    _, second = run_with_stats(df, "count")
    # second run may reuse the exchange (skipped map stage) but must
    # never re-report the FIRST run's stage ids
    first_ids = {s.stage_id for s in first}
    assert not first_ids & {s.stage_id for s in second}


def test_hot_key_shows_byte_skew_uniform_does_not(spark):
    """A full-row shuffle (repartition by key — no partial agg to
    collapse the data) with ONE hot key puts everything in one of 32
    reduce tasks; the same job with uniform keys balances. AQE is
    pinned off for the job so its small-partition coalescing doesn't
    merge the empty tasks away (exactly what happens at a real SF
    where partitions are too big to coalesce)."""
    n = 400_000
    payload = F.concat(F.lit("x" * 40), F.col("id").cast("string"))
    before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        hot = (
            spark.range(0, n)
            .select(F.lit(7).alias("k"), payload.alias("p"))
            .repartition(32, "k")
            .agg(F.sum(F.length("p")).alias("bytes"))
        )
        _, hot_stats = run_with_stats(hot, "count")
        hot_skews = [
            s.shuffle_read_skew
            for s in hot_stats
            if s.shuffle_read_bytes > 0 and s.tasks > 1
        ]
        assert hot_skews and max(hot_skews) >= 4.0, format_stats(hot_stats)
        hot_findings = skew_findings(
            hot_stats, min_shuffle_bytes=1024, min_stage_ms=0
        )
        assert any("hot shuffle partition" in f for f in hot_findings)

        uniform = (
            spark.range(0, n)
            .select((F.col("id") % 32).alias("k"), payload.alias("p"))
            .repartition(32, "k")
            .agg(F.sum(F.length("p")).alias("bytes"))
        )
        _, uni_stats = run_with_stats(uniform, "count")
        uni_findings = skew_findings(
            uni_stats, min_shuffle_bytes=1024, min_stage_ms=0
        )
        assert not any(
            "hot shuffle partition" in f for f in uni_findings
        ), format_stats(uni_stats)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)


def test_format_stats_one_line_per_stage(spark):
    df = spark.range(0, 1000).groupBy((F.col("id") % 5).alias("k")).count()
    _, stats = run_with_stats(df, "count")
    text = format_stats(stats)
    assert len(text.splitlines()) == len(stats) + 1  # header + rows
