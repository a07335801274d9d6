"""Plan linter: each antipattern detector fires on a plan built to
contain it, the legitimate look-alikes stay quiet, and a healthy
parquet pipeline lints clean."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fenix_spark.plans.lint import assert_clean_plan, lint_plan


def _codes(df, **kw):
    return {f.code for f in lint_plan(df, **kw)}


def test_nested_loop_and_cartesian_flagged(spark):
    a = spark.range(10).withColumnRenamed("id", "x")
    b = spark.range(10).withColumnRenamed("id", "y")
    assert "nested-loop-join" in _codes(a.crossJoin(b))
    assert "nested-loop-join" in _codes(a.join(b, a.x < b.y))
    # true CartesianProduct: forbid the broadcast fallback
    big_a = a.hint("shuffle_replicate_nl")
    codes = _codes(big_a.crossJoin(b))
    assert "cartesian-product" in codes or "nested-loop-join" in codes


def test_row_udf_is_error_and_arrow_is_info(spark):
    df = spark.range(10)
    u = F.udf(lambda v: v + 1, "bigint")
    findings = {f.code: f.severity for f in lint_plan(df.select(u("id")))}
    assert findings.get("row-python-udf") == "error"

    @F.pandas_udf("bigint")
    def pu(s: pd.Series) -> pd.Series:
        return s + 1

    findings = {f.code: f.severity for f in lint_plan(df.select(pu("id")))}
    assert "row-python-udf" not in findings
    assert findings.get("arrow-python") == "info"


def test_global_window_flagged_but_grand_agg_is_not(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 7)
    no_part = df.withColumn("rn", F.row_number().over(Window.orderBy("v")))
    assert "single-partition-exchange" in _codes(no_part)
    # the legitimate SinglePartition: final reduce of a partial agg
    grand = df.agg(F.sum("v").alias("s"))
    assert "single-partition-exchange" not in _codes(grand)
    # and a keyed window is fine
    keyed = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("v").orderBy("id"))
    )
    assert "single-partition-exchange" not in _codes(keyed)


def test_unpushed_filter_flagged_pushed_filter_quiet(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pushed = docs.where(F.col("n_chars") > 100)
    assert "filter-not-pushed" not in _codes(pushed)
    unpushable = docs.where(F.length(F.col("text")) % 97 == 3)
    assert "filter-not-pushed" in _codes(unpushable)


def test_rdd_scan_is_info(spark):
    df = spark.createDataFrame([(1,)], "x bigint")
    findings = {f.code: f.severity for f in lint_plan(df.select("x"))}
    assert findings.get("rdd-scan") == "info"


def test_healthy_pipeline_lints_clean(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    small = docs.groupBy("source").agg(F.count("*").alias("n"))
    q = (
        docs.where(F.col("n_chars") > 50)
        .join(F.broadcast(small), "source")
        .groupBy("lang")
        .agg(F.sum("n_chars").alias("chars"), F.max("n").alias("m"))
    )
    leftover = assert_clean_plan(q)  # no warn/error findings
    assert all(f.severity == "info" for f in leftover)


def test_assert_clean_plan_raises_with_findings_listed(spark):
    a = spark.range(5).withColumnRenamed("id", "x")
    b = spark.range(5).withColumnRenamed("id", "y")
    with pytest.raises(AssertionError, match="nested-loop-join"):
        assert_clean_plan(a.crossJoin(b))
    # the ignore list turns a deliberate broadcast cross join green
    assert_clean_plan(a.crossJoin(b), allow=("nested-loop-join",))


def test_suite_flagship_queries_lint_clean(spark, sf_dir):
    """The linter applied to the repo's own headline queries — the
    deliberate exceptions are allowed by name, everything else must
    be free of warn+ findings."""
    from fenix_spark.suite import SPARK_QUERIES

    for name in ("tpch_q1", "markov_transitions", "exact_dedup", "sessionize"):
        df = SPARK_QUERIES[name](spark, sf_dir)
        assert_clean_plan(df)


# Per-query allowances for the full-suite sweep, each with the reason
# the finding is deliberate. Everything NOT listed must lint clean at
# warn+ — a new shuffle-side regression in any of the 50 oracle
# queries turns this test red.
_SUITE_ALLOW = {
    # 1-row broadcast cross joins (corpus size N / query shingles into
    # a summary frame) — BuildRight over literally one row
    "tfidf_top_terms": ("nested-loop-join",),
    "heavy_hitters": ("nested-loop-join",),  # 1-row count_floor broadcast
    # deterministic md5 hash-bucket sampling: the predicate is the
    # sample definition; parquet cannot evaluate md5
    "curation_stats": ("filter-not-pushed",),
    "decontamination": ("filter-not-pushed",),  # doc_id % 29 sample
    "drift_psi": ("filter-not-pushed",),  # doc_id % 2 ref/cur split
    "epoch_sample": ("filter-not-pushed",),  # fractional-epoch md5 bucket
    # computed-column predicates evaluated over the scanned column
    # (LSH band hash over the embedding array; token-count gates over
    # text): structurally unpushable, filter-at-scan is the right plan
    "lsh_ann_search": ("filter-not-pushed",),
    "substring_dedup": ("filter-not-pushed",),
    # the validity gate is the cheap equivalent scan regex
    # (text RLIKE [\p{L}\p{N}] ⟺ w>0 AND s>0); rlike cannot be
    # evaluated by parquet, filter-at-scan is the right plan
    "readability_scores": ("filter-not-pushed",),
}


def test_all_fifty_suite_queries_lint_clean(spark, sf_dir):
    """The linter over the ENTIRE oracle suite: every query is free of
    warn+ findings except the documented allowances above."""
    from fenix_spark.suite import SPARK_QUERIES

    failures = []
    for name, fn in SPARK_QUERIES.items():
        try:
            assert_clean_plan(fn(spark, sf_dir), allow=_SUITE_ALLOW.get(name, ()))
        except AssertionError as e:
            failures.append(f"{name}: {str(e).splitlines()[0]}")
    assert not failures, "\n".join(failures)
