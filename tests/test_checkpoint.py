"""The lineage-truncation knob (fenix_spark/checkpoint.py): every
operator that truncates lineage routes through ``truncate_lineage``,
which upgrades from executor-local checkpoints to RELIABLE checkpoints
(fault-tolerant storage, survives executor loss on a cluster) the
moment the session configures a checkpoint dir — with identical
results and an identically truncated plan in both modes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fenix_spark.checkpoint import checkpoint_eager, checkpoint_lazy, truncate_lineage


@pytest.fixture()
def ckpt_dir(spark, tmp_path):
    """Configure a reliable checkpoint dir for the test, then reset
    (SparkContext.setCheckpointDir(None) → Option(null) → unset), so
    the shared session leaves in local mode for every other test."""
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None, "expected local-mode session"
    d = str(tmp_path / "reliable_ckpt")
    sc.setCheckpointDir(d)
    yield d
    sc._jsc.sc().setCheckpointDir(None)
    assert sc.getCheckpointDir() is None


def _demo(spark):
    return (
        spark.range(0, 500)
        .withColumn("g", (F.col("id") % 7).cast("int"))
        .withColumn("v", F.col("id") * 3 + 1)
    )


def test_local_mode_truncates_without_config(spark):
    df = _demo(spark)
    out = truncate_lineage(df, eager=True)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan  # lineage replaced by the checkpoint RDD
    assert sorted(r["v"] for r in out.collect()) == sorted(
        r["v"] for r in df.collect()
    )


def test_reliable_mode_same_results_truncated_plan(spark, ckpt_dir):
    df = _demo(spark)
    out = truncate_lineage(df, eager=True)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan
    assert sorted(r["v"] for r in out.collect()) == sorted(
        r["v"] for r in df.collect()
    )
    # the blocks actually landed on the fault-tolerant dir — this is
    # the property executor-local checkpoints cannot give a cluster
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt_dir) for f in fs
    ]
    assert written, "reliable checkpoint wrote no files"


def test_transform_helpers_both_modes(spark, ckpt_dir):
    df = _demo(spark)
    lazy = df.transform(checkpoint_lazy)
    eager = df.transform(checkpoint_eager)
    want = sorted((r["g"], r["v"]) for r in df.collect())
    for out in (lazy, eager):
        assert sorted((r["g"], r["v"]) for r in out.collect()) == want


def test_operator_identical_under_reliable_mode(spark, tmp_path):
    """A real multi-consumer operator (winnow candidate pre-filter —
    three consumers over one checkpointed frame) returns the same rows
    in local and reliable mode."""
    from fenix_spark.operators.substring import winnow_candidate_ids

    dup = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        ("a", dup + "unique tail one two three"),
        ("b", "prefix words here " + dup),
        ("c", "no duplicated content in this document at all " * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    local = sorted(
        r["id"] for r in winnow_candidate_ids(df, "text", "doc_id", 20).collect()
    )
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "op_ckpt"))
    try:
        reliable = sorted(
            r["id"]
            for r in winnow_candidate_ids(df, "text", "doc_id", 20).collect()
        )
    finally:
        sc._jsc.sc().setCheckpointDir(None)
    assert local == reliable and "a" in local and "b" in local
