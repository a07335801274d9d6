"""Lineage truncation with a cluster-reliability knob.

Several operators materialize an intermediate frame that feeds multiple
consumers or an iterative loop (connected components, PageRank, minhash
band joins, DSIR's fit tables, winnow's per-doc anchors) and truncate
its lineage so the plan upstream runs once and loops don't compound.

``localCheckpoint`` is the right default on a workstation — no
configuration, no extra copies — but its blocks live on EXECUTOR
storage: on a 1000-executor cluster, losing one executor makes the
truncated lineage unreplayable and kills the job instead of recomputing
(Spark's own docs flag this). A RELIABLE checkpoint writes the blocks
to the fault-tolerant checkpoint dir (HDFS/S3A) instead, trading one
distributed write for survivable lineage.

``truncate_lineage`` picks automatically: if the session has a
checkpoint dir configured (``spark.sparkContext.setCheckpointDir(
"hdfs://.../ckpt")`` — the standard cluster-job preamble), every
truncation site in the package becomes a reliable checkpoint; otherwise
it stays local. One knob, zero per-operator plumbing. Both modes
produce identical results and an identically truncated logical plan —
pinned in tests/test_checkpoint.py.

Use via ``df.transform(checkpoint_lazy)`` / ``df.transform(
checkpoint_eager)`` so call sites stay postfix-chainable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["truncate_lineage", "checkpoint_lazy", "checkpoint_eager"]


def truncate_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint`` when the
    session has a checkpoint dir configured, else ``localCheckpoint``.

    ``eager=False`` defers materialization to first use (the common
    case: the frame feeds several downstream actions and whichever
    runs first pays the cost); ``eager=True`` materializes now (needed
    when the INPUT is about to disappear, e.g. a tmp dir removed)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def checkpoint_lazy(df: DataFrame) -> DataFrame:
    """``transform``-ready lazy truncation point."""
    return truncate_lineage(df, eager=False)


def checkpoint_eager(df: DataFrame) -> DataFrame:
    """``transform``-ready eager truncation point."""
    return truncate_lineage(df, eager=True)
