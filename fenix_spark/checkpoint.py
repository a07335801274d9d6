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


# sizeInBytes beyond this is provably garbage: a real relation is
# < 2^63 bytes, so even the product of TWO real sizes (what one join's
# size estimate degrades to) stays under 10^38. Only *compounded*
# join-of-join estimates exceed it.
_GARBAGE_STATS_BOUND = 10**40


def _clamp_garbage_stats(df: DataFrame) -> DataFrame:
    """Re-wrap a checkpointed frame whose inherited ``sizeInBytes``
    statistic is astronomically large.

    ``localCheckpoint``/``checkpoint`` preserve the ORIGIN plan's
    statistics on the resulting ``LogicalRDD``. Spark's size-only
    estimator MULTIPLIES child sizes at a join, so in an iterative
    operator (PageRank, HITS, connected components) the checkpointed
    stat compounds round over round — the digit count of the BigInt
    doubles per round and planning time explodes (measured: HITS
    round cost doubling from round ~14, a driver thread pegged in
    ``BigInteger.multiply``; 95 digits after ONE round).

    The clamp fires only above ``_GARBAGE_STATS_BOUND``, where the
    stat is already far past any broadcast/build-side threshold, so
    re-wrapping (which resets sizeInBytes to
    ``spark.sql.defaultSizeInBytes``) cannot change a planning
    decision that a sane estimate would have made. The wrapped RDD is
    the checkpointed one, so lineage stays truncated and lazy
    materialization semantics are unchanged."""
    try:
        jqe = df._jdf.queryExecution()
        size = jqe.optimizedPlan().stats().sizeInBytes()
        if size <= _GARBAGE_STATS_BOUND:
            return df
        jspark = df.sparkSession._jsparkSession
        new_jdf = jspark.internalCreateDataFrame(
            jqe.toRdd(), jqe.analyzed().schema(), False
        )
        return DataFrame(new_jdf, df.sparkSession)
    except Exception:  # pragma: no cover - internal-API drift safety net
        return df


def truncate_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint`` when the
    session has a checkpoint dir configured, else ``localCheckpoint``.

    ``eager=False`` defers materialization to first use (the common
    case: the frame feeds several downstream actions and whichever
    runs first pays the cost); ``eager=True`` materializes now (needed
    when the INPUT is about to disappear, e.g. a tmp dir removed)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return _clamp_garbage_stats(df.checkpoint(eager=eager))
    return _clamp_garbage_stats(df.localCheckpoint(eager=eager))


def checkpoint_lazy(df: DataFrame) -> DataFrame:
    """``transform``-ready lazy truncation point."""
    return truncate_lineage(df, eager=False)


def checkpoint_eager(df: DataFrame) -> DataFrame:
    """``transform``-ready eager truncation point."""
    return truncate_lineage(df, eager=True)
