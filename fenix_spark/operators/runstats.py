"""RUNTIME execution stats — the dynamic complement to the static plan
linter (`plans/lint.py`): the linter reads the plan BEFORE it runs;
this module reads Spark's task-metrics store AFTER a job and reports
what actually happened — shuffle bytes moved, memory/disk spill, and
per-task skew (max vs median) for both duration and shuffle-read
bytes. "Measure, don't guess" as an operator: the numbers that decide
whether a 100 TB run needs salting, AQE skew-join, or a repartition
come from here, not from eyeballing a plan.

Reads ``AppStatusStore`` through the same JVM the session runs on —
works with the UI disabled (the store always exists), driver-side
only, summary-sized output (one row per stage). The store API is
Spark-internal; every access is guarded so a future signature change
degrades to a clear error, never a wrong number.

Scale shape: reading the store is O(stages) driver-side bookkeeping;
the monitored job itself is whatever it is. The skew report is the
100 TB operational loop: run the job once at a small SF, read
``skew_findings``, fix the plan (salt / broadcast / repartition),
re-run — instead of discovering the straggler at hour six.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "StageStats",
    "run_with_stats",
    "stage_snapshot",
    "stats_since",
    "skew_findings",
    "format_stats",
]

_QUANTILES = (0.5, 0.95, 1.0)


@dataclass
class StageStats:
    """One completed stage's actuals. Byte fields are totals across
    tasks; ``*_p50``/``*_max`` are per-task distribution points."""

    stage_id: int
    name: str
    tasks: int
    executor_run_ms: int
    shuffle_read_bytes: int
    shuffle_write_bytes: int
    input_bytes: int
    output_bytes: int
    spill_memory_bytes: int
    spill_disk_bytes: int
    duration_p50_ms: float
    duration_p95_ms: float
    duration_max_ms: float
    shuffle_read_p50: float
    shuffle_read_max: float

    @property
    def duration_skew(self) -> float:
        """max/median task duration — >~4 means one straggler owns the
        stage's wall clock."""
        return self.duration_max_ms / max(self.duration_p50_ms, 1.0)

    @property
    def shuffle_read_skew(self) -> float:
        """max/median per-task shuffle-read bytes; the byte-level skew
        AQE's compressed-size heuristic can miss (see SCALE.md on LSH
        hot buckets)."""
        return self.shuffle_read_max / max(self.shuffle_read_p50, 1.0)


def _store(spark: SparkSession):
    return spark.sparkContext._jsc.sc().statusStore()


def _stage_seq(spark: SparkSession):
    gw = spark.sparkContext._gateway
    empty_status = gw.jvm.java.util.ArrayList()
    empty_task = gw.jvm.java.util.ArrayList()
    no_quantiles = gw.new_array(gw.jvm.double, 0)
    # Spark 4 signature: stageList(statuses, details, withSummaries,
    # unsortedQuantiles, taskStatus)
    return _store(spark).stageList(
        empty_status, False, False, no_quantiles, empty_task
    )


def _completed_stage_ids(spark: SparkSession) -> set[int]:
    seq = _stage_seq(spark)
    return {seq.apply(i).stageId() for i in range(seq.size())}


def stage_snapshot(spark: SparkSession) -> set[int]:
    """Stage-id watermark for :func:`stats_since` — take one before a
    job, pass it back after, get only that job's stages. Lets callers
    that trigger execution through something other than a DataFrame
    method (``df.write.format("noop")``, streaming batches) use the
    same stats path as :func:`run_with_stats`."""
    return _completed_stage_ids(spark)


def stats_since(spark: SparkSession, before: set[int]) -> list["StageStats"]:
    """StageStats for every stage COMPLETED after ``before`` was taken
    (SKIPPED stages — reused exchanges — are excluded: they did no
    work this run)."""
    gw = spark.sparkContext._gateway
    store = _store(spark)
    qs = gw.new_array(gw.jvm.double, len(_QUANTILES))
    for i, q in enumerate(_QUANTILES):
        qs[i] = q
    out: list[StageStats] = []
    seq = _stage_seq(spark)
    for i in range(seq.size()):
        s = seq.apply(i)
        if s.stageId() in before or s.status().toString() != "COMPLETE":
            continue
        dur = (0.0, 0.0, 0.0)
        sr = (0.0, 0.0)
        opt = store.taskSummary(s.stageId(), s.attemptId(), qs)
        if opt.isDefined():
            tmd = opt.get()
            d = tmd.executorRunTime()
            dur = (d.apply(0), d.apply(1), d.apply(2))
            rb = tmd.shuffleReadMetrics().readBytes()
            sr = (rb.apply(0), rb.apply(2))
        out.append(
            StageStats(
                stage_id=s.stageId(),
                name=str(s.name()),
                tasks=int(s.numCompleteTasks()),
                executor_run_ms=int(s.executorRunTime()),
                shuffle_read_bytes=int(s.shuffleReadBytes()),
                shuffle_write_bytes=int(s.shuffleWriteBytes()),
                input_bytes=int(s.inputBytes()),
                output_bytes=int(s.outputBytes()),
                spill_memory_bytes=int(s.memoryBytesSpilled()),
                spill_disk_bytes=int(s.diskBytesSpilled()),
                duration_p50_ms=float(dur[0]),
                duration_p95_ms=float(dur[1]),
                duration_max_ms=float(dur[2]),
                shuffle_read_p50=float(sr[0]),
                shuffle_read_max=float(sr[1]),
            )
        )
    out.sort(key=lambda st: st.stage_id)
    return out


def run_with_stats(df: DataFrame, action: str = "count"):
    """Run ``df.<action>()`` and return ``(result, [StageStats])`` for
    the stages the job executed."""
    spark = df.sparkSession
    before = stage_snapshot(spark)
    result = getattr(df, action)()
    return result, stats_since(spark, before)


def skew_findings(
    stats: list[StageStats],
    duration_skew_threshold: float = 4.0,
    shuffle_skew_threshold: float = 4.0,
    min_stage_ms: int = 200,
    min_shuffle_bytes: int = 1 << 20,
) -> list[str]:
    """Actionable findings from a run's stage stats: stragglers
    (duration skew), hot shuffle partitions (byte skew), and any
    spill at all (spill = the partition didn't fit in executor memory
    — at 100 TB that stage thrashes). Small stages are ignored — skew
    on a 50 ms stage is scheduling noise, not a plan problem."""
    findings = []
    for st in stats:
        if (
            st.executor_run_ms >= min_stage_ms
            and st.tasks > 1
            and st.duration_skew >= duration_skew_threshold
        ):
            findings.append(
                f"stage {st.stage_id} ({st.name.splitlines()[0][:60]}): "
                f"straggler — max task {st.duration_max_ms:.0f}ms vs median "
                f"{st.duration_p50_ms:.0f}ms ({st.duration_skew:.1f}x); "
                "consider salting the key or AQE skew-join"
            )
        if (
            st.shuffle_read_bytes >= min_shuffle_bytes
            and st.tasks > 1
            and st.shuffle_read_skew >= shuffle_skew_threshold
        ):
            findings.append(
                f"stage {st.stage_id} ({st.name.splitlines()[0][:60]}): "
                f"hot shuffle partition — max task read "
                f"{st.shuffle_read_max:.0f}B vs median {st.shuffle_read_p50:.0f}B "
                f"({st.shuffle_read_skew:.1f}x of {st.shuffle_read_bytes}B total)"
            )
        if st.spill_disk_bytes > 0 or st.spill_memory_bytes > 0:
            findings.append(
                f"stage {st.stage_id} ({st.name.splitlines()[0][:60]}): "
                f"SPILLED {st.spill_memory_bytes}B mem / "
                f"{st.spill_disk_bytes}B disk — partitions exceed executor "
                "memory; raise spark.sql.shuffle.partitions or lower "
                "maxPartitionBytes"
            )
    return findings


def format_stats(stats: list[StageStats]) -> str:
    """One aligned text row per stage — the at-a-glance run report."""
    lines = [
        f"{'stage':>5}  {'tasks':>5}  {'run_ms':>8}  {'shuf_read':>10}  "
        f"{'shuf_write':>10}  {'spill':>8}  {'dskew':>6}  {'bskew':>6}  name"
    ]
    for st in stats:
        lines.append(
            f"{st.stage_id:>5}  {st.tasks:>5}  {st.executor_run_ms:>8}  "
            f"{st.shuffle_read_bytes:>10}  {st.shuffle_write_bytes:>10}  "
            f"{st.spill_disk_bytes:>8}  {st.duration_skew:>6.1f}  "
            f"{st.shuffle_read_skew:>6.1f}  {st.name.splitlines()[0][:50]}"
        )
    return "\n".join(lines)
