"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` but every setting here
is chosen to also hold on a 1000-executor cluster:

- AQE on: runtime coalescing of shuffle partitions and skew-join
  splitting replace hand-tuned partition counts at 100 TB.
- Arrow execution on: pandas UDFs (the only Python that ever touches
  data) move batches, not rows.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle and are cluster-location independent.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "fenix_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 2)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # The dedup band self-joins (minhash/simhash LSH) are always
        # followed by a distinct — a downstream shuffle that makes the
        # default OptimizeSkewedJoin bail out (it refuses to split when
        # the join's output partitioning is consumed). The distinct
        # reshuffles on (id_l, id_r) regardless, so forcing the split
        # costs nothing extra and keeps a boilerplate-heavy hot bucket
        # from serializing one task (tests/test_dedup.py skew proofs).
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply fenix_spark runtime confs to an externally created session
    (the driver hands us its own SparkSession in ``__spark_entry__``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.adaptive.forceOptimizeSkewedJoin", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception as exc:  # noqa: BLE001
            # immutable on some deployments; defaults are acceptable —
            # but log which conf was refused so driver-environment
            # differences are triageable (ADVICE/housekeeping r5)
            logging.getLogger(__name__).debug(
                "tune_session: conf %s=%s refused: %s", k, v, exc
            )
    return spark


def recommend_confs(
    input_bytes: int,
    cores_total: int = 32,
    executor_mem_bytes: int = 4 << 30,
    cores_per_executor: int = 4,
    target_partition_bytes: int = 128 << 20,
    shuffle_amplification: float = 1.0,
    memory_safety: int = 5,
) -> dict:
    """Spill-aware sizing for a dataset of ``input_bytes`` — the
    arithmetic behind "set shuffle.partitions so a partition fits in
    memory", written down once instead of re-derived per incident:

    - scan parallelism: ``maxPartitionBytes`` stays at the 128 MiB
      sweet spot (row-group aligned); the file source yields
      ``input/128MiB`` splits on its own, no conf needed.
    - shuffle width: a shuffle task must hold ~its partition
      deserialized (×2-8 expansion off parquet; ``memory_safety``
      covers expansion + execution overhead). Budget per task =
      ``executor_mem / cores_per_executor / memory_safety``; width =
      shuffled bytes / budget, rounded UP to a multiple of
      ``cores_total`` (full final waves), floored at 2×cores.
      ``shuffle_amplification`` scales for plans that shuffle more
      than they scan (self-joins) or less (pre-aggregations — but
      leave 1.0 unless measured: AQE coalesces over-partitioning
      cheaply, under-partitioning spills).
    - AQE advisory size: 64 MiB post-shuffle targets keep coalesced
      partitions task-sized without re-fragmenting.

    Returns {conf: value} plus a ``rationale`` map; apply with
    ``apply_confs``. At 100 TB / 1000 executors × 4 cores this lands
    ~200k shuffle partitions — the scale where the default 200 means
    500 GB per task and certain death."""
    import math

    shuffled = int(input_bytes * shuffle_amplification)
    per_task_budget = max(1, executor_mem_bytes // cores_per_executor // memory_safety)
    width = max(2 * cores_total, math.ceil(shuffled / per_task_budget))
    width = math.ceil(width / cores_total) * cores_total
    confs = {
        "spark.sql.shuffle.partitions": str(width),
        "spark.sql.files.maxPartitionBytes": str(target_partition_bytes),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 << 20),
        "spark.sql.adaptive.skewJoin.enabled": "true",
    }
    rationale = {
        "spark.sql.shuffle.partitions": (
            f"{shuffled / 2**40:.1f} TiB shuffled / "
            f"{per_task_budget / 2**20:.0f} MiB per-task budget "
            f"(mem {executor_mem_bytes / 2**30:.0f}g ÷ {cores_per_executor} cores "
            f"÷ safety {memory_safety}), rounded to ×{cores_total} cores"
        ),
        "spark.sql.files.maxPartitionBytes": "128 MiB row-group-aligned scan splits",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64 MiB post-shuffle coalesce target",
    }
    return {"confs": confs, "rationale": rationale}


def apply_confs(spark: SparkSession, rec: dict) -> SparkSession:
    for k, v in rec["confs"].items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:  # noqa: BLE001 - immutable conf here
            logging.getLogger(__name__).debug(
                "apply_confs: conf %s=%s refused: %s", k, v, exc
            )
    return spark


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship the ``fenix_spark`` package to executor Python workers via
    ``addPyFile`` — idempotent per session.

    Why: Arrow-batched closures that reference module-level helpers
    (e.g. the KLL builder in operators/sketches.py) pickle those
    helpers BY MODULE REFERENCE, so the worker interpreter must be
    able to ``import fenix_spark``. Our own sessions run with the repo
    as cwd and never notice; a FOREIGN session (the correctness
    driver, a user's Flight server launched from another directory, a
    real multi-machine cluster) has no such guarantee — this is the
    standard Spark mechanism for it, and on a 1000-executor cluster
    it is how the package gets there at all. The zip is rebuilt at
    most once per driver process (mtime-checked), ~100s of KB of .py
    sources."""
    sc = spark.sparkContext
    includes = getattr(sc, "_python_includes", None) or []
    if any("fenix_spark_pkg" in str(inc) for inc in includes):
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    out = os.path.join(
        tempfile.gettempdir(), f"fenix_spark_pkg-{os.getuid()}.zip"
    )
    newest = max(
        (
            os.path.getmtime(os.path.join(d, f))
            for d, _, fs in os.walk(pkg_dir)
            for f in fs
            if f.endswith(".py")
        ),
        default=0.0,
    )
    if not os.path.exists(out) or os.path.getmtime(out) < newest:
        # unique temp name per writer: two concurrent driver processes
        # under one uid must not interleave into the same .tmp sibling
        # and os.replace a corrupted zip into place
        fd, tmp = tempfile.mkstemp(
            prefix="fenix_spark_pkg-", suffix=".zip.tmp",
            dir=os.path.dirname(out),
        )
        try:
            with os.fdopen(fd, "wb") as fh, zipfile.ZipFile(fh, "w") as z:
                for d, _, fs in os.walk(pkg_dir):
                    for f in sorted(fs):
                        if f.endswith(".py"):
                            full = os.path.join(d, f)
                            z.write(full, os.path.relpath(full, parent))
            os.replace(tmp, out)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    sc.addPyFile(out)
