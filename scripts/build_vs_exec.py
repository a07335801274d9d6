"""Split each bench query's wall into BUILD (Python query construction,
py4j, localCheckpoint plan analysis) vs EXEC (noop-sink write), min-of-N.

Usage: python scripts/build_vs_exec.py [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fenix_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("ROUNDS", "3"))


def main() -> None:
    spark = get_session("build_vs_exec")
    spark.sparkContext.setLogLevel("ERROR")

    from fenix_spark.artifacts import (
        ensure_artifacts,
        ensure_ivfpq_artifacts,
        ensure_ivfpq_residual_artifacts,
        ensure_large_flat_index,
    )
    from fenix_spark.suite import SPARK_QUERIES

    ensure_artifacts(spark, SF_DIR)
    ensure_ivfpq_artifacts(spark, SF_DIR)
    ensure_ivfpq_residual_artifacts(spark, SF_DIR)
    ensure_large_flat_index(spark, SF_DIR)

    names = sys.argv[1:] or ["minhash_neardup", "triangle_counts"]
    for name in names:
        # warm-up
        SPARK_QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        builds, execs = [], []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            df = SPARK_QUERIES[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        print(
            f"{name}: build min={min(builds):.3f}s {[round(b,3) for b in builds]} "
            f"exec min={min(execs):.3f}s {[round(e,3) for e in execs]}"
        )


if __name__ == "__main__":
    main()
