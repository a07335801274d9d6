"""Dump .explain("formatted") for suite queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
e.g.   python scripts/dump_plans.py r13 before readability_scores ivfpq_search

With no query names, dumps every bench query (bench.BENCH_QUERIES).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fenix_spark.plans.inspect import formatted_plan
from fenix_spark.session import get_session


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")

    from bench import BENCH_QUERIES
    from fenix_spark.artifacts import (
        ensure_artifacts,
        ensure_ivfpq_artifacts,
        ensure_ivfpq_residual_artifacts,
        ensure_large_flat_index,
    )
    from fenix_spark.suite import SPARK_QUERIES

    ensure_artifacts(spark, sf_dir)
    ensure_ivfpq_artifacts(spark, sf_dir)
    ensure_ivfpq_residual_artifacts(spark, sf_dir)
    ensure_large_flat_index(spark, sf_dir)

    if not names:
        names = list(BENCH_QUERIES)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = SPARK_QUERIES[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
