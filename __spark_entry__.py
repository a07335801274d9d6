"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``fenix_spark`` (see SURVEY.md §7); this module
is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: brute-force cosine KNN over the sf0.001
    embeddings table (reference C1 search,
    /root/reference/src/fenix/io/index/index.py:81-170)."""
    from fenix_spark.session import ensure_package_shipped
    from fenix_spark.suite import SPARK_QUERIES

    ensure_package_shipped(spark)
    return SPARK_QUERIES["knn_metrics"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Each callable ships the package to the session's Python workers
    # first (idempotent): Arrow-batched closures reference module-level
    # helpers pickled by module reference, and the DRIVER's session may
    # run from any cwd — its workers can't otherwise import fenix_spark.
    from fenix_spark.session import ensure_package_shipped
    from fenix_spark.suite import SPARK_QUERIES

    def shipped(fn: Callable) -> Callable:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_package_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: shipped(fn) for name, fn in SPARK_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from fenix_spark.suite import ORACLE_SQL

    return dict(ORACLE_SQL)
