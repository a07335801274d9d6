"""Key-skew diagnostics — measure before you salt.

Every shuffle in a 100 TB job is keyed, and one hot key melts one
reducer while 999 idle. AQE's skew-join splitting fixes the cases it
can see (post-shuffle partition sizes of sort-merge joins); it cannot
see aggregation-feeding shuffles, fixed-partitioning pipelines, or a
compressed hot key hiding inside a small partition file (the
mega-bucket case operators/dedup.py caps by hand). This module turns
"the job is slow" into numbers: which keys are hot, how hot, and what
salt factor (operators/joins.salted_join) would flatten them.

Scale shape: reuses the Misra-Gries heavy-hitter pass
(operators/sketches.heavy_hitters — per-partition ≤ m-counter
summaries, one exact verify pass over ≤ m·P candidates), so the
diagnosis costs two scans and shuffles only candidate keys, never the
key universe. The report is ≤ k rows.

The recommended salt factor for a hot key is
``ceil(count / (n_total / shuffle_partitions))`` — the number of
reducers the key's rows must spread over so no reducer carries more
than a balanced share. `simulate_partition_load` verifies a plan
before running it: max reducer load under hash partitioning, with and
without the recommended salts, computed from the same report.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame,
    keys: Sequence[str],
    k: int = 20,
    m: int = 512,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """The k hottest composite keys with EXACT counts, their share of
    all rows, and the salt factor that would balance each:

    ``(key, count, share, count_floor, salt_factor)``

    ``count_floor`` is the Misra-Gries completeness bound — every key
    with true count above it is guaranteed present (so "no row above
    the floor" IS a certificate of no-skew at that resolution).
    ``salt_factor`` is 1 for keys already at or below a balanced
    reducer share. NULL key components render as the literal string
    ``\\x00NULL`` inside the composite (distinct from the text
    "NULL")."""
    from fenix_spark.operators.sketches import heavy_hitters

    if not keys:
        raise ValueError("keys must be non-empty")
    spark = df.sparkSession
    if shuffle_partitions is None:
        shuffle_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    composite = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in keys
        ],
    )
    terms = df.select(composite.alias("key"))
    hh = heavy_hitters(terms, "key", k=k, m=m, tokenize=False)
    n_total = df.count()
    balanced = max(1.0, n_total / shuffle_partitions)
    return (
        hh.withColumnRenamed("term", "key")
        .withColumn("share", F.col("count") / F.lit(float(max(1, n_total))))
        .withColumn(
            "salt_factor",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("count") / F.lit(balanced)).cast("int"),
            ),
        )
        .orderBy(F.col("count").desc(), F.col("key"))
    )


def simulate_partition_load(
    report_rows: Sequence[dict],
    n_total: int,
    shuffle_partitions: int,
    salted: bool = False,
) -> float:
    """Worst-reducer load RATIO (max reducer rows / balanced rows)
    implied by a skew report: hot keys land whole (or split over their
    ``salt_factor`` reducers when ``salted``), the remaining mass
    spreads evenly. Driver-side arithmetic over the ≤ k-row report —
    the "is this shuffle safe to run" check before the job."""
    balanced = max(1.0, n_total / shuffle_partitions)
    hot_mass = sum(r["count"] for r in report_rows)
    rest_per_reducer = max(0.0, n_total - hot_mass) / shuffle_partitions
    worst = rest_per_reducer
    for r in report_rows:
        per = (
            r["count"] / r["salt_factor"]
            if salted and r.get("salt_factor")
            else float(r["count"])
        )
        worst = max(worst, per + rest_per_reducer)
    return worst / balanced


def recommended_salts(report_rows: Sequence[dict]) -> int:
    """One salt factor for `joins.salted_join` (which salts every row,
    not only hot keys): the max per-key factor in the report."""
    if not report_rows:
        return 1
    return max(int(r.get("salt_factor", 1)) for r in report_rows)


def skew_certificate(report: DataFrame, threshold_share: float = 0.05) -> bool:
    """True iff NO key (guaranteed, via the MG completeness floor)
    exceeds ``threshold_share`` of rows: the report's floor must sit
    below the threshold (else resolution is insufficient → raise) and
    no reported key may cross it."""
    rows = report.collect()
    if not rows:
        return True
    n_total = rows[0]["count"] / rows[0]["share"] if rows[0]["share"] else 0
    floor = rows[0]["count_floor"]
    if n_total and floor / n_total > threshold_share:
        raise ValueError(
            f"MG floor {floor} is above threshold_share·n "
            f"({threshold_share * n_total:.0f}); rerun key_skew_report "
            "with a larger m to certify at this threshold"
        )
    return all(r["share"] <= threshold_share for r in rows)
