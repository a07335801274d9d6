"""One-pass corpus profiling — the health check a 100 TB pipeline runs
before and after every stage (schema drift, null blow-ups, cardinality
collapse all show up here first).

The reference has no profiling surface; its tables are trusted blobs.
Here ``profile`` computes, for every column, in ONE distributed scan
(a single agg: partial aggregation map-side, one tiny shuffle):

- ``n_rows`` / ``n_nulls`` — null-rate tracking,
- ``approx_distinct`` — HyperLogLog++ cardinality (exact distinct
  would be a full shuffle per column; HLL is mergeable and bounded),
- ``min_repr`` / ``max_repr`` — range endpoints as strings (orderable
  types only), for drift alarms and partition-pruning sanity.

The aggregate row is tiny (4 cells per column) — collecting it to
build the result frame is driver-safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ORDERABLE = (
    T.NumericType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BooleanType,
)


def profile(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Per-column stats frame: (column, dtype, n_rows, n_nulls,
    approx_distinct, min_repr, max_repr). One scan, one partial-agg
    shuffle, regardless of column count."""
    spark = df.sparkSession
    fields = df.schema.fields
    aggs = []
    for f in fields:
        c = F.col(f.name)
        orderable = isinstance(f.dataType, _ORDERABLE)
        aggs += [
            F.count(F.lit(1)).alias(f"{f.name}__rows"),
            F.count(F.when(c.isNull(), 1)).alias(f"{f.name}__nulls"),
            F.approx_count_distinct(
                c.cast("string") if not orderable else c, rsd
            ).alias(f"{f.name}__dist"),
            (F.min(c).cast("string") if orderable else F.lit(None).cast("string")).alias(
                f"{f.name}__min"
            ),
            (F.max(c).cast("string") if orderable else F.lit(None).cast("string")).alias(
                f"{f.name}__max"
            ),
        ]
    row = df.agg(*aggs).head()
    out = [
        (
            f.name,
            f.dataType.simpleString(),
            row[f"{f.name}__rows"],
            row[f"{f.name}__nulls"],
            row[f"{f.name}__dist"],
            row[f"{f.name}__min"],
            row[f"{f.name}__max"],
        )
        for f in fields
    ]
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows bigint, n_nulls bigint, "
        "approx_distinct bigint, min_repr string, max_repr string",
    )
