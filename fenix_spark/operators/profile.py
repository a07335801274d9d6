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

Quantiles come from the KLL sketch family (operators/sketches.py), not
``approx_percentile``: ``profile(df, quantiles=[...])`` adds a
rank-error-bounded per-quantile map for every numeric column, and
``profile_quantile_sketch`` exposes the underlying MERGEABLE
(column, item, weight) rollup — persist it beside the profile and the
same quantiles answer forever, across days/partitions/shards, by KLL
merge. ``approx_percentile``'s t-digest state dies with the query; a
100 TB pipeline profiling per-ingest-batch needs the state to outlive
it. All numeric columns sketch in ONE extra pass (native ``stack``
into (column, value) rows → the standard per-partition Arrow build —
raw values never shuffle, only sketch rows).
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


def profile_quantile_sketch(
    df: DataFrame, cols: list[str] | None = None, k: int = 200
) -> DataFrame:
    """The MERGEABLE quantile state behind ``profile``'s quantile
    columns: one KLL rollup row-set (column, item, weight) covering
    every numeric column (or the named subset), built in one pass —
    native ``stack`` pivots the columns into (column, value) rows
    scan-side, then the standard per-partition sketch build. Persist
    it at the batch/shard grain; ``kll_merge`` + ``kll_quantiles``
    (keys=["column"]) answer any later quantile without re-reading
    the data — the property ``approx_percentile`` cannot give."""
    from fenix_spark.operators.sketches import kll_rollup

    num = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
        and (cols is None or f.name in cols)
    ]
    if not num:
        raise ValueError("profile_quantile_sketch: no numeric columns selected")
    stacked = df.selectExpr(
        "stack({}, {}) as (column, value)".format(
            len(num),
            ", ".join(f"'{c}', cast(`{c}` as double)" for c in num),
        )
    )
    return kll_rollup(stacked, ["column"], "value", k)


def profile(
    df: DataFrame,
    rsd: float = 0.05,
    quantiles: list[float] | None = None,
    kll_k: int = 200,
) -> DataFrame:
    """Per-column stats frame: (column, dtype, n_rows, n_nulls,
    approx_distinct, min_repr, max_repr[, quantiles]). One scan, one
    partial-agg shuffle, regardless of column count. With
    ``quantiles=[0.5, 0.95, ...]``, numeric columns additionally get a
    ``quantiles`` map (q → value) from a KLL sketch pass
    (rank error ≈ O(1/k)·√log(n/k); non-numeric columns null) — see
    ``profile_quantile_sketch`` for the persistable form."""
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

    qmap: dict[str, dict[float, float]] = {}
    if quantiles:
        from fenix_spark.operators.sketches import kll_quantiles

        if any(isinstance(f.dataType, T.NumericType) for f in fields):
            roll = profile_quantile_sketch(df, k=kll_k)
            for r in kll_quantiles(roll, ["column"], list(quantiles)).collect():
                qmap.setdefault(r["column"], {})[float(r["q"])] = float(r["value"])

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
        + ((qmap.get(f.name),) if quantiles else ())
        for f in fields
    ]
    schema = (
        "column string, dtype string, n_rows bigint, n_nulls bigint, "
        "approx_distinct bigint, min_repr string, max_repr string"
    )
    if quantiles:
        schema += ", quantiles map<double,double>"
    return spark.createDataFrame(out, schema)
