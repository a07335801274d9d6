"""Parquet footer statistics — measure file/row-group pruning BEFORE
running the query.

At 100 TB the difference between a filter that prunes and one that
scans is the whole job. Spark applies footer min/max pruning
internally, but gives no ledger: you learn whether your layout
(partitioning, sort, z-order — catalog.compact) actually prunes only
by running the scan. This module reads ONLY the footers (a few KB per
file, distributed one file per task — data pages never open) and
answers: for predicate ``col ∈ [lo, hi]``, which files/row-groups are
provably skippable, and what fraction of rows does the layout save?

The skip decision is the same conservative rule engines use
(parquet-format Statistics: a unit is skippable iff max < lo or
min > hi; missing stats ⇒ must read). It can never mark a unit
skippable that contains a matching row — pinned by an exhaustive
read-back test.

Pairs with functions/zorder.py + catalog.compact(zorder_by=...): the
report turns "z-ordering should help" into a measured
rows-skipped-per-predicate number, from footers alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _file_list(spark: SparkSession, path: str) -> DataFrame:
    """Distinct data-file paths of a parquet dataset via a zero-column
    scan (metadata-cheap: no data pages decode for input_file_name)."""
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .distinct()
    )


def rowgroup_stats(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """One row per (file, row_group, column) with footer statistics:
    ``(file, rg, column, n_rows, n_nulls, min_str, max_str, min_num,
    max_num, has_stats)``. ``min_num``/``max_num`` are populated for
    numeric/temporal columns (doubles), ``min_str``/``max_str`` carry
    the raw values as strings for everything (order-comparable for
    strings, display-only for binaries). Footers are read distributed
    — one ~KB read per file, never the data pages."""
    import pandas as pd  # noqa: F401

    files = _file_list(spark, path)
    wanted = list(columns) if columns else None
    schema = (
        "file string, rg int, column string, n_rows long, n_nulls long, "
        "min_str string, max_str string, min_num double, max_num double, "
        "has_stats boolean"
    )

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                local = f[len("file:") :] if f.startswith("file:") else f
                md = pq.ParquetFile(local).metadata
                for rg_i in range(md.num_row_groups):
                    rg = md.row_group(rg_i)
                    for c_i in range(rg.num_columns):
                        col = rg.column(c_i)
                        name = col.path_in_schema
                        if wanted is not None and name not in wanted:
                            continue
                        st = col.statistics
                        has = st is not None and st.has_min_max
                        mn = st.min if has else None
                        mx = st.max if has else None

                        def _num(v):
                            try:
                                return float(v)
                            except (TypeError, ValueError):
                                return None

                        out.append(
                            {
                                "file": f,
                                "rg": rg_i,
                                "column": name,
                                "n_rows": rg.num_rows,
                                "n_nulls": (
                                    st.null_count
                                    if st is not None
                                    and st.has_null_count
                                    else None
                                ),
                                "min_str": None if mn is None else str(mn),
                                "max_str": None if mx is None else str(mx),
                                "min_num": _num(mn),
                                "max_num": _num(mx),
                                "has_stats": bool(has),
                            }
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "file", "rg", "column", "n_rows", "n_nulls",
                    "min_str", "max_str", "min_num", "max_num", "has_stats",
                ],
            )

    return files.mapInPandas(read_footers, schema)


def pruning_report(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
) -> DataFrame:
    """Per-file pruning verdict for ``column BETWEEN lo AND hi``:
    ``(file, n_rows, rgs, rgs_skippable, rows_skippable, file_skippable)``
    plus use ``.agg`` for totals. Conservative: a row group is
    skippable iff its stats PROVE no match (max < lo or min > hi);
    missing stats read. Numeric predicates compare numerically,
    string predicates lexicographically (parquet's string stat
    order)."""
    stats = rowgroup_stats(spark, path, columns=[column])
    numeric = isinstance(lo, (int, float)) and isinstance(hi, (int, float))
    if numeric:
        mn, mx = F.col("min_num"), F.col("max_num")
        lo_l, hi_l = F.lit(float(lo)), F.lit(float(hi))
    else:
        mn, mx = F.col("min_str"), F.col("max_str")
        lo_l, hi_l = F.lit(str(lo)), F.lit(str(hi))
    skippable = F.col("has_stats") & ((mx < lo_l) | (mn > hi_l))
    per_rg = stats.withColumn("skip", F.coalesce(skippable, F.lit(False)))
    return (
        per_rg.groupBy("file")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.count(F.lit(1)).alias("rgs"),
            F.sum(F.col("skip").cast("long")).alias("rgs_skippable"),
            F.sum(
                F.when(F.col("skip"), F.col("n_rows")).otherwise(F.lit(0))
            ).alias("rows_skippable"),
        )
        .withColumn(
            "file_skippable", F.col("rgs_skippable") == F.col("rgs")
        )
    )


def pruning_fraction(report: DataFrame) -> float:
    """Fraction of ROWS the layout provably skips for the predicate —
    the one number to compare layouts (sorted vs shuffled vs
    z-ordered) with."""
    row = report.agg(
        F.sum("rows_skippable").alias("s"), F.sum("n_rows").alias("n")
    ).head()
    return float(row["s"] or 0) / float(row["n"] or 1)


def compaction_report(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-files health check for a parquet dataset — the ops
    question behind ``catalog.compact``: is this table drowning in
    files the scheduler will pay per-task overhead for?

    Returns a driver-side dict (the table's file COUNT bounds it):
    ``n_files``, ``total_bytes``, ``total_rows``, ``avg_file_bytes``,
    ``median_file_bytes``, ``small_files`` / ``small_file_frac``
    (files under half the target), ``recommended_files`` (⌈total /
    target⌉) and ``compaction_recommended`` (more than 2× the
    recommended count AND a meaningful small-file share). Listing and
    footer reads run DISTRIBUTED one-file-per-task (the
    ``rowgroup_stats`` pattern); only per-file (bytes, rows) summaries
    return to the driver."""
    import pandas as pd  # noqa: F401

    files = _file_list(spark, path)
    schema = "file string, bytes long, n_rows long"

    def sizes(batches):
        import os as _os

        import pandas as _pd
        import pyarrow.parquet as _pq

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                local = f[len("file:") :] if f.startswith("file:") else f
                md = _pq.ParquetFile(local).metadata
                out.append(
                    {
                        "file": f,
                        "bytes": _os.path.getsize(local),
                        "n_rows": md.num_rows,
                    }
                )
            yield _pd.DataFrame(out, columns=["file", "bytes", "n_rows"])

    per_file = files.repartition(32).mapInPandas(sizes, schema)
    rows = per_file.collect()
    if not rows:
        raise ValueError(f"no parquet files under {path}")
    sizes_b = sorted(r["bytes"] for r in rows)
    total_b = sum(sizes_b)
    n = len(sizes_b)
    small = sum(1 for b in sizes_b if b < target_file_bytes // 2)
    recommended = max(1, -(-total_b // target_file_bytes))
    return {
        "n_files": n,
        "total_bytes": int(total_b),
        "total_rows": int(sum(r["n_rows"] for r in rows)),
        "avg_file_bytes": float(total_b / n),
        "median_file_bytes": float(sizes_b[n // 2]),
        "small_files": int(small),
        "small_file_frac": float(small / n),
        "recommended_files": int(recommended),
        "compaction_recommended": bool(
            n > 2 * recommended and small / n > 0.5
        ),
    }
