"""Information-theoretic column audits — Shannon entropy of
categorical columns and mutual information between column pairs: the
"which metadata fields actually carry signal / which are redundant"
questions a datacard should answer (is ``lang`` just a renaming of
``source``? does ``license`` tell you anything once you know the
crawl?).

Scale shape: everything reduces to ONE count aggregation whose key
space is the CATEGORY space, never the row space:

- ``column_entropy`` melts the requested columns map-side (k-way
  replication of string-cast values) into (column, value) rows and
  partial-aggregates — one shuffle of category-sized groups for all
  columns together.
- ``mutual_information``/``mi_matrix`` aggregate joint (a, b) counts
  once; marginals are WINDOW sums over the joint rows (|A|·|B| rows,
  summary-sized), so no second pass over the data. ``mi_matrix`` does
  all C(k,2) pairs in one explode + one aggregation.

NULL is a category (it carries information — a column that is null
exactly when another is 'unknown' is dependence worth seeing), encoded
with an internal sentinel distinct from any real string.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["column_entropy", "mutual_information", "mi_matrix"]

_NULL = "\x00__null__"


def _as_cat(col: str) -> F.Column:
    return F.coalesce(F.col(col).cast("string"), F.lit(_NULL))


def column_entropy(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, entropy, n_distinct, n) — Shannon entropy (nats) of
    each column's value distribution, nulls included as a category.
    0.0 for constant columns; ln(n_distinct) when uniform."""
    if not cols:
        raise ValueError("cols must be non-empty")
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"), _as_cat(c).alias("value")
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.value")
    counts = melted.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("column")
    p = F.col("c") / F.sum("c").over(w)
    return (
        counts.withColumn("term", -p * F.log(p))
        .groupBy("column")
        .agg(
            F.sum("term").alias("entropy"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("c").alias("n"),
        )
    )


def mi_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(col_a, col_b, mi, nmi, h_a, h_b, n) for every unordered column
    pair (col_a < col_b positionally). ``mi`` is in nats; ``nmi`` is
    mi / √(h_a·h_b) — 1.0 for bijectively-related columns, 0.0 when
    independent or when either column is constant (defined as 0 there:
    a constant column shares no information with anything)."""
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        _as_cat(a).alias("va"),
                        _as_cat(b).alias("vb"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("kv")
    ).select("kv.*")
    joint = melted.groupBy("col_a", "col_b", "va", "vb").agg(
        F.count(F.lit(1)).alias("c")
    )
    wp = Window.partitionBy("col_a", "col_b")
    wa = Window.partitionBy("col_a", "col_b", "va")
    wb = Window.partitionBy("col_a", "col_b", "vb")
    n = F.sum("c").over(wp)
    p_ab = F.col("c") / n
    p_a = F.sum("c").over(wa) / n
    p_b = F.sum("c").over(wb) / n
    scored = joint.select(
        "col_a",
        "col_b",
        (p_ab * F.log(p_ab / (p_a * p_b))).alias("mi_term"),
        # entropy terms counted once per marginal row: only on the
        # first joint row of each marginal group
        F.when(
            F.row_number().over(wa.orderBy("vb")) == 1, -p_a * F.log(p_a)
        ).otherwise(0.0).alias("ha_term"),
        F.when(
            F.row_number().over(wb.orderBy("va")) == 1, -p_b * F.log(p_b)
        ).otherwise(0.0).alias("hb_term"),
        F.col("c"),
    )
    agg = scored.groupBy("col_a", "col_b").agg(
        F.sum("mi_term").alias("mi"),
        F.sum("ha_term").alias("h_a"),
        F.sum("hb_term").alias("h_b"),
        F.sum("c").alias("n"),
    )
    return agg.select(
        "col_a",
        "col_b",
        # clamp float-noise negatives: MI is ≥ 0 by Jensen
        F.greatest(F.col("mi"), F.lit(0.0)).alias("mi"),
        F.when(
            (F.col("h_a") > 0) & (F.col("h_b") > 0),
            F.greatest(F.col("mi"), F.lit(0.0))
            / F.sqrt(F.col("h_a") * F.col("h_b")),
        )
        .otherwise(0.0)
        .alias("nmi"),
        "h_a",
        "h_b",
        "n",
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """One-row frame: (col_a, col_b, mi, nmi, h_a, h_b, n) for a single
    column pair — :func:`mi_matrix` at k=2."""
    return mi_matrix(df, [col_a, col_b])
