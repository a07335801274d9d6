"""Data-quality expectations — declarative rule checking for pipeline
gates (the Great-Expectations pattern, Spark-native and scan-shaped).

Three check classes by cost:

- **Row rules** (`validate`): arbitrary boolean Column predicates,
  ALL evaluated in ONE aggregation pass (each rule is a summed cast
  inside the same agg — adding a rule adds a column, never a scan).
  Optional quarantine split routes failing rows to a side output.
- **Uniqueness** (`expect_unique`): one groupBy on the key columns —
  the unavoidable shuffle, keyed only by the checked columns.
- **Referential integrity** (`expect_subset`): one anti-join against
  the dimension (broadcast when small — dimension keys usually are).

Failing loudly is a mode, not the default: `validate` RETURNS the
violation ledger; `require` wraps it and raises when any rule
exceeds its tolerance — put `require` at pipeline gates, `validate`
in monitoring.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = tuple[str, Column]


def validate(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """(rule, violations, total, fraction) — one row per rule, ONE
    scan total. A rule's predicate states what SHOULD hold; nulls
    count as violations (an unknown is not a pass)."""
    names = [n for n, _ in rules]
    if len(set(names)) != len(names) or "__total" in names:
        raise ValueError(
            "rule names must be unique and not '__total' "
            f"(got {names}) — duplicates would shadow each other in "
            "the one-pass aggregation"
        )
    aggs = [F.count(F.lit(1)).alias("__total")]
    for name, pred in rules:
        aggs.append(
            # coalesce the SUM too: over zero rows it is NULL, and an
            # empty gate input must yield a 0-violation ledger, not a
            # TypeError at int(None)
            F.coalesce(
                F.sum((~F.coalesce(pred, F.lit(False))).cast("long")), F.lit(0)
            ).alias(name)
        )
    row = df.agg(*aggs).first()
    total = row["__total"]
    spark = df.sparkSession
    out = [
        (name, int(row[name]), int(total), (row[name] / total) if total else 0.0)
        for name, _ in rules
    ]
    return spark.createDataFrame(
        out, "rule string, violations bigint, total bigint, fraction double"
    )


def quarantine(
    df: DataFrame, rules: Sequence[Rule]
) -> tuple[DataFrame, DataFrame]:
    """(clean, bad): rows failing ANY rule go to ``bad`` with a
    ``__failed`` array naming the rules they broke. Both outputs are
    filters over the same scan — Catalyst shares the upstream plan."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
                for name, pred in rules
            ]
        )
    )
    tagged = df.withColumn("__failed", failed)
    clean = tagged.where(F.size("__failed") == 0).drop("__failed")
    bad = tagged.where(F.size("__failed") > 0)
    return clean, bad


def require(
    df: DataFrame, rules: Sequence[Rule], max_fraction: float = 0.0
) -> DataFrame:
    """Gate mode: raise if any rule's violation fraction exceeds
    ``max_fraction``; returns ``df`` unchanged otherwise (chainable)."""
    ledger = validate(df, rules).collect()
    broken = [
        r for r in ledger if r.total and r.fraction > max_fraction
    ]
    if broken:
        detail = ", ".join(
            f"{r.rule}: {r.violations}/{r.total} ({r.fraction:.2%})" for r in broken
        )
        raise ValueError(
            f"expectation gate failed (tolerance {max_fraction:.2%}): {detail}"
        )
    return df


def expect_unique(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(…cols…, n) for every duplicated key — empty means unique."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def expect_subset(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """Rows of ``df`` whose ``col`` has no match in ``dim.dim_col``
    (dangling foreign keys) — empty means referentially intact."""
    keys = F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct())
    return df.join(keys, col, "left_anti")


def expect_complete(
    df: DataFrame, cols: Sequence[str], max_null_frac: float = 0.0
) -> DataFrame:
    """(column, nulls, total, fraction, ok) — per-column completeness
    in ONE aggregation pass; ``ok`` is fraction ≤ ``max_null_frac``.
    The row-rule form of "these columns must be populated", reported
    per column instead of per rule."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.coalesce(
            F.sum(F.col(c).isNull().cast("long")), F.lit(0)
        ).alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).first()
    total = row["__total"]
    out = [
        (
            c,
            int(row[c]),
            int(total),
            (row[c] / total) if total else 0.0,
            ((row[c] / total) if total else 0.0) <= max_null_frac,
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out, "column string, nulls long, total long, fraction double, ok boolean"
    )


def expect_monotonic(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    strict: bool = False,
) -> DataFrame:
    """Violating rows — (key, order, value, prev_value) wherever
    ``value_col`` DECREASES (or fails to strictly increase) along
    ``order_col`` within a key; empty means monotonic. The counter /
    watermark / version-column sanity check: one per-key lag window
    over (key, order, value) rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.asc(order_col))
    staged = df.select(key_col, order_col, value_col).withColumn(
        "prev_value", F.lag(value_col).over(w)
    )
    pv = F.col("prev_value")
    bad = F.col(value_col) <= pv if strict else F.col(value_col) < pv
    return staged.where(pv.isNotNull() & bad)


def expect_fresh(
    df: DataFrame, ts_col: str, as_of_ms: int, max_lag_ms: int
) -> DataFrame:
    """One-row ledger (latest_ms, as_of_ms, lag_ms, ok) — is the
    newest record within ``max_lag_ms`` of ``as_of_ms``? The caller
    supplies the clock (determinism: a check that reads the wall
    clock can't be replayed); empty input yields null latest and
    ok=false — no data is the stalest possible feed."""
    if max_lag_ms <= 0:
        raise ValueError(f"max_lag_ms must be > 0 (got {max_lag_ms})")
    row = df.agg(F.max(F.col(ts_col)).alias("latest")).first()
    latest = row["latest"]
    lag = (as_of_ms - int(latest)) if latest is not None else None
    ok = lag is not None and lag <= max_lag_ms
    return df.sparkSession.createDataFrame(
        [(latest, as_of_ms, lag, ok)],
        "latest_ms long, as_of_ms long, lag_ms long, ok boolean",
    )


def expect_schema(
    df: DataFrame, expected_ddl: str, allow_extra: bool = False
) -> DataFrame:
    """(column, expected_type, actual_type, status) — schema drift
    ledger against an expected DDL string (``"id bigint, text
    string"``): ``missing`` (expected, absent), ``type_mismatch``,
    ``extra`` (present, undeclared — violations unless
    ``allow_extra``), ``ok``. Pure metadata comparison: zero scans,
    zero jobs; the upstream-producer-changed-the-schema gate that
    should run before any data is touched."""
    from pyspark.sql.types import _parse_datatype_string

    expected = {
        f.name: f.dataType.simpleString()
        for f in _parse_datatype_string(expected_ddl).fields
    }
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    rows = []
    for name, et in expected.items():
        at = actual.get(name)
        if at is None:
            rows.append((name, et, None, "missing"))
        elif at != et:
            rows.append((name, et, at, "type_mismatch"))
        else:
            rows.append((name, et, at, "ok"))
    for name, at in actual.items():
        if name not in expected:
            rows.append((name, None, at, "extra" if not allow_extra else "ok"))
    return df.sparkSession.createDataFrame(
        rows, "column string, expected_type string, actual_type string, status string"
    )
