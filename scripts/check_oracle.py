"""Mimic the driver's t2 gate locally — AT DRIVER STRICTNESS.

Round-1 lesson (VERDICT r01 defect 4): the old checker compared
``fetchall()`` Python values rounded to 9 decimals, which masked three
whole defect classes the driver catches:

1. DuckDB ``sum(int)`` returns HUGEINT (int128); pandas converts it to
   float64 while Spark's BIGINT stays int64 → hash mismatch even though
   the Python values are equal.
2. ``-0.0`` vs ``0.0`` survive rounding and hash differently.
3. list-typed output columns make the driver's pandas ``sort_values``
   canonicalizer raise TypeError (hard error, query scored broken).

So this gate now goes through pandas exactly like the driver does:
Spark via ``toPandas()``, DuckDB via ``rel.df()``, columns sorted by
name, rows sorted by all columns, then a cell-by-cell comparison on
``repr()`` of raw values (type- and sign-sensitive, NO rounding) plus a
column-dtype comparison. It additionally enforces the oracle type
contract up front:

- DuckDB ``rel.types`` must be within {BIGINT, INTEGER, DOUBLE, FLOAT,
  VARCHAR, BOOLEAN, TIMESTAMP, TIMESTAMP_NS, DATE} — HUGEINT/DECIMAL/
  LIST/STRUCT are rejected even if values happen to match.
- Spark output schemas must not contain array/map/struct columns.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from fenix_spark.session import get_session
from fenix_spark.suite import TABLES

# DuckDB logical types a driver-checked oracle query may emit. Anything
# else (HUGEINT, DECIMAL, LIST, …) converts to a pandas dtype that can't
# hash-match Spark's, or crashes the canonicalizer outright.
_SAFE_DUCK_TYPES = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "TIMESTAMP",
    "TIMESTAMP_NS",
    "DATE",
}

_UNSAFE_SPARK_TYPES = ("array", "map", "struct", "decimal")


def canon(df):
    """The driver's canonicalization: columns sorted by name, rows
    sorted by every column, index dropped. Raises TypeError on
    unsortable (list) columns — exactly like the driver."""
    names = sorted(df.columns)
    out = df[names].sort_values(names, kind="mergesort").reset_index(drop=True)
    return out


def cell_repr(v) -> str:
    """Type- and sign-sensitive scalar representation. -0.0 and 0.0
    differ; int64 5 and float64 5.0 differ; NaN is stable."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return repr(v)
    return f"{type(v).__name__}:{v!r}"


def compare(sdf_pd, ddf_pd) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty =
    green under driver semantics)."""
    problems: list[str] = []
    s_cols, d_cols = sorted(sdf_pd.columns), sorted(ddf_pd.columns)
    if s_cols != d_cols:
        return [f"schema mismatch: spark={s_cols} duckdb={d_cols}"]
    try:
        s = canon(sdf_pd)
    except TypeError as e:
        return [f"spark result not canonicalizable (list column?): {e}"]
    try:
        d = canon(ddf_pd)
    except TypeError as e:
        return [f"oracle result not canonicalizable (list column?): {e}"]
    if len(s) != len(d):
        return [f"row count: spark={len(s)} duckdb={len(d)}"]
    for col in s.columns:
        # Driver's hasher collapses int widths (int32 == int64) but is
        # sensitive to int-vs-float (HUGEINT→float64 was defect 1), so
        # compare at dtype-KIND granularity.
        sk_, dk_ = s[col].dtype.kind, d[col].dtype.kind
        if sk_ != dk_:
            problems.append(
                f"dtype kind mismatch on {col!r}: spark={s[col].dtype} duckdb={d[col].dtype}"
            )
    n_diff = 0
    first: list[str] = []
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            ra, rb = cell_repr(a), cell_repr(b)
            if ra != rb:
                n_diff += 1
                if len(first) < 3:
                    first.append(f"row {i} col {col}: spark={ra} duckdb={rb}")
    if n_diff:
        problems.append(f"{n_diff} cell mismatches; first: " + "; ".join(first))
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        try:
            sdf = fn(spark, sf_dir)
            bad = [
                f.name
                for f in sdf.schema.fields
                if any(k in f.dataType.simpleString() for k in _UNSAFE_SPARK_TYPES)
            ]
            if bad:
                failures.append((name, f"non-scalar Spark output columns: {bad}"))
                print(f"FAIL  {name}: non-scalar Spark output columns {bad}")
                continue
            sp = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only check: {len(sp)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            bad_t = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, rel.types)
                if str(t) not in _SAFE_DUCK_TYPES
            ]
            if bad_t:
                failures.append((name, f"unsafe oracle types: {bad_t}"))
                print(f"FAIL  {name}: unsafe oracle column types {bad_t}")
                continue
            dp = rel.df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = compare(sp, dp)
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}:")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"OK    {name}: {len(sp)} rows")
    print(f"\n{n_checked - len(failures)}/{n_checked} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
