"""Mimic the driver's t2 gate locally: run every __spark_entry__
query at a given SF on Spark AND its DuckDB oracle, compare
row count, column names (sorted), and order-insensitive values.

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


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bool):
        return int(v)
    return v


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    data = sorted(tuple(normalize(r[i]) for i in order) for r in rows)
    return names, data


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only check: {len(srows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sk, sv = frame_key(scols, srows)
        dk, dv = frame_key(dcols, drows)
        if sk != dk:
            failures.append((name, f"schema mismatch: spark={sk} duckdb={dk}"))
            print(f"FAIL  {name}: schema mismatch\n  spark : {sk}\n  duckdb: {dk}")
        elif len(sv) != len(dv):
            failures.append((name, f"row count: spark={len(sv)} duckdb={len(dv)}"))
            print(f"FAIL  {name}: row count spark={len(sv)} duckdb={len(dv)}")
        elif sv != dv:
            diffs = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            failures.append((name, f"value mismatch, first diffs: {diffs}"))
            print(f"FAIL  {name}: value mismatch ({len(sv)} rows); first diffs:")
            for a, b in diffs:
                print(f"  spark : {a}\n  duckdb: {b}")
        else:
            print(f"OK    {name}: {len(sv)} rows")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
