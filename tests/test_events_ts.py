"""Regression tests for the events ts normalization (VERDICT r03).

The driver testdata changed `events.ts` from int64-nanos parquet to
timestamp[us] between rounds, and a hardcoded `ts DIV 1000000` broke 8
oracle queries plus the whole bench. `suite.ts_ms_expr` /
`suite.events_table` must now produce DuckDB-`epoch_ms(ts)`-identical
millis under EITHER physical encoding, so the next testdata change
degrades loudly (TypeError) instead of silently corrupting timestamps.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fenix_spark.suite import events_table, ts_ms_expr

# wall-clock instants exercising sub-second truncation and pre-epoch
_ROWS = [
    (1, "2024-03-01 12:34:56.789123"),
    (2, "1999-12-31 23:59:59.999999"),
    (3, "1970-01-01 00:00:00.000001"),
    (4, "2031-07-04 00:00:00"),
]


def _write_events(dirpath, unit: str) -> str:
    from datetime import datetime

    ts = pa.array(
        [datetime.fromisoformat(r[1]) for r in _ROWS], type=pa.timestamp(unit)
    )
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([0] * len(_ROWS), type=pa.int64()),
            "event_type": pa.array(["view"] * len(_ROWS)),
            "value": pa.array([1.0] * len(_ROWS)),
            "props": pa.array(["{}"] * len(_ROWS)),
        }
    )
    # version 2.6 keeps nanosecond physical encoding instead of
    # coercing to micros — this is the legacy encoding the r02
    # testdata shipped.
    pq.write_table(tbl, f"{dirpath}/events.parquet", version="2.6")
    return str(dirpath)


def _oracle_ms(sf_dir: str) -> dict[int, int]:
    rows = duckdb.sql(
        f"SELECT event_id, epoch_ms(ts) FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    return dict(rows)


@pytest.mark.parametrize("unit", ["us", "ns", "ms"])
def test_events_table_matches_duckdb_epoch_ms(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    got = {
        r["event_id"]: r["ts_ms"]
        for r in events_table(spark, sf_dir).select("event_id", "ts_ms").collect()
    }
    assert got == _oracle_ms(sf_dir)


def test_events_table_is_session_timezone_independent(spark, tmp_path):
    sf_dir = _write_events(tmp_path, "us")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")  # +05:45
        got = {
            r["event_id"]: r["ts_ms"]
            for r in events_table(spark, sf_dir).select("event_id", "ts_ms").collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == _oracle_ms(sf_dir)


def test_real_testdata_matches_duckdb(spark, sf_dir):
    got = {
        r["event_id"]: r["ts_ms"]
        for r in events_table(spark, sf_dir).select("event_id", "ts_ms").collect()
    }
    assert got == _oracle_ms(sf_dir)


def test_ts_ms_expr_rejects_ambiguous_types(spark):
    # LTZ timestamps make epoch millis depend on the session timezone;
    # the helper must refuse rather than guess.
    df = spark.sql("SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts")
    with pytest.raises(TypeError, match="unsupported type"):
        ts_ms_expr(df)
    df2 = spark.sql("SELECT '2024' AS ts")
    with pytest.raises(TypeError, match="unsupported type"):
        ts_ms_expr(df2)


def test_nanos_long_branch_exact_division(spark):
    # nanos near 2^60 overflow exact doubles — the long branch must use
    # integer DIV, not float division.
    df = spark.range(1).select(F.lit(1709296496789123456).alias("ts"))
    assert df.select(ts_ms_expr(df).alias("ms")).first()["ms"] == 1709296496789
