"""Testdata schema sentinel (round-3 lesson).

The driver regenerates `/root/testdata` between rounds and its
physical schemas HAVE drifted (`events.ts`: int64-nanos → timestamp[us]
broke 8 oracle rows before tests/test_events_ts.py pinned it). This
test asserts the arrow-level schema of every table the suite reads, so
the NEXT drift shows up as one line naming exactly what changed —
instead of a pile of cryptic analysis errors across the suite.

A failure here is not a bug in the engine: update the expectation and
audit every reader of the changed column (grep the column name across
fenix_spark/ and the oracle SQL in suite.py).
"""

from __future__ import annotations

import pyarrow.parquet as pq

# arrow type names; timestamps deliberately allow any unit (the suite
# normalizes through suite.ts_ms_expr / suite.table which handle
# us/ms/ns), but a change AWAY from timestamp/int64 must fail loudly.
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64", "c_name": "string", "c_nationkey": "int32",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64", "s_name": "string", "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int32", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64", "o_custkey": "int64", "o_orderstatus": "string",
        "o_totalprice": "double", "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64",
        "l_linenumber": "int32", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "int64", "ts": ("timestamp", "int64"), "user_id": "int64",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "int64", "text": "string", "lang": "string",
        "source": "string", "n_chars": "int64",
    },
    "embeddings": {"vec_id": "int64", "embedding": "list<float>", "label": "int32"},
}


def _type_name(t) -> str:
    s = str(t)
    if s.startswith("timestamp"):
        return "timestamp"
    if s in ("list<item: float>", "list<element: float>", "list<float>"):
        return "list<float>"
    return s


def test_testdata_schemas_unchanged(sf_dir):
    drifts = []
    for table, cols in EXPECTED.items():
        schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
        got = {f.name: _type_name(f.type) for f in schema}
        for col, want in cols.items():
            allowed = want if isinstance(want, tuple) else (want,)
            if col not in got:
                drifts.append(f"{table}.{col}: MISSING (had {sorted(got)})")
            elif got[col] not in allowed:
                drifts.append(f"{table}.{col}: {got[col]} (expected {allowed})")
        for col in got:
            if col not in cols:
                drifts.append(f"{table}.{col}: NEW column {got[col]}")
    assert not drifts, (
        "testdata schema drift — audit every reader of these columns "
        "(fenix_spark/ + oracle SQL) before updating this expectation:\n  "
        + "\n  ".join(drifts)
    )
