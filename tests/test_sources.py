"""Source connector + catalog lifecycle tests (reference surface
S1-S6, S12 per SURVEY.md §2.1, plus format readers)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.ipc

from fenix_spark import catalog
from fenix_spark.sources import ingest_arrow_ipc, read_arrow_ipc, read_csv, read_jsonl


def _write_ipc(path, n_rows=2500, batch=500):
    """A fenix-style IPC stream: id + fixed-size-list vector column
    (tests/test_flight.py:9-35 shape, scaled down)."""
    rng = np.random.default_rng(7)
    schema = pa.schema(
        [("id", pa.int64()), ("vector", pa.list_(pa.float32(), 8))]
    )
    with pa.ipc.new_stream(path, schema) as w:
        for start in range(0, n_rows, batch):
            ids = pa.array(range(start, start + batch), pa.int64())
            vecs = pa.FixedSizeListArray.from_arrays(
                pa.array(rng.random(batch * 8, dtype=np.float32)), 8
            )
            w.write_batch(pa.record_batch([ids, vecs], schema=schema))


def test_arrow_ipc_roundtrip_small(spark, tmp_path):
    ipc = str(tmp_path / "t.arrow")
    _write_ipc(ipc, n_rows=100, batch=50)
    df = read_arrow_ipc(spark, ipc)
    assert df.count() == 100
    assert set(df.columns) == {"id", "vector"}


def test_arrow_ipc_ingest_streams_batches(spark, tmp_path):
    ipc = str(tmp_path / "t.arrow")
    _write_ipc(ipc, n_rows=2500, batch=500)
    root = str(tmp_path / "store")
    df = ingest_arrow_ipc(spark, ipc, root, "vectors", batch_rows=600)
    assert df.count() == 2500
    assert sorted(r.id for r in df.select("id").collect()) == list(range(2500))
    # landed in the catalog layout and listable
    assert list(catalog.list_tables(root)) == ["vectors"]
    back = catalog.load(spark, root, "vectors")
    assert back.count() == 2500
    # vectors keep their fixed size through the hop
    from pyspark.sql import functions as F

    sizes = back.select(F.size("vector").alias("s")).distinct().collect()
    assert [r.s for r in sizes] == [8]


def test_csv_jsonl_roundtrip(spark, tmp_path):
    df = spark.range(50).selectExpr("id", "id * 2 AS twice", "concat('n', id) AS name")
    csv_path, json_path = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.option("header", "true").csv(csv_path)
    df.write.json(json_path)
    c = read_csv(spark, csv_path, schema="id bigint, twice bigint, name string")
    j = read_jsonl(spark, json_path, schema="id bigint, twice bigint, name string")
    want = {(r.id, r.twice, r.name) for r in df.collect()}
    assert {(r.id, r.twice, r.name) for r in c.collect()} == want
    assert {(r.id, r.twice, r.name) for r in j.collect()} == want


def test_catalog_lifecycle(spark, tmp_path):
    root = str(tmp_path / "store")
    a = spark.range(10).selectExpr("id", "id % 3 AS k")
    b = spark.range(10, 20).selectExpr("id", "id % 3 AS k")
    catalog.make(root, "a", a)
    catalog.make(root, "b", b)
    assert list(catalog.list_tables(root)) == ["a", "b"]
    # multi-name load = union-all (reference table.load list semantics)
    both = catalog.load(spark, root, ["a", "b"])
    assert both.count() == 20
    catalog.drop(root, "a")
    assert list(catalog.list_tables(root)) == ["b"]
    catalog.remove(root)
    assert list(catalog.list_tables(root)) == []
