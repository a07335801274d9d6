"""Arrow IPC source + reference-store migration tests: stream/file
framing, fixed-size-list and dictionary normalization, per-file
partitions, positional index zip, misalignment failure, and the
codings policy."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from fenix_spark.sources.arrowipc_source import register


def _write_stream(path: str, table: pa.Table) -> None:
    with pa.OSFile(path, "wb") as f, pa.ipc.new_stream(f, table.schema) as w:
        for b in table.to_batches(max_chunksize=50):
            w.write_batch(b)


def _write_file(path: str, table: pa.Table) -> None:
    with pa.OSFile(path, "wb") as f, pa.ipc.new_file(f, table.schema) as w:
        w.write_table(table)


def _emb_table(n: int = 120, dim: int = 8) -> pa.Table:
    rng = np.random.default_rng(3)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(rng.normal(size=n * dim), type=pa.float32()), dim
    )
    label = pa.array(["a", "b", "c"][: 3] * (n // 3), type=pa.string()).dictionary_encode()
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": emb,
            "label": label,
        }
    )


def test_read_stream_format_with_normalization(spark, tmp_path):
    t = _emb_table()
    path = str(tmp_path / "emb.arrow")
    _write_stream(path, t)
    register(spark)
    df = spark.read.format("arrowipc").load(path)
    assert [f.name for f in df.schema.fields] == ["vec_id", "embedding", "label"]
    rows = {r.vec_id: r for r in df.collect()}
    assert len(rows) == 120
    # fixed-size list arrives as a plain array, dictionary as values
    np.testing.assert_allclose(
        rows[7].embedding, t["embedding"][7].as_py(), rtol=1e-6
    )
    assert rows[4].label == t["label"][4].as_py()


def test_read_file_format_fallback(spark, tmp_path):
    t = pa.table({"x": pa.array([1, 2, 3], type=pa.int64())})
    path = str(tmp_path / "f.arrow")
    _write_file(path, t)
    register(spark)
    got = sorted(r.x for r in spark.read.format("arrowipc").load(path).collect())
    assert got == [1, 2, 3]


def test_directory_scan_one_partition_per_file(spark, tmp_path):
    d = tmp_path / "many"
    d.mkdir()
    for i in range(3):
        _write_stream(
            str(d / f"part{i}.arrow"),
            pa.table({"x": pa.array([i * 10 + j for j in range(5)], type=pa.int64())}),
        )
    register(spark)
    df = spark.read.format("arrowipc").load(str(d))
    assert df.count() == 15
    parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts == 3


def _make_ref_store(root: str, n: int = 120) -> pa.Table:
    os.makedirs(os.path.join(root, "sources"))
    os.makedirs(os.path.join(root, "codings"))
    os.makedirs(os.path.join(root, "indexes", "embeddings", "embedding"))
    t = _emb_table(n)
    _write_stream(os.path.join(root, "sources", "embeddings.arrow"), t)
    docs = pa.table(
        {
            "doc_id": pa.array(range(10), type=pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(10)]),
        }
    )
    _write_stream(os.path.join(root, "sources", "docs.arrow"), docs)
    side = pa.table(
        {"__CODED_ID__": pa.array([i % 4 for i in range(n)], type=pa.int64())}
    )
    _write_stream(
        os.path.join(root, "indexes", "embeddings", "embedding", "pq.arrow"),
        side,
    )
    with open(os.path.join(root, "codings", "pq.torch"), "wb") as f:
        f.write(b"\x80\x04fake")
    return t


def test_migrate_reference_store(spark, tmp_path):
    from fenix_spark import catalog
    from fenix_spark.sources.migrate import migrate_reference_store

    ref = str(tmp_path / "ref")
    out = str(tmp_path / "out")
    _make_ref_store(ref)

    with pytest.raises(NotImplementedError, match="pq.torch"):
        migrate_reference_store(spark, ref, out)

    manifest = migrate_reference_store(spark, ref, out, skip_codings=True)
    assert manifest["sources"] == ["docs", "embeddings"]
    assert manifest["indexes"] == ["embeddings/embedding/pq"]
    assert manifest["codings_skipped"] == ["pq.torch"]

    emb = catalog.load(spark, out, "embeddings")
    assert emb.count() == 120
    idx = spark.read.parquet(
        catalog.index_path(out, "embeddings", "embedding", "pq")
    )
    assert set(idx.columns) == {"vec_id", "embedding", "label", "__CODED_ID__"}
    # positional zip: code i%4 rides with vec_id i
    got = {r.vec_id: r["__CODED_ID__"] for r in idx.collect()}
    assert all(got[i] == i % 4 for i in range(120))
    # code partitioning is physical (hive dirs)
    root = catalog.index_path(out, "embeddings", "embedding", "pq")
    assert any(d.startswith("__CODED_ID__=") for d in os.listdir(root))


def test_migrate_misaligned_sidecar_raises(spark, tmp_path):
    from fenix_spark.sources.migrate import migrate_reference_store

    ref = str(tmp_path / "ref2")
    out = str(tmp_path / "out2")
    _make_ref_store(ref)
    # overwrite the sidecar with the wrong row count
    _write_stream(
        os.path.join(ref, "indexes", "embeddings", "embedding", "pq.arrow"),
        pa.table({"__CODED_ID__": pa.array([0, 1], type=pa.int64())}),
    )
    with pytest.raises(ValueError, match="misaligned"):
        migrate_reference_store(spark, ref, out, skip_codings=True)
    # no completeness marker on the failed index
    from fenix_spark import catalog

    assert not os.path.exists(
        os.path.join(
            catalog.index_path(out, "embeddings", "embedding", "pq"), "_SUCCESS"
        )
    )


def test_migrate_sidecar_column_collision_raises(spark, tmp_path):
    from fenix_spark.sources.migrate import migrate_reference_store

    ref = str(tmp_path / "ref3")
    out = str(tmp_path / "out3")
    _make_ref_store(ref)
    # sidecar whose column collides with a source column name
    _write_stream(
        os.path.join(ref, "indexes", "embeddings", "embedding", "pq.arrow"),
        pa.table({"vec_id": pa.array([0] * 120, type=pa.int64())}),
    )
    with pytest.raises(ValueError, match="collide"):
        migrate_reference_store(spark, ref, out, skip_codings=True)


def test_migrate_size_gate_raises_loudly(spark, tmp_path):
    """A store above max_zip_bytes must refuse the silent
    single-threaded driver zip and name both remedies."""
    from fenix_spark.sources.migrate import migrate_reference_store

    ref = str(tmp_path / "ref_gate")
    out = str(tmp_path / "out_gate")
    _make_ref_store(ref)
    with pytest.raises(ValueError, match="key_col|max_zip_bytes"):
        migrate_reference_store(
            spark, ref, out, skip_codings=True, max_zip_bytes=1024
        )


def test_migrate_keyed_distributed_path(spark, tmp_path):
    """key_col migration: thin (key, code) stream + distributed keyed
    join must produce the same index as the positional zip — the byte
    gate does not apply."""
    from fenix_spark import catalog
    from fenix_spark.sources.migrate import migrate_reference_store

    ref = str(tmp_path / "ref_keyed")
    out = str(tmp_path / "out_keyed")
    _make_ref_store(ref)
    manifest = migrate_reference_store(
        spark, ref, out, skip_codings=True, key_col="vec_id", max_zip_bytes=1024
    )
    assert manifest["indexes"] == ["embeddings/embedding/pq"]
    idx = spark.read.parquet(
        catalog.index_path(out, "embeddings", "embedding", "pq")
    )
    assert set(idx.columns) == {"vec_id", "embedding", "label", "__CODED_ID__"}
    got = {r.vec_id: r["__CODED_ID__"] for r in idx.collect()}
    assert all(got[i] == i % 4 for i in range(120))
    root = catalog.index_path(out, "embeddings", "embedding", "pq")
    assert any(d.startswith("__CODED_ID__=") for d in os.listdir(root))


def test_migrate_keyed_rejects_duplicate_key(spark, tmp_path):
    from fenix_spark.sources.migrate import migrate_reference_store

    ref = str(tmp_path / "ref_dup")
    out = str(tmp_path / "out_dup")
    _make_ref_store(ref)
    # overwrite the source with a duplicated key
    t = _emb_table()
    dup = t.set_column(0, "vec_id", pa.array([0] * 120, type=pa.int64()))
    _write_stream(os.path.join(ref, "sources", "embeddings.arrow"), dup)
    with pytest.raises(ValueError, match="not unique"):
        migrate_reference_store(
            spark, ref, out, skip_codings=True, key_col="vec_id"
        )


def test_write_arrow_ipc_round_trip(spark, tmp_path):
    from fenix_spark.sources.arrowipc_source import register, write_arrow_ipc

    df = spark.range(0, 500).selectExpr(
        "id", "cast(id * 0.5 as double) AS v", "concat('s', id) AS s"
    )
    p = str(tmp_path / "out" / "t.arrow")
    n = write_arrow_ipc(df, p)
    assert n == 500

    # 1) pyarrow reads the stream directly
    import pyarrow.ipc as ipc

    with ipc.open_stream(p) as r:
        t = r.read_all()
    assert t.num_rows == 500 and t.column_names == ["id", "v", "s"]

    # 2) the repo's own arrowipc source round-trips it
    register(spark)
    back = spark.read.format("arrowipc").schema(df.schema).load(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_write_arrow_ipc_cap_is_loud(spark, tmp_path):
    import pytest as _pytest

    from fenix_spark.sources.arrowipc_source import write_arrow_ipc

    df = spark.range(0, 1000)
    with _pytest.raises(ValueError, match="max_rows"):
        write_arrow_ipc(df, str(tmp_path / "x.arrow"), max_rows=10)
