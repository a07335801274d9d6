"""Torch-free reading of the reference's ``.torch`` coding files.

The fixture writer reproduces ``torch.save``'s zip layout exactly —
``<prefix>/data.pkl`` with GLOBAL records ``torch._utils
_rebuild_tensor_v2`` / ``torch FloatStorage`` and persistent-id
externalized storages under ``<prefix>/data/<key>`` — by registering
stub ``torch`` modules in ``sys.modules`` ONLY while pickling (pickle
stores module+name strings, so the emitted bytes are identical to a
real torch's). The reader under test never sees the stubs.
"""

from __future__ import annotations

import os
import pickle
import sys
import types
import zipfile
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pytest

from fenix_spark.sources.torchpickle import (
    import_reference_coding,
    load_reference_coding,
    read_torch_pickle,
)

_DTYPE_TO_STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("uint16"): "BFloat16Storage",  # fixture-side bf16 carrier
}


class _FakeStorage:
    def __init__(self, arr: np.ndarray, storage_name: str | None = None):
        self.arr = np.ascontiguousarray(arr).reshape(-1)
        self.storage_name = storage_name or _DTYPE_TO_STORAGE[self.arr.dtype]


class _FakeTensor:
    """Pickles exactly like a torch Tensor: REDUCE on
    torch._utils._rebuild_tensor_v2 with an externalized storage."""

    def __init__(self, storage: _FakeStorage, offset, size, stride):
        self.storage, self.offset = storage, offset
        self.size, self.stride = tuple(size), tuple(stride)

    def __reduce_ex__(self, protocol):
        rebuild = sys.modules["torch._utils"]._rebuild_tensor_v2
        return (
            rebuild,
            (self.storage, self.offset, self.size, self.stride, False, OrderedDict()),
        )


def _install_torch_stubs():
    torch = types.ModuleType("torch")
    utils = types.ModuleType("torch._utils")

    def _rebuild_tensor_v2(*a):  # never called — exists to be pickled by name
        raise AssertionError

    _rebuild_tensor_v2.__module__ = "torch._utils"
    _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
    utils._rebuild_tensor_v2 = _rebuild_tensor_v2
    for name in ("FloatStorage", "DoubleStorage", "LongStorage", "BFloat16Storage"):
        cls = type(name, (), {"__module__": "torch", "__qualname__": name})
        setattr(torch, name, cls)
    torch._utils = utils
    sys.modules["torch"] = torch
    sys.modules["torch._utils"] = utils


def _remove_torch_stubs():
    sys.modules.pop("torch", None)
    sys.modules.pop("torch._utils", None)


def torch_save(path: str, obj) -> None:
    """Write ``obj`` in torch's zip serialization format, no torch."""
    _install_torch_stubs()
    try:
        storages: list[tuple[str, bytes]] = []

        class P(pickle.Pickler):
            def persistent_id(self, o):
                if isinstance(o, _FakeStorage):
                    key = str(len(storages))
                    storages.append((key, o.arr.tobytes()))
                    stype = getattr(sys.modules["torch"], o.storage_name)
                    return ("storage", stype, key, "cpu", int(o.arr.size))
                return None

        import io

        buf = io.BytesIO()
        P(buf, protocol=2).dump(obj)
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
            zf.writestr("archive/data.pkl", buf.getvalue())
            zf.writestr("archive/byteorder", "little")
            zf.writestr("archive/version", "3")
            for key, data in storages:
                zf.writestr(f"archive/data/{key}", data)
    finally:
        _remove_torch_stubs()


def _coding_obj(tensor: np.ndarray, metric="l2", column=None):
    n, k, _ = tensor.shape
    storage = _FakeStorage(tensor)
    size = tensor.shape
    stride = tuple(s // tensor.itemsize for s in tensor.strides)
    return {
        "tensor": _FakeTensor(storage, 0, size, stride),
        "column": column if column is not None else pa.list_(pa.float32(), 48),
        "config": {
            "metric": metric,
            "codebook_size": k,
            "num_codebooks": n,
            "batch_size": 256,
            "num_epochs": 2,
        },
    }


def test_roundtrip_coding(tmp_path):
    rng = np.random.default_rng(7)
    tensor = rng.normal(size=(3, 5, 16)).astype(np.float32)
    path = str(tmp_path / "c.torch")
    torch_save(path, _coding_obj(tensor, metric="cosine"))
    assert "torch" not in sys.modules  # stubs gone; reader is torch-free

    d = load_reference_coding(path)
    np.testing.assert_allclose(d["tensor"], tensor, rtol=0, atol=0)
    assert d["config"]["metric"] == "cosine"
    assert d["config"]["num_codebooks"] == 3
    assert d["column"] == pa.list_(pa.float32(), 48)


def test_noncontiguous_tensor_strides(tmp_path):
    """A transposed (non-contiguous) tensor round-trips through the
    stride-aware rebuild — the reader must honor stride, not assume
    C order."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(4, 6)).astype(np.float64)
    t = base.T  # shape (6, 4), strides in elements: (1, 6)
    storage = _FakeStorage(base)  # storage holds the ORIGINAL layout
    obj = {"t": _FakeTensor(storage, 0, t.shape, (1, 6))}
    path = str(tmp_path / "s.torch")
    torch_save(path, obj)
    got = read_torch_pickle(path)["t"]
    np.testing.assert_array_equal(got, base.T)
    assert got.flags["C_CONTIGUOUS"]


def test_storage_offset(tmp_path):
    arr = np.arange(10, dtype=np.int64)
    obj = {"t": _FakeTensor(_FakeStorage(arr), 3, (4,), (1,))}
    path = str(tmp_path / "o.torch")
    torch_save(path, obj)
    np.testing.assert_array_equal(read_torch_pickle(path)["t"], arr[3:7])


def test_bfloat16_widens_exactly(tmp_path):
    f32 = np.array([1.5, -2.0, 0.15625, 3e38], dtype=np.float32)
    bf16 = (f32.view(np.uint32) >> 16).astype(np.uint16)  # exact-in-bf16 values
    obj = {"t": _FakeTensor(_FakeStorage(bf16, "BFloat16Storage"), 0, (4,), (1,))}
    path = str(tmp_path / "b.torch")
    torch_save(path, obj)
    got = read_torch_pickle(path)["t"]
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, (bf16.astype(np.uint32) << 16).view(np.float32))


def test_refuses_foreign_global(tmp_path):
    path = str(tmp_path / "evil.torch")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"f": os.system}, protocol=2))
    with pytest.raises(pickle.UnpicklingError, match="refusing to unpickle"):
        read_torch_pickle(path)


def test_legacy_format_raises_by_name(tmp_path):
    path = str(tmp_path / "legacy.torch")
    with open(path, "wb") as f:
        f.write(b"\x80\x02not-a-zip")
    with pytest.raises(NotImplementedError, match="legacy"):
        read_torch_pickle(path)


def test_big_endian_raises(tmp_path):
    path = str(tmp_path / "be.torch")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({}, protocol=2))
        zf.writestr("archive/byteorder", "big")
    with pytest.raises(NotImplementedError, match="endian"):
        read_torch_pickle(path)


def test_shape_config_mismatch_raises(tmp_path):
    tensor = np.zeros((2, 4, 8), dtype=np.float32)
    obj = _coding_obj(tensor)
    obj["config"]["codebook_size"] = 16  # lies about the tensor shape
    path = str(tmp_path / "m.torch")
    torch_save(path, obj)
    with pytest.raises(ValueError, match="does not match config"):
        load_reference_coding(path)


def test_import_reference_coding_spark(spark, tmp_path):
    from fenix_spark.operators.coder import coding_to_numpy

    rng = np.random.default_rng(3)
    tensor = rng.normal(size=(2, 8, 32)).astype(np.float32)
    path = str(tmp_path / "c.torch")
    torch_save(path, _coding_obj(tensor, metric="l2"))
    out = str(tmp_path / "coding")
    df = import_reference_coding(spark, path, out)
    cents, metric, k, n = coding_to_numpy(df)
    assert (metric, k, n) == ("l2", 8, 2)
    np.testing.assert_allclose(cents, tensor.astype(np.float64), rtol=1e-7)


def test_migrate_imports_codings(spark, tmp_path):
    """End-to-end: a reference store whose coding is a REAL torch-format
    file migrates with the coding imported (no skip, no retrain) and
    the result drives assign_codes identically to the source tensor."""
    from fenix_spark import catalog
    from fenix_spark.sources.migrate import migrate_reference_store

    ref = str(tmp_path / "ref")
    os.makedirs(os.path.join(ref, "codings"))
    rng = np.random.default_rng(5)
    tensor = rng.normal(size=(2, 4, 8)).astype(np.float32)
    torch_save(os.path.join(ref, "codings", "pq.torch"), _coding_obj(tensor))

    out = str(tmp_path / "out")
    manifest = migrate_reference_store(spark, ref, out)
    assert manifest["codings"] == ["pq"]
    assert manifest["codings_skipped"] == []
    coding = spark.read.parquet(catalog.coding_path(out, "pq"))
    assert coding.count() == 2 * 4


def test_out_of_bounds_tensor_view_refused(tmp_path):
    """as_strided does no bounds checking — a hostile (offset, size,
    stride) must be refused, not read process memory."""
    arr = np.arange(8, dtype=np.int64)
    evil = {"t": _FakeTensor(_FakeStorage(arr), 0, (4,), (1_000_000,))}
    path = str(tmp_path / "oob.torch")
    torch_save(path, evil)
    with pytest.raises(pickle.UnpicklingError, match="outside"):
        read_torch_pickle(path)
    evil2 = {"t": _FakeTensor(_FakeStorage(arr), 6, (4,), (1,))}
    path2 = str(tmp_path / "oob2.torch")
    torch_save(path2, evil2)
    with pytest.raises(pickle.UnpicklingError, match="outside"):
        read_torch_pickle(path2)


def test_full_switching_lifecycle(spark, tmp_path):
    """The whole switching story in one test: a reference-layout store
    (Arrow IPC source, REAL torch-format coding, positional index
    sidecar whose codes were derived from that same coding) migrates
    torch-free, the imported coding drives assign_code_expr exactly as
    numpy argmin does, and Store.search over the migrated index with
    probes=all equals brute-force KNN over the source."""
    import pyarrow as pa

    from fenix_spark import Store
    from fenix_spark.operators.index import CODE_COL, assign_code_expr
    from fenix_spark.sources.migrate import migrate_reference_store

    rng = np.random.default_rng(13)
    n_rows, dim, k, nb = 200, 8, 4, 2
    vecs = rng.normal(size=(n_rows, dim)).astype(np.float32)
    cents = rng.normal(size=(nb, k, dim // nb)).astype(np.float32)

    # numpy ground-truth joint codes: argmin per codebook, base-k digits
    def joint_codes(v):
        subs = v.reshape(len(v), nb, dim // nb)
        codes = np.zeros(len(v), dtype=np.int64)
        for j in range(nb):
            d = ((subs[:, j, None, :] - cents[j][None, :, :]) ** 2).sum(-1)
            codes = codes * k + d.argmin(1)
        return codes

    ref = str(tmp_path / "ref")
    os.makedirs(os.path.join(ref, "sources"))
    os.makedirs(os.path.join(ref, "codings"))
    os.makedirs(os.path.join(ref, "indexes", "emb", "embedding"))
    t = pa.table(
        {
            "vec_id": pa.array(range(n_rows), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), pa.float32()), dim
            ),
        }
    )
    with pa.OSFile(os.path.join(ref, "sources", "emb.arrow"), "wb") as f:
        with pa.ipc.new_stream(f, t.schema) as w:
            for b in t.to_batches(max_chunksize=64):
                w.write_batch(b)
    torch_save(
        os.path.join(ref, "codings", "pq.torch"),
        _coding_obj(cents, metric="l2", column=pa.list_(pa.float32(), dim)),
    )
    side = pa.table({"__CODED_ID__": pa.array(joint_codes(vecs), pa.int64())})
    with pa.OSFile(os.path.join(ref, "indexes", "emb", "embedding", "pq.arrow"), "wb") as f:
        with pa.ipc.new_stream(f, side.schema) as w:
            w.write_table(side)

    out = str(tmp_path / "out")
    manifest = migrate_reference_store(spark, ref, out)
    assert manifest == {
        "sources": ["emb"],
        "indexes": ["emb/embedding/pq"],
        "codings": ["pq"],
        "codings_skipped": [],
    }

    store = Store(spark, out)
    # imported coding drives the assignment operator == numpy argmin
    coding = store.read_coder("pq")
    src = store.read_table("emb")
    got = {
        r["vec_id"]: r["c"]
        for r in src.select(
            "vec_id", assign_code_expr("embedding", coding).alias("c")
        ).collect()
    }
    want = joint_codes(vecs)
    assert all(got[i] == want[i] for i in range(n_rows))

    # probe-ALL-cells search over the migrated index == brute KNN
    target = vecs[7].astype(float).tolist()
    brute = store.search("emb", "embedding", target, maxval=5, id_col="vec_id")
    probed = store.search(
        "emb", "embedding", target, maxval=5, coding="pq",
        probes=k**nb, id_col="vec_id",
    )
    b = [(r["vec_id"], round(r["__DISTANCE__"], 9)) for r in brute.collect()]
    p = [(r["vec_id"], round(r["__DISTANCE__"], 9)) for r in probed.collect()]
    assert b == p and b[0][0] == 7


def test_fuzz_mutated_archives_raise_one_exception_family(tmp_path):
    """Malformed .torch files must fail CLEANLY: read_torch_pickle
    raises only UnpicklingError / ValueError / NotImplementedError —
    never a raw EOFError/KeyError/struct.error from the pickle
    machinery (migration catches exactly that documented family)."""
    rng = np.random.default_rng(77)
    tensor = rng.normal(size=(2, 4, 8)).astype(np.float32)
    base = str(tmp_path / "base.torch")
    torch_save(base, _coding_obj(tensor))
    valid = open(base, "rb").read()

    cases = []
    for i in range(60):  # byte mutations
        buf = bytearray(valid)
        for _ in range(rng.integers(1, 8)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        cases.append(bytes(buf))
    for i in range(20):  # truncations
        cases.append(valid[: rng.integers(1, len(valid))])
    cases.append(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes())

    # an archive whose pickle references a storage that is not there
    missing = str(tmp_path / "missing.torch")
    with zipfile.ZipFile(missing, "w") as zf:
        with zipfile.ZipFile(base) as src:
            zf.writestr("archive/data.pkl", src.read("archive/data.pkl"))
            zf.writestr("archive/byteorder", "little")
    cases.append(open(missing, "rb").read())

    allowed = (pickle.UnpicklingError, ValueError, NotImplementedError)
    p = str(tmp_path / "fuzz.torch")
    ok = 0
    for data in cases:
        with open(p, "wb") as f:
            f.write(data)
        try:
            read_torch_pickle(p)
            ok += 1  # a mutation can land in storage bytes — still valid
        except allowed:
            pass
    assert ok < len(cases)  # the suite actually exercised failures


# ---------------------------------------------------------------
# EXPORT half (sources/torchpickle.write_torch_pickle /
# export_reference_coding): a Spark-trained coding serialized into the
# reference's codings/<name>.torch layout (ref: io/coder/coder.py:
# 120-125), proven by re-importing through the INDEPENDENT reader and
# by byte-level comparison with this file's fixture writer (which
# reproduces real torch.save bytes).


def test_export_reference_coding_round_trip(spark, tmp_path):
    """export → load_reference_coding bit-parity: tensor, config, and
    column type all survive; import_reference_coding of the export
    equals the original coding table."""
    from fenix_spark.operators.coder import coding_to_numpy
    from fenix_spark.sources.torchpickle import export_reference_coding

    rng = np.random.default_rng(11)
    tensor = rng.normal(size=(2, 4, 8)).astype(np.float32)
    rows = [
        (j, c, tensor[j, c].astype(np.float64).tolist(), "cosine", 4, 2)
        for j in range(2)
        for c in range(4)
    ]
    coding = spark.createDataFrame(
        rows,
        "codebook int, cell int, centroid array<double>, "
        "metric string, codebook_size int, num_codebooks int",
    )
    p = str(tmp_path / "codings" / "pq.torch")
    export_reference_coding(coding, p)

    d = load_reference_coding(p)
    np.testing.assert_array_equal(d["tensor"], tensor)  # bit parity
    assert d["config"] == {
        "metric": "cosine",
        "codebook_size": 4,
        "num_codebooks": 2,
        "batch_size": 256,
        "num_epochs": 1,
    }
    assert d["column"] == pa.list_(pa.float32(), 16)

    back = import_reference_coding(spark, p, str(tmp_path / "coding_tbl"))
    cents, metric, k, n = coding_to_numpy(back)
    assert (metric, k, n) == ("cosine", 4, 2)
    np.testing.assert_allclose(cents, tensor.astype(np.float64), rtol=1e-7)


def test_export_bytes_match_fixture_writer(tmp_path):
    """The product writer and this file's fixture writer (pinned to
    real torch.save's layout) produce byte-identical archives for the
    same coding object — pickle stream, storage bytes, and members."""
    from fenix_spark.sources.torchpickle import (
        _NumpyTensorProxy,
        write_torch_pickle,
    )

    rng = np.random.default_rng(7)
    tensor = rng.normal(size=(2, 3, 4)).astype(np.float32)
    obj_fixture = _coding_obj(tensor, metric="l2")
    p1 = str(tmp_path / "fixture.torch")
    torch_save(p1, obj_fixture)

    obj_product = {
        "tensor": _NumpyTensorProxy(tensor),
        "column": pa.list_(pa.float32(), 48),
        "config": {
            "metric": "l2",
            "codebook_size": 3,
            "num_codebooks": 2,
            "batch_size": 256,
            "num_epochs": 2,
        },
    }
    p2 = str(tmp_path / "product.torch")
    write_torch_pickle(p2, obj_product)

    with zipfile.ZipFile(p1) as z1, zipfile.ZipFile(p2) as z2:
        assert z1.namelist() == z2.namelist()
        for name in z1.namelist():
            assert z1.read(name) == z2.read(name), name


def test_export_trained_coding_serves_identically(spark, tmp_path):
    """Full loop: train a coding on Spark, export to .torch, re-import,
    and ASSIGN with both — the joint cell id agrees for every row up to
    the float32 serialization (distance ties broken identically), so
    the export really is the model, not a lossy copy. Exactness check:
    re-exporting the IMPORT reproduces identical bytes (float32 is a
    fixpoint)."""
    import filecmp

    from fenix_spark.operators.coder import CodingConfig, train_coding
    from fenix_spark.operators.index import assign_code_expr
    from fenix_spark.sources.torchpickle import export_reference_coding

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coding = train_coding(
        emb,
        "embedding",
        CodingConfig(metric="l2", codebook_size=8, num_codebooks=2, seed=5),
    )
    p = str(tmp_path / "codings" / "trained.torch")
    export_reference_coding(coding, p)
    back = import_reference_coding(spark, p, str(tmp_path / "tbl"))

    a = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", assign_code_expr("embedding", coding).alias("c")
        ).collect()
    }
    b = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id", assign_code_expr("embedding", back).alias("c")
        ).collect()
    }
    assert len(a) > 0
    agree = sum(1 for i in a if a[i] == b[i])
    # float64-trained centroids quantize to float32 on the reference
    # wire; a disagreement needs a row nearly equidistant to two
    # centroids — none exist in this corpus
    assert agree == len(a), f"{agree}/{len(a)} codes agree"

    # export of the re-import is byte-identical (f32 round-trip fixpoint)
    p2 = str(tmp_path / "codings" / "again.torch")
    export_reference_coding(back, p2)
    assert filecmp.cmp(p, p2, shallow=False)


def test_export_rejects_sparse_or_empty_coding(spark, tmp_path):
    from fenix_spark.sources.torchpickle import export_reference_coding

    empty = spark.createDataFrame(
        [],
        "codebook int, cell int, centroid array<double>, "
        "metric string, codebook_size int, num_codebooks int",
    )
    with pytest.raises(ValueError, match="empty"):
        export_reference_coding(empty, str(tmp_path / "e.torch"))
    sparse = spark.createDataFrame(
        [(0, 0, [1.0], "l2", 2, 1)],
        "codebook int, cell int, centroid array<double>, "
        "metric string, codebook_size int, num_codebooks int",
    )
    with pytest.raises(ValueError, match="distinct"):
        export_reference_coding(sparse, str(tmp_path / "s.torch"))
