"""Store validator (fenix_spark/validate.py): fsck over the catalog
layout — footer reads only, no Spark jobs. Each damage class the
protocol can't prevent (external truncation, mixed-schema appends,
deleted generations) is injected and must surface as ERROR; every
protocol-NORMAL transient (orphan generations, retention-window
layouts, dropped coders, stale spools) must stay INFO."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from fenix_spark import catalog, manifest
from fenix_spark.validate import validate_store


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "store")


def _sev(report, sev):
    return [f for f in report["findings"] if f["severity"] == sev]


def _mk(spark, root, name="t", n=200, files=2):
    df = spark.range(n).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    df.repartition(files).write.mode("overwrite").parquet(
        catalog.source_path(root, name)
    )


def test_healthy_store_has_zero_errors(spark, root):
    _mk(spark, root, "a")
    _mk(spark, root, "b", files=3)
    report = validate_store(root)
    assert report["errors"] == 0
    assert report["tables"] == {"a": 200, "b": 200}


def test_truncated_file_and_mixed_schema_are_errors(spark, root):
    _mk(spark, root, "t")
    d = catalog.source_path(root, "t")
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    # external truncation: the footer is at the END of a parquet file
    with open(os.path.join(d, files[0]), "r+b") as fh:
        fh.truncate(100)
    # mixed schema: a foreign file appended into the layout
    spark.range(5).select(F.col("id").alias("OTHER")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(catalog.source_path(root, "x"))
    other = catalog.source_path(root, "x")
    src = next(f for f in os.listdir(other) if f.endswith(".parquet"))
    shutil.copyfile(os.path.join(other, src), os.path.join(d, "part-zz.parquet"))
    report = validate_store(root)
    msgs = [f["message"] for f in _sev(report, "ERROR")]
    assert any("unreadable footer" in m for m in msgs)
    assert any("schema mismatch" in m for m in msgs)


def test_missing_committed_generation_is_error(spark, root):
    _mk(spark, root, "t")
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    path = catalog.source_path(root, "t")
    shutil.rmtree(manifest.resolve(path))  # external damage
    report = validate_store(root)
    assert any(
        "generation" in f["message"] and "missing" in f["message"]
        for f in _sev(report, "ERROR")
    )


def test_protocol_normal_states_are_info_not_error(spark, root):
    # orphan generation (crashed writer), retention-window flat files,
    # dropped coder under a live index, stale flight spool
    _mk(spark, root, "t", n=300)
    path = catalog.source_path(root, "t")
    catalog.compact(spark, root, "t", target_file_bytes=1 << 30)
    os.makedirs(manifest.begin(path)[1])  # orphan
    os.makedirs(os.path.join(root, ".get-spool-stale"))

    from fenix_spark.operators.coder import CodingConfig
    from fenix_spark.store import Store

    import numpy as np

    rng = np.random.default_rng(3)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(64)],
        "vec_id bigint, emb array<double>",
    )
    st = Store(spark, root)
    st.make_table("vecs", vecs)
    st.make_coder(
        "c8", "vecs", "emb",
        CodingConfig(codebook_size=4, num_codebooks=2, seed=5, max_iter=4),
    )
    st.make_index("vecs", "emb", "c8")
    st.drop_coder("c8")

    report = validate_store(root)
    assert report["errors"] == 0
    infos = " | ".join(f["message"] for f in _sev(report, "INFO"))
    assert "orphan generation" in infos
    assert "retained flat legacy files" in infos
    assert "coder 'c8' absent" in infos
    assert "stale flight spool" in infos
    # the partitioned index layout is still recognized as code-carrying
    assert not any("__CODED_ID__" in f["message"] for f in _sev(report, "ERROR"))


def test_index_without_codes_is_error(spark, root):
    # an "index" that is just a copy of the source (no __CODED_ID__
    # column, no partition dirs) violates the probe-pruning contract
    _mk(spark, root, "t")
    d = os.path.join(root, "indexes", "t", "v", "fake")
    os.makedirs(d)
    src = catalog.source_path(root, "t")
    f = next(x for x in os.listdir(src) if x.endswith(".parquet"))
    shutil.copyfile(os.path.join(src, f), os.path.join(d, f))
    report = validate_store(root)
    assert any("__CODED_ID__" in m["message"] for m in _sev(report, "ERROR"))


def test_cli_exit_codes(spark, root, tmp_path):
    import subprocess
    import sys

    _mk(spark, root, "t")
    ok = subprocess.run(
        [sys.executable, "-m", "fenix_spark.validate", root],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert ok.returncode == 0, ok.stdout + ok.stderr
    assert "0 error(s)" in ok.stdout
    bad = subprocess.run(
        [sys.executable, "-m", "fenix_spark.validate", str(tmp_path / "nope")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert bad.returncode == 1


def test_stray_file_in_index_tree_is_warn_not_crash(spark, root):
    """fsck must survive damage, not crash on it (ADVICE r11): a stray
    FILE where the indexes/<src>/<col>/<coding> layout promises a
    directory used to raise NotADirectoryError and abort the whole
    walk — the one tool meant for damaged stores. Now: WARN finding,
    walk completes, healthy siblings still checked."""
    _mk(spark, root, "t")
    base = os.path.join(root, "indexes")
    os.makedirs(os.path.join(base, "t", "v"))
    # stray files at every level of the tree
    open(os.path.join(base, "README.txt"), "w").write("junk")
    open(os.path.join(base, "t", "junk.bin"), "w").write("junk")
    open(os.path.join(base, "t", "v", "stray"), "w").write("junk")
    report = validate_store(root)  # must not raise
    warns = [m["message"] for m in _sev(report, "WARN")]
    assert sum("stray file" in m for m in warns) == 3
    assert report["tables"]["t"] == 200  # the rest of the fsck ran
