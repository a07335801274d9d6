"""WebDataset export tests: tar round-trip with stdlib tarfile,
sample-group integrity, byte-level determinism, and manifest truth."""

from __future__ import annotations

import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from fenix_spark.multimodal import synthesize_media
from fenix_spark.operators.webdataset import write_webdataset


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    media = synthesize_media(spark, 48).selectExpr(
        "media_id", "data", "meta.format AS fmt", "kind", "meta.width AS width"
    )
    out = str(tmp_path_factory.mktemp("wds"))
    manifest = write_webdataset(
        media, out, "media_id", "data", "fmt",
        meta_cols=("kind", "width"), shard_rows=16,
    )
    return media, out, manifest.collect()


def test_manifest_matches_tar_contents(spark, exported):
    media, out, manifest = exported
    assert sum(m.n_samples for m in manifest) == media.count()
    for m in manifest:
        assert os.path.exists(m.shard)
        with tarfile.open(m.shard) as tar:
            names = tar.getnames()
            assert len(names) == 2 * m.n_samples  # payload + json per sample
            assert sum(i.size for i in tar.getmembers()) == m.n_bytes


def test_sample_groups_roundtrip(spark, exported):
    media, out, manifest = exported
    want = {
        str(r.media_id): (bytes(r.data), r.fmt, r.kind, r.width)
        for r in media.collect()
    }
    got = {}
    for m in manifest:
        with tarfile.open(m.shard) as tar:
            by_key: dict[str, dict] = {}
            for info in tar.getmembers():
                key, ext = info.name.rsplit(".", 1)
                by_key.setdefault(key, {})[ext] = tar.extractfile(info).read()
            for key, files in by_key.items():
                meta = json.loads(files.pop("json"))
                (ext, payload), = files.items()
                got[key] = (payload, ext, meta["kind"], meta["width"])
    assert got == want


def test_export_is_deterministic(spark, tmp_path):
    media = synthesize_media(spark, 30).selectExpr(
        "media_id", "data", "meta.format AS fmt", "kind"
    )
    outs = []
    for sub in ("a", "b"):
        out = str(tmp_path / sub)
        write_webdataset(
            media.repartition(3 if sub == "a" else 7),
            out, "media_id", "data", "fmt", meta_cols=("kind",), shard_rows=8,
        )
        outs.append(
            {
                f: open(os.path.join(out, f), "rb").read()
                for f in sorted(os.listdir(out))
            }
        )
    assert outs[0] == outs[1]  # byte-identical shards, any partitioning


def test_salt_changes_layout(spark, tmp_path):
    media = synthesize_media(spark, 30).selectExpr(
        "media_id", "data", "meta.format AS fmt"
    )
    m1 = write_webdataset(
        media, str(tmp_path / "s1"), "media_id", "data", "fmt", shard_rows=8
    ).collect()
    m2 = write_webdataset(
        media, str(tmp_path / "s2"), "media_id", "data", "fmt", shard_rows=8, salt="x"
    ).collect()
    assert sum(m.n_samples for m in m1) == sum(m.n_samples for m in m2)
    assert {m.n_samples for m in m1} != {m.n_samples for m in m2} or [
        open(m.shard, "rb").read() for m in m1[:1]
    ] != [open(m.shard, "rb").read() for m in m2[:1]]


# ------------------------------------------- python datasource reader


def test_datasource_roundtrip(spark, tmp_path):
    """write_webdataset → read.format('webdataset') recovers every
    sample: keys, payload bytes, extension, metadata."""
    import json

    from fenix_spark.operators.webdataset import write_webdataset
    from fenix_spark.sources.webdataset_source import register

    rows = [
        (i, bytes([i % 251]) * (10 + i), "bin", f"label{i % 3}")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, data binary, ext string, label string"
    )
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        df, out, "id", "data", "ext", meta_cols=("label",), shard_rows=20
    )
    n_shards = manifest.count()
    assert n_shards == 3

    register(spark)
    back = spark.read.format("webdataset").load(out)
    got = {r.key: r for r in back.collect()}
    assert len(got) == 60
    for i, payload, ext, label in rows:
        r = got[str(i)]
        assert bytes(r.data) == payload
        assert r.ext == ext
        assert json.loads(r.meta) == {"label": label}

    # one input partition per shard → full scan parallelism
    parts = back.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts == n_shards


def test_datasource_metadata_only_scan(spark, tmp_path):
    from fenix_spark.operators.webdataset import write_webdataset
    from fenix_spark.sources.webdataset_source import register

    df = spark.createDataFrame(
        [(i, b"x" * 1000, "bin", i % 2) for i in range(30)],
        "id bigint, data binary, ext string, parity bigint",
    )
    out = str(tmp_path / "wds2")
    write_webdataset(df, out, "id", "data", "ext", meta_cols=("parity",), shard_rows=15)

    register(spark)
    # a user-supplied schema reaches the reader → payload bytes are
    # never materialized (the data-skipping path)
    meta = (
        spark.read.format("webdataset")
        .schema("key string, meta string")
        .load(out)
    )
    rows = meta.collect()
    assert len(rows) == 30
    assert set(meta.columns) == {"key", "meta"}
    import json as _json

    assert all(_json.loads(r.meta)["parity"] in (0, 1) for r in rows)


def test_datasource_multi_payload_sample(spark, tmp_path):
    """A sample with several payload members (key.jpg + key.cls)
    yields one row per payload, each carrying the sample's json
    metadata — nothing silently dropped."""
    import io
    import json
    import tarfile

    from fenix_spark.sources.webdataset_source import register

    shard = tmp_path / "multi.tar"

    def add(tar, name, data):
        ti = tarfile.TarInfo(name)
        ti.size = len(data)
        tar.addfile(ti, io.BytesIO(data))

    with tarfile.open(shard, "w") as tar:
        add(tar, "a.jpg", b"JPGBYTES")
        add(tar, "a.cls", b"7")
        add(tar, "a.json", json.dumps({"label": "x"}).encode())
        add(tar, "b.jpg", b"OTHER")

    register(spark)
    rows = spark.read.format("webdataset").load(str(shard)).collect()
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    assert {r.ext for r in by_key["a"]} == {"jpg", "cls"}
    for r in by_key["a"]:
        assert json.loads(r.meta) == {"label": "x"}
    assert {r.ext: bytes(r.data) for r in by_key["a"]} == {
        "jpg": b"JPGBYTES",
        "cls": b"7",
    }
    assert len(by_key["b"]) == 1
    assert by_key["b"][0].meta is None


def test_read_truncated_shard_ends_file_not_task(spark, exported, tmp_path):
    """Crawl-source discipline ported to the shard reader: a shard cut
    mid-member yields the samples before the damage (none torn), other
    shards are unaffected, and the task survives."""
    import shutil

    from fenix_spark.sources.webdataset_source import register

    register(spark)
    media, out, manifest = exported
    paths = sorted(r["shard"] for r in manifest)
    full = spark.read.format("webdataset").load(paths[0]).count()
    cut = tmp_path / "cut.tar"
    size = os.path.getsize(paths[0])
    shutil.copy(paths[0], cut)
    with open(cut, "r+b") as f:
        f.truncate(size // 2)
    kept = spark.read.format("webdataset").load(str(cut)).collect()
    assert 0 < len(kept) < full
    for r in kept:  # parsed samples are complete, not torn
        assert r["data"] is not None and r["meta"] is not None
    # a whole shard of garbage bytes contributes nothing, kills nothing
    junk = tmp_path / "junk.tar"
    junk.write_bytes(b"\x00not a tar at all" * 100)
    assert spark.read.format("webdataset").load(str(junk)).count() == 0
