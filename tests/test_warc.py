"""WARC source: writer↔reader round trips over both layouts, HTTP
unwrapping, truncation tolerance, and crawl-pipeline integration
(WARC → html_to_text)."""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from fenix_spark.sources.warc_source import (
    parse_warc_records,
    register,
    split_http_response,
    write_warc,
)

HTML = b"<html><head><title>T</title></head><body><p>hello crawl</p></body></html>"


def _records():
    return [
        {"type": "warcinfo", "payload": b"software: test\r\n",
         "content_type": "application/warc-fields"},
        {"type": "response", "url": "https://example.com/a", "http": True,
         "payload": HTML, "content_type": "text/html; charset=utf-8"},
        {"type": "response", "url": "https://example.com/b", "http": True,
         "status": 404, "payload": b"gone", "content_type": "text/plain"},
        {"type": "metadata", "url": "https://example.com/a",
         "payload": b"fetchTimeMs: 12\r\n", "content_type": "application/warc-fields"},
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip_both_layouts(spark, tmp_path, gz):
    path = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    write_warc(path, _records(), gzip_members=gz)
    register(spark)
    rows = sorted(
        spark.read.format("warc").load(path).collect(),
        key=lambda r: (r["record_type"], r["url"] or ""),
    )
    assert [r["record_type"] for r in rows] == [
        "metadata", "response", "response", "warcinfo",
    ]
    resp_a = next(r for r in rows if r["url"] == "https://example.com/a"
                  and r["record_type"] == "response")
    assert resp_a["http_status"] == 200
    assert resp_a["http_content_type"].startswith("text/html")
    assert bytes(resp_a["payload"]) == HTML
    resp_b = next(r for r in rows if r["url"] == "https://example.com/b")
    assert resp_b["http_status"] == 404 and bytes(resp_b["payload"]) == b"gone"
    info = next(r for r in rows if r["record_type"] == "warcinfo")
    assert info["http_status"] is None
    assert bytes(info["payload"]) == b"software: test\r\n"
    assert all(r["record_id"] for r in rows)


def test_directory_of_files_partitions(spark, tmp_path):
    for i in range(3):
        write_warc(str(tmp_path / f"seg{i}.warc.gz"), _records())
    register(spark)
    df = spark.read.format("warc").load(str(tmp_path))
    assert df.count() == 12
    assert df.select("file").distinct().count() == 3


def test_single_member_gzip_of_many_records(spark, tmp_path):
    """A whole-file gzip (not member-per-record) is legal and must
    parse the same."""
    plain = str(tmp_path / "p.warc")
    write_warc(plain, _records(), gzip_members=False)
    packed = str(tmp_path / "one.warc.gz")
    with open(plain, "rb") as f:
        blob = f.read()
    with open(packed, "wb") as f:
        f.write(gzip.compress(blob))
    register(spark)
    assert spark.read.format("warc").load(packed).count() == 4


def test_truncated_tail_quiet(spark, tmp_path):
    path = str(tmp_path / "t.warc")
    write_warc(path, _records(), gzip_members=False)
    blob = open(path, "rb").read()
    cut = str(tmp_path / "cut.warc")
    with open(cut, "wb") as f:
        f.write(blob[: len(blob) - 60])  # cuts into the last record
    register(spark)
    got = spark.read.format("warc").load(cut).count()
    assert got == 3  # the truncated final record is dropped, not fatal


def test_warc_to_text_pipeline(spark, tmp_path):
    """The crawl path end-to-end: WARC response records → html_to_text
    over the payload column."""
    from pyspark.sql import functions as F

    from fenix_spark.functions.html import html_to_text

    path = str(tmp_path / "c.warc.gz")
    write_warc(path, _records())
    register(spark)
    docs = (
        spark.read.format("warc").load(path)
        .where((F.col("record_type") == "response") & (F.col("http_status") == 200))
        .select("url", F.col("payload").cast("string").alias("html"))
        .select("url", html_to_text(F.col("html")).alias("text"))
    )
    rows = docs.collect()
    assert len(rows) == 1
    assert "hello crawl" in rows[0]["text"]


def test_parse_fuzz_never_raises():
    rng = np.random.default_rng(5)
    for _ in range(150):
        n = int(rng.integers(0, 600))
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert isinstance(list(parse_warc_records(blob)), list)
        assert isinstance(list(parse_warc_records(b"WARC/1.0\r\n" + blob)), list)
    s, c, b = split_http_response(b"HTTP/1.1 twenty OK\r\n\r\nx")
    assert s is None and b.startswith(b"HTTP/")


def test_adversarial_payloads_cannot_break_framing(tmp_path):
    """Content-Length framing means payload BYTES can never be
    mistaken for record structure — including payloads that contain
    'WARC/1.0' lines, header-looking text, and CRLFCRLF runs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tricky = st.one_of(
        st.binary(max_size=400),
        st.just(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake"),
        st.just(b"\r\n\r\n\r\n\r\n"),
        st.just(b"HTTP/1.1 200 OK\r\nContent-Length: 999999\r\n\r\nx"),
        st.binary(max_size=60).map(lambda b: b"WARC/1.0\r\n" + b + b"\r\n\r\n"),
    )

    @settings(max_examples=60, deadline=3000)
    @given(payloads=st.lists(tricky, min_size=1, max_size=5))
    def run(payloads):
        path = str(tmp_path / "adv.warc.gz")
        write_warc(
            path,
            [
                {"type": "resource", "url": f"https://e.x/{i}",
                 "payload": p, "content_type": "application/octet-stream"}
                for i, p in enumerate(payloads)
            ],
        )
        from fenix_spark.sources.warc_source import _gzip_members

        got = [
            rec["block"]
            for member in _gzip_members(path)
            for rec in parse_warc_records(member)
        ]
        assert got == [bytes(p) for p in payloads]

    run()
