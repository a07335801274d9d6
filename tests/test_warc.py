"""WARC source: writer↔reader round trips over both layouts, HTTP
unwrapping, truncation tolerance, and crawl-pipeline integration
(WARC → html_to_text)."""

from __future__ import annotations

import gzip
import os

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


def test_plain_streaming_bounded_memory(tmp_path):
    """The uncompressed branch must stream with one-record memory —
    the old whole-file read() OOMs on multi-GB plain WARCs (legal per
    ISO 28500). Peak tracemalloc over a 40 MiB file of 1 MiB records
    must stay near one record, nowhere near file size."""
    import tracemalloc

    from fenix_spark.sources.warc_source import stream_plain_records

    path = str(tmp_path / "big.warc")
    rec_payload = bytes(np.random.default_rng(0).integers(0, 256, 1 << 20, dtype=np.uint8))
    write_warc(
        path,
        [{"type": "resource", "url": f"https://x/{i}", "payload": rec_payload}
         for i in range(40)],
        gzip_members=False,
    )
    assert os.path.getsize(path) > 40 << 20
    tracemalloc.start()
    n = 0
    for rec in stream_plain_records(path):
        assert len(rec["block"]) == len(rec_payload)
        n += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 40
    assert peak < 8 << 20, f"peak {peak} — not one-record memory"


def test_plain_streaming_matches_whole_buffer_parse(tmp_path):
    from fenix_spark.sources.warc_source import parse_warc_records, stream_plain_records

    path = str(tmp_path / "p.warc")
    write_warc(path, _records(), gzip_members=False)
    with open(path, "rb") as f:
        whole = list(parse_warc_records(f.read()))
    streamed = list(stream_plain_records(path))
    assert streamed == whole


def test_plain_oversized_record_skipped_rest_parses(tmp_path):
    """A block past max_block is skipped IN PLACE (plain files are
    seekable) and later records still parse — better than the gzip
    branch's drop-rest-of-file."""
    from fenix_spark.sources.warc_source import stream_plain_records

    path = str(tmp_path / "o.warc")
    write_warc(
        path,
        [
            {"type": "resource", "url": "https://x/small1", "payload": b"a" * 100},
            {"type": "resource", "url": "https://x/huge", "payload": b"b" * 50_000},
            {"type": "resource", "url": "https://x/small2", "payload": b"c" * 100},
        ],
        gzip_members=False,
    )
    got = [r["url"] for r in stream_plain_records(path, max_block=10_000)]
    assert got == ["https://x/small1", "https://x/small2"]


def test_plain_truncated_tail_quiet_stream(tmp_path):
    from fenix_spark.sources.warc_source import stream_plain_records

    path = str(tmp_path / "t.warc")
    write_warc(
        path,
        [{"type": "resource", "url": "https://x/1", "payload": b"a" * 5000},
         {"type": "resource", "url": "https://x/2", "payload": b"b" * 5000}],
        gzip_members=False,
    )
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) - 3000])  # cut inside record 2
    got = [r["url"] for r in stream_plain_records(path)]
    assert got == ["https://x/1"]


def test_gzip_bomb_member_allocation_bounded(tmp_path, monkeypatch):
    """The gzip member cap must bound ALLOCATION (decompress gets a
    max_length budget), not just detect the bomb after inflating it."""
    import tracemalloc

    from fenix_spark import sources as _s
    from fenix_spark.sources import warc_source

    path = str(tmp_path / "bomb.warc.gz")
    bomb = gzip.compress(b"\x00" * (64 << 20))  # 64 MiB from ~64 KiB
    with open(path, "wb") as f:
        f.write(bomb)
    monkeypatch.setattr(warc_source, "_MAX_MEMBER_OUT", 1 << 20)
    tracemalloc.start()
    members = list(warc_source._gzip_members(path))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert members == []  # bomb member dropped quietly
    assert peak < 6 << 20, f"peak {peak} — budget not bounding allocation"
