"""End-to-end crawl pipeline over the round-6 pieces, every stage
consuming the previous stage's real output:

    WARC (gzip member-per-record, mixed charsets)
      → warc source (HTTP unwrap, status filter)
      → payloads_to_text (charset resolution)
      → html_to_text (boilerplate strip)
      → exact dedup + ExactSubstr (shared boilerplate excision)

Synthetic corpus plants: one exact duplicate page, one shared
80-token boilerplate block across two otherwise-distinct pages, one
windows-1252 page, one 404, one warcinfo record.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.functions.charset import payloads_to_text
from fenix_spark.functions.html import html_to_text
from fenix_spark.operators.dedup import exact_dedup_by_hash
from fenix_spark.operators.substring import dedup_substrings
from fenix_spark.sources.warc_source import register, write_warc


def _page(body_text: str, charset: str = "utf-8") -> bytes:
    html = (
        "<html><head><title>t</title><script>var x=1;</script></head>"
        f"<body><p>{body_text}</p></body></html>"
    )
    return html.encode(charset)


def test_crawl_to_clean_corpus(spark, tmp_path):
    rng = np.random.default_rng(2024)
    vocab = [f"tok{i}" for i in range(300)]

    def words(n):
        return " ".join(vocab[i] for i in rng.integers(0, len(vocab), n))

    boiler = " ".join(f"legal{i}" for i in range(80))
    page_a = words(150)
    page_b = words(140) + " " + boiler
    page_c = boiler + " " + words(130)
    page_1252 = "smart “quoted” view " + words(60)

    records = [
        {"type": "warcinfo", "payload": b"software: t\r\n",
         "content_type": "application/warc-fields"},
        {"type": "response", "url": "https://x.example/a", "http": True,
         "payload": _page(page_a), "content_type": "text/html; charset=utf-8"},
        {"type": "response", "url": "https://x.example/a-copy", "http": True,
         "payload": _page(page_a), "content_type": "text/html; charset=utf-8"},
        {"type": "response", "url": "https://x.example/b", "http": True,
         "payload": _page(page_b), "content_type": "text/html; charset=utf-8"},
        {"type": "response", "url": "https://x.example/c", "http": True,
         "payload": _page(page_c), "content_type": "text/html; charset=utf-8"},
        {"type": "response", "url": "https://x.example/win", "http": True,
         "payload": _page(page_1252, "windows-1252"),
         "content_type": "text/html; charset=windows-1252"},
        {"type": "response", "url": "https://x.example/gone", "http": True,
         "status": 404, "payload": b"<html>404</html>",
         "content_type": "text/html"},
    ]
    warc_path = str(tmp_path / "seg0.warc.gz")
    write_warc(warc_path, records)

    register(spark)
    raw = spark.read.format("warc").load(warc_path)
    ok_html = raw.where(
        (F.col("record_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").startswith("text/html")
    )
    texts = payloads_to_text(ok_html).withColumnRenamed("id", "url")
    docs = texts.select(
        "url", html_to_text(F.col("text")).alias("text")
    ).where(F.length("text") > 0)

    rows = {r["url"]: r["text"] for r in docs.collect()}
    assert set(rows) == {
        "https://x.example/a", "https://x.example/a-copy",
        "https://x.example/b", "https://x.example/c", "https://x.example/win",
    }
    assert "“quoted”" in rows["https://x.example/win"]  # charset survived
    assert "var x=1" not in rows["https://x.example/a"]  # script stripped

    # exact dedup: /a and /a-copy collapse to one survivor
    groups = exact_dedup_by_hash(docs, "text", "url").collect()
    dup_group = next(g for g in groups if g["dup_count"] == 2)
    assert dup_group["kept_id"] == "https://x.example/a"

    # ExactSubstr: the shared boilerplate keeps exactly one copy
    deduped = dedup_substrings(docs, "text", "url", min_tokens=50)
    out = {r["url"]: r for r in deduped.collect()}
    total_boiler = sum(r["text"].count(boiler) for r in out.values())
    assert total_boiler == 1  # one canonical copy survives corpus-wide
    removed = {u: r["tokens_removed"] for u, r in out.items()}
    assert removed["https://x.example/win"] == 0
    assert sum(1 for v in removed.values() if v >= 80) >= 1
