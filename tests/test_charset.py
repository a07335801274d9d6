"""Charset resolution/decoding: the WHATWG-ish detection order, wrong
declarations degrading instead of dropping, and the WARC integration."""

from __future__ import annotations

import numpy as np
import pytest

from fenix_spark.functions.charset import (
    decode_text,
    payloads_to_text,
    resolve_charset,
)

TEXT = "naïve café — Büro 人生"


def test_bom_beats_everything():
    data = "﻿" + TEXT
    blob = data.encode("utf-8")  # utf-8-sig layout
    codec, src = resolve_charset(blob, "text/html; charset=shift_jis")
    assert (codec, src) == ("utf-8-sig", "bom")
    assert decode_text(blob, "text/html; charset=shift_jis")[0] == TEXT
    blob16 = TEXT.encode("utf-16")  # BOM-led
    assert resolve_charset(blob16)[1] == "bom"
    assert decode_text(blob16)[0] == TEXT


def test_header_charset():
    blob = TEXT.encode("windows-1252", errors="ignore")
    text, codec, ok = decode_text(blob, 'text/html; charset="windows-1252"')
    assert codec == "windows-1252" and ok
    assert "café" in text


def test_meta_declaration_both_forms():
    for meta in (
        b'<meta charset="shift_jis">',
        b'<meta http-equiv="Content-Type" content="text/html; charset=shift_jis">',
    ):
        blob = b"<html><head>" + meta + b"</head>" + "こんにちは".encode("shift_jis")
        text, codec, ok = decode_text(blob)
        assert codec == "shift_jis" and ok
        assert "こんにちは" in text


def test_latin1_is_treated_as_cp1252():
    # the WHATWG rule: iso-8859-1 labels mean windows-1252 (0x93 is a
    # smart quote there, a control char in strict latin-1)
    blob = b"\x93quoted\x94"
    text, codec, ok = decode_text(blob, "text/plain; charset=iso-8859-1")
    assert codec == "windows-1252" and text == "“quoted”"


def test_wrong_declaration_degrades_not_drops():
    blob = "日本語テキスト".encode("utf-16-le")  # no BOM
    text, codec, ok = decode_text(blob, "text/html; charset=utf-8")
    # utf-8 decode of utf-16 bytes fails → windows-1252 salvage
    assert not ok and codec == "windows-1252"
    assert isinstance(text, str) and text


def test_plain_utf8_and_fallback():
    assert decode_text(TEXT.encode("utf-8")) == (TEXT, "utf-8", True)
    junk = bytes(range(256))
    text, codec, ok = decode_text(junk)
    assert codec == "windows-1252" and not ok and len(text) == 256


def test_unknown_label_skipped():
    blob = TEXT.encode("utf-8")
    codec, src = resolve_charset(blob, "text/html; charset=not-a-codec")
    assert (codec, src) == ("utf-8", "utf-8")


def test_fuzz_never_raises():
    rng = np.random.default_rng(7)
    for _ in range(200):
        n = int(rng.integers(0, 300))
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        text, codec, ok = decode_text(blob, "text/html; charset=utf-8")
        assert isinstance(text, str)


def test_payloads_to_text_spark_on_warc(spark, tmp_path):
    from pyspark.sql import functions as F

    from fenix_spark.sources.warc_source import register, write_warc

    body_1252 = ("smart “quotes” page " * 3).encode("windows-1252")
    body_utf8 = "<html><body>日本語 page</body></html>".encode("utf-8")
    write_warc(
        str(tmp_path / "c.warc.gz"),
        [
            {"type": "response", "url": "https://a.example/", "http": True,
             "payload": body_1252, "content_type": "text/html; charset=windows-1252"},
            {"type": "response", "url": "https://b.example/", "http": True,
             "payload": body_utf8, "content_type": "text/html"},
        ],
    )
    register(spark)
    warc = spark.read.format("warc").load(str(tmp_path / "c.warc.gz"))
    out = {
        r["id"]: r
        for r in payloads_to_text(
            warc.where(F.col("record_type") == "response")
        ).collect()
    }
    assert out["https://a.example/"]["charset"] == "windows-1252"
    assert "“quotes”" in out["https://a.example/"]["text"]
    assert out["https://b.example/"]["charset"] == "utf-8"
    assert "日本語" in out["https://b.example/"]["text"]
    assert all(r["charset_ok"] for r in out.values())
