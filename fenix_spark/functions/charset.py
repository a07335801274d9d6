"""Charset resolution + decoding for crawl payloads — the step
between a WARC/HTTP body (bytes) and document text. A bare
``cast("string")`` silently mojibakes every non-UTF-8 page, which is
~15% of the web; the resolution order here is the WHATWG-ish one
every crawler implements:

1. BOM (UTF-8 / UTF-16 LE/BE) — authoritative when present,
2. ``charset=`` parameter of the HTTP ``Content-Type`` header,
3. ``<meta charset>`` / ``http-equiv`` declaration in the first 2 KB,
4. try UTF-8 strict,
5. windows-1252 (the web's de-facto latin-1 superset — decodes ANY
   byte sequence, so the pipeline never drops a document for its
   encoding; ``ok=false`` marks the fallback rows for quality gates).

Python ships every codec involved — this is fully real, no stubs.
"""

from __future__ import annotations

import codecs
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_charset", "decode_text", "payloads_to_text"]

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)|"""
    rb"""content\s*=\s*["'][^"']*charset=([a-zA-Z0-9_\-]+))""",
    re.IGNORECASE,
)
_CT_RE = re.compile(r"charset\s*=\s*\"?([a-zA-Z0-9_\-]+)", re.IGNORECASE)

# label → python codec, for the aliases python's codec registry does
# not already map the WHATWG way
# python's cp1252 leaves 5 bytes (81 8D 8F 90 9D) UNDEFINED and
# raises on them; WHATWG maps those to the C1 controls of the same
# value — this error handler implements exactly that, making the
# fallback decoder total over all byte sequences
def _c1_controls(e):
    return "".join(chr(b) for b in e.object[e.start : e.end]), e.end


codecs.register_error("fenix_c1", _c1_controls)


def _cp1252_total(data: bytes) -> str:
    return data.decode("windows-1252", errors="fenix_c1")


_LABEL_FIXUPS = {
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "iso-8859-1": "windows-1252",  # WHATWG: treated as windows-1252
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "unicode": "utf-16",
}


def _normalize(label: str | None) -> str | None:
    if not label:
        return None
    label = label.strip().lower()
    label = _LABEL_FIXUPS.get(label, label)
    try:
        codecs.lookup(label)
    except LookupError:
        return None
    return label


def resolve_charset(data: bytes, content_type: str | None = None) -> tuple[str, str]:
    """(codec, source) where source ∈ {bom, header, meta, utf-8,
    fallback} — the detection order documented above."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if data[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16", "bom"
    if content_type:
        m = _CT_RE.search(content_type)
        if m:
            c = _normalize(m.group(1))
            if c:
                return c, "header"
    m = _META_RE.search(data[:2048])
    if m:
        c = _normalize((m.group(1) or m.group(2)).decode("latin-1"))
        if c:
            return c, "meta"
    try:
        data.decode("utf-8")
        return "utf-8", "utf-8"
    except UnicodeDecodeError:
        return "windows-1252", "fallback"


def decode_text(data: bytes, content_type: str | None = None) -> tuple[str, str, bool]:
    """(text, codec, ok): decode with the resolved charset; a wrong
    DECLARATION degrades to windows-1252 rather than dropping the
    document (``ok=False`` flags both that and the no-declaration
    fallback path for downstream quality gates)."""
    codec, source = resolve_charset(data, content_type)
    if codec == "windows-1252":
        return _cp1252_total(data), codec, source != "fallback"
    try:
        return data.decode(codec), codec, source != "fallback"
    except (UnicodeDecodeError, LookupError):
        return _cp1252_total(data), "windows-1252", False


def payloads_to_text(
    df: DataFrame,
    payload_col: str = "payload",
    content_type_col: str | None = "http_content_type",
    id_col: str = "url",
) -> DataFrame:
    """``(id, text, charset, charset_ok)`` per payload row — one
    Arrow-batched pass; NULL payloads yield NULL text. Plugs directly
    onto the WARC source's (url, http_content_type, payload) columns."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids, texts, charsets, oks = [], [], [], []
            cts = pdf["__ct"] if "__ct" in pdf else [None] * len(pdf)
            for i in range(len(pdf)):
                ids.append(pdf["__id"].iloc[i])
                blob = pdf["__data"].iloc[i]
                if blob is None:
                    texts.append(None), charsets.append(None), oks.append(False)
                    continue
                ct = cts.iloc[i] if hasattr(cts, "iloc") else None
                text, codec, ok = decode_text(bytes(blob), ct)
                texts.append(text), charsets.append(codec), oks.append(ok)
            yield pd.DataFrame(
                {"id": ids, "text": pd.array(texts, dtype="string"),
                 "charset": pd.array(charsets, dtype="string"), "charset_ok": oks}
            )

    cols = [F.col(id_col).alias("__id"), F.col(payload_col).alias("__data")]
    if content_type_col is not None:
        cols.append(F.col(content_type_col).alias("__ct"))
    return df.select(*cols).mapInPandas(
        gen, "id string, text string, charset string, charset_ok boolean"
    )
