"""CDX(J) index support for WARC archives — Common Crawl's random
access layer. At 100 TB you do not scan archives to find records: you
join a (tiny, columnar) index against your seed/filter set and fetch
ONLY the matching members by byte range. Common Crawl publishes
exactly this: per-crawl ``cdx-*.gz`` shards of CDX-J lines, each line

    <urlkey> <timestamp> <JSON: url, filename, offset, length, ...>

where (filename, offset, length) addresses one gzip member (= one
record) inside a ``.warc.gz``.

This module gives the four pieces of that pattern, Spark-first:

- ``parse_cdxj``: CDX-J text lines → typed columns, entirely native
  (split + from_json + casts — no Python in the scan), so predicate
  pushdown and column pruning on the INDEX work before any archive
  byte is touched.
- ``surt_key`` / ``surt_key_expr``: the CC-style SURT urlkey (host
  reversed comma-joined, www-stripped, default ports dropped, query
  params sorted) as both a Python helper (index building, tests) and
  a NATIVE column expression (joining a billion-row URL frame against
  the index without leaving the JVM). The two are parity-tested.
- ``read_warc_members``: (filename, offset, length) rows → parsed WARC
  record rows via one Arrow-batched pass — seek, bounded read, bounded
  single-member gunzip, one-record parse. Batches read each file's
  members in offset order (handle reuse, forward-only seeks); dirty
  entries yield ``fetch_ok=false`` rows instead of task deaths,
  matching the WARC source's crawl discipline.
- ``index_warc`` / ``write_cdxj``: build the (offset, length, url)
  index of a member-per-record archive by walking gzip member
  boundaries (bounded memory, same bomb cap as the WARC source), and
  write CDX-J fixture/export files.

ref: the reference engine has no crawl layer (src/fenix is vectors +
Flight); this extends the crawl tier of SURVEY §2.12.
"""

from __future__ import annotations

import io
import json
import zlib
from urllib.parse import urlsplit

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.sources.warc_source import (
    _MAX_MEMBER_OUT,
    _record_dict,
    parse_warc_records,
    split_http_response,
)

__all__ = [
    "surt_key",
    "surt_key_expr",
    "parse_cdxj",
    "read_warc_members",
    "index_warc",
    "index_warc_files",
    "write_cdxj",
]

_DEFAULT_PORTS = ("80", "443")


def surt_key(url: str) -> str | None:
    """CC-style SURT urlkey of a URL (Python; see ``surt_key_expr``
    for the native-expression twin). Rules implemented — the core of
    Common Crawl's canonicalization, documented so the key is
    reproducible, not magic:

    - scheme, userinfo, fragment dropped; host lowercased
    - leading ``www.`` stripped; host labels reversed, comma-joined
    - explicit non-default port kept as ``:port`` (80/443 dropped)
    - path lowercased ('' → '/'); query params sorted bytewise,
      empty params dropped, '?' only when params remain

    ``https://sub.Example.com:8080/A/B?b=2&a=1`` →
    ``com,example,sub:8080)/a/b?a=1&b=2``. Returns None for inputs
    with no parseable host."""
    if url is None:
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    raw_host = (parts.hostname or "").lower()
    # empty labels ('example.com..', 'a..b.com') are invalid hostnames
    # (RFC 1034) and the native twin's JVM URL parser rejects them —
    # mirror that here so both paths key identically; a single
    # trailing root dot is valid and stripped.
    if ".." in raw_host:
        return None
    host = raw_host.rstrip(".")
    if not host:
        return None
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split(".")))
    try:
        port = parts.port
    except ValueError:
        port = None
    if port is not None and str(port) not in _DEFAULT_PORTS:
        key += f":{port}"
    path = (parts.path or "/").lower()
    params = sorted(p for p in parts.query.split("&") if p)
    return key + ")" + path + ("?" + "&".join(params) if params else "")


def surt_key_expr(url: Column) -> Column:
    """``surt_key`` as a native column expression (no Python) — the
    form to use when keying a corpus-sized URL frame for an index
    join. Parity with the Python helper is pinned in tests."""
    from fenix_spark.functions.urls import _url_port

    # try_parse_url: crawl URLs are hostile input and ANSI-mode
    # parse_url raises on the first malformed one; null is the contract
    purl = getattr(F, "try_parse_url", F.parse_url)
    host = F.lower(purl(url, F.lit("HOST")))
    host = F.regexp_replace(host, r"\.+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    # numeric-canonical port (':00080' == ':80' == default, dropped;
    # out-of-range ports dropped) — parity with urlsplit's validation
    pnum = _url_port(url).try_cast("int")
    keep_port = (
        pnum.isNotNull() & (pnum <= 65535) & ~pnum.isin(80, 443)
    )
    rev = F.when(
        keep_port, F.concat(rev, F.lit(":"), pnum.cast("string"))
    ).otherwise(rev)
    path = F.lower(F.coalesce(purl(url, F.lit("PATH")), F.lit("")))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.coalesce(purl(url, F.lit("QUERY")), F.lit(""))
    params = F.array_sort(F.filter(F.split(q, "&"), lambda p: p != F.lit("")))
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    out = F.concat(rev, F.lit(")"), path, qs)
    return F.when(host.isNotNull() & (host != ""), out)


_CDXJ_JSON_SCHEMA = (
    "url string, filename string, offset string, length string, "
    "status string, mime string, digest string"
)


def parse_cdxj(df: DataFrame, line_col: str = "line") -> DataFrame:
    """CDX-J lines → ``(urlkey, ts, url, filename, offset, length,
    status, mime, digest, parse_ok)``. Entirely native (split with a
    field limit + ``from_json`` + casts), so the index frame supports
    pushdown/pruning and joins at index scale without Python.

    CDX-J carries offset/length/status as JSON STRINGS (the spec's
    quirk); they are cast here — non-numeric values null out and flip
    ``parse_ok`` false rather than dying. Malformed lines (missing
    fields, bad JSON) also yield ``parse_ok=false`` rows."""
    # F.get (0-based) is null-on-missing even under ANSI, unlike
    # element_at which raises on out-of-range for short/garbage lines
    parts = F.split(F.col(line_col), " ", 3)
    j = F.from_json(F.get(parts, 2), _CDXJ_JSON_SCHEMA)
    out = df.select(
        F.get(parts, 0).alias("urlkey"),
        F.get(parts, 1).alias("ts"),
        j["url"].alias("url"),
        j["filename"].alias("filename"),
        j["offset"].try_cast("long").alias("offset"),
        j["length"].try_cast("long").alias("length"),
        j["status"].try_cast("int").alias("status"),
        j["mime"].alias("mime"),
        j["digest"].alias("digest"),
    )
    ok = (
        F.col("filename").isNotNull()
        & F.col("offset").isNotNull()
        & F.col("length").isNotNull()
        & (F.col("offset") >= 0)
        & (F.col("length") > 0)
    )
    return out.withColumn("parse_ok", ok)


_FETCH_SCHEMA = (
    "record_type string, url string, date string, "
    "warc_content_type string, http_status int, http_content_type string, "
    "payload binary, record_id string, file string, offset long, "
    "fetch_ok boolean"
)

_MAX_RANGE_LEN = 1 << 30  # refuse absurd index entries before reading


def _gunzip_member_bounded(data: bytes) -> bytes | None:
    """One gzip member from ``data`` under the WARC bomb cap, with the
    decompress budget bounding ALLOCATION (max_length per call), not
    just post-hoc size checks. None on corrupt/bomb input."""
    d = zlib.decompressobj(wbits=31)
    out = bytearray()
    try:
        chunk = d.decompress(data, _MAX_MEMBER_OUT + 1)
        out += chunk
        while d.unconsumed_tail and not d.eof and len(out) <= _MAX_MEMBER_OUT:
            chunk = d.decompress(
                d.unconsumed_tail, _MAX_MEMBER_OUT + 1 - len(out)
            )
            if not chunk:
                break
            out += chunk
    except zlib.error:
        return None
    if len(out) > _MAX_MEMBER_OUT or not d.eof:
        return None  # bomb or truncated member
    return bytes(out)


def _fetch_one(f, offset: int, length: int) -> dict | None:
    """Parse the single record at (offset, length) of an open archive
    handle; None on any malformed input (crawl discipline)."""
    if offset < 0 or length <= 0 or length > _MAX_RANGE_LEN:
        return None
    try:
        f.seek(offset)
        raw = f.read(length)
    except OSError:
        return None
    if len(raw) < length:
        return None  # truncated file vs index
    if raw[:2] == b"\x1f\x8b":
        run = _gunzip_member_bounded(raw)
        if run is None:
            return None
    else:
        run = raw
    return next(parse_warc_records(run), None)


def read_warc_members(
    entries: DataFrame,
    path_col: str = "filename",
    offset_col: str = "offset",
    length_col: str = "length",
) -> DataFrame:
    """Fetch exactly the records a CDX index (or any (file, offset,
    length) frame) names — the Common Crawl random-access pattern.
    One Arrow-batched pass: within each batch, entries group by file
    and read in offset order (one open handle per file, forward
    seeks); each member gunzips under the WARC bomb cap and parses as
    one record. Failed entries (truncated file, corrupt member, bad
    range) come back as ``fetch_ok=false`` rows with the (file,
    offset) echoed for auditing — a dirty index line never kills a
    task.

    At cluster scale, ``entries`` should arrive partitioned however
    the caller filtered the index; for heavy fetch volumes repartition
    by ``path_col`` first so each archive is visited by few tasks.
    Filenames resolve on the EXECUTOR (mounted/fuse paths), matching
    the WARC source's access model."""
    import pandas as pd

    cols = [path_col, offset_col, length_col]

    def gen(batches):
        for pdf in batches:
            rows = []
            order = pdf.sort_values([path_col, offset_col])
            handle, handle_path = None, None
            for _, r in order.iterrows():
                path = r[path_col]
                off = r[offset_col]
                ln = r[length_col]
                # nullable longs surface as NaN in pandas — a dirty
                # index line must flag, not int(NaN)-kill the task
                if pd.isna(off):
                    off = None
                if pd.isna(ln):
                    ln = None
                rec = None
                if path is not None and off is not None and ln is not None:
                    try:
                        if handle_path != path:
                            if handle is not None:
                                handle.close()
                            handle, handle_path = open(path, "rb"), path
                        rec = _fetch_one(handle, int(off), int(ln))
                    except OSError:
                        handle, handle_path = None, None
                if rec is None:
                    rows.append(
                        {"record_type": None, "url": None, "date": None,
                         "warc_content_type": None, "http_status": None,
                         "http_content_type": None, "payload": None,
                         "record_id": None, "file": path,
                         "offset": None if off is None else int(off),
                         "fetch_ok": False}
                    )
                    continue
                status, ctype, body = (
                    split_http_response(rec["block"])
                    if rec["record_type"] == "response"
                    else (None, None, rec["block"])
                )
                rows.append(
                    {"record_type": rec["record_type"], "url": rec["url"],
                     "date": rec["date"],
                     "warc_content_type": rec["warc_content_type"],
                     "http_status": status, "http_content_type": ctype,
                     "payload": body, "record_id": rec["record_id"],
                     "file": path, "offset": int(off), "fetch_ok": True}
                )
            if handle is not None:
                handle.close()
            yield pd.DataFrame(
                rows,
                columns=["record_type", "url", "date", "warc_content_type",
                         "http_status", "http_content_type", "payload",
                         "record_id", "file", "offset", "fetch_ok"],
            )

    return entries.select(*cols).mapInPandas(gen, _FETCH_SCHEMA)


def index_warc(path: str, chunk: int = 1 << 20) -> list[dict]:
    """Walk a member-per-record ``.warc.gz`` and return its index:
    one ``{url, record_type, offset, length}`` per gzip member, where
    (offset, length) is the member's COMPRESSED byte range — exactly
    what a CDX line carries. Bounded memory (one compressed chunk +
    one inflated member under the bomb cap); stops quietly at the
    first corrupt member, like the WARC source. Driver-side by
    design: indexing one archive is one sequential read — parallelism
    comes from indexing many archives in one ``mapInPandas`` over
    their paths, not from splitting one file."""
    out: list[dict] = []
    with open(path, "rb") as f:
        abs_pos = 0  # file offset of the first byte NOT yet fed
        member_start = 0
        d = zlib.decompressobj(wbits=31)
        member = bytearray()
        carry = b""
        while True:
            data = carry or f.read(chunk)
            carry = b""
            if not data:
                return out  # EOF mid-member: truncated tail
            abs_pos += len(data)
            try:
                piece = d.decompress(data, _MAX_MEMBER_OUT + 1 - len(member))
                member += piece
                while (
                    d.unconsumed_tail
                    and not d.eof
                    and len(member) <= _MAX_MEMBER_OUT
                ):
                    piece = d.decompress(
                        d.unconsumed_tail, _MAX_MEMBER_OUT + 1 - len(member)
                    )
                    if not piece:
                        break
                    member += piece
            except zlib.error:
                return out
            if len(member) > _MAX_MEMBER_OUT:
                return out  # bomb member: stop indexing quietly
            if d.eof:
                tail = d.unused_data
                member_end = abs_pos - len(tail)
                rec = next(parse_warc_records(bytes(member)), None)
                if rec is not None:
                    out.append(
                        {"url": rec["url"], "record_type": rec["record_type"],
                         "offset": member_start,
                         "length": member_end - member_start}
                    )
                member = bytearray()
                member_start = member_end
                carry = tail
                # carry is re-fed next loop, so count from member_end
                abs_pos = member_end
                if len(carry) < 2:
                    carry += f.read(2 - len(carry))
                    if not carry:
                        return out  # clean end of archive
                if carry[:2] != b"\x1f\x8b":
                    return out  # trailing garbage
                d = zlib.decompressobj(wbits=31)


def index_warc_files(paths: DataFrame, path_col: str = "path") -> DataFrame:
    """Distributed index build: one ``index_warc`` walk per archive in
    one Arrow-batched pass over a frame of paths — the parallelism
    unit is the FILE (a member walk is one sequential read; splitting
    one archive is impossible, indexing thousands at once is the
    job). Returns ``(filename, url, record_type, offset, length)``
    rows ready for ``write_cdxj`` grouping or a direct
    ``read_warc_members`` round-trip. Unreadable paths contribute no
    rows (crawl discipline); audit by anti-joining the output's
    filenames against the input."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for path in pdf[path_col]:
                if path is None:
                    continue
                try:
                    entries = index_warc(path)
                except OSError:
                    continue
                for e in entries:
                    rows.append(
                        {"filename": path, "url": e["url"],
                         "record_type": e["record_type"],
                         "offset": e["offset"], "length": e["length"]}
                    )
            yield pd.DataFrame(
                rows,
                columns=["filename", "url", "record_type", "offset", "length"],
            )

    return paths.select(path_col).mapInPandas(
        gen,
        "filename string, url string, record_type string, "
        "offset long, length long",
    )


def write_cdxj(path: str, entries: list[dict]) -> None:
    """Write CDX-J lines for index entries (dicts with ``url``,
    ``filename``, ``offset``, ``length`` and optional ``ts``,
    ``status``, ``mime``, ``digest``) — fixtures and export. Offsets
    and lengths are serialized as JSON strings, per the format."""
    buf = io.StringIO()
    for e in entries:
        key = surt_key(e.get("url")) or "-"
        ts = str(e.get("ts", "20240101000000"))
        j: dict = {
            "url": e.get("url"),
            "filename": e["filename"],
            "offset": str(e["offset"]),
            "length": str(e["length"]),
        }
        for opt in ("status", "mime", "digest"):
            if e.get(opt) is not None:
                j[opt] = str(e[opt])
        buf.write(f"{key} {ts} {json.dumps(j, sort_keys=True)}\n")
    with open(path, "w", encoding="utf-8") as f:
        f.write(buf.getvalue())
