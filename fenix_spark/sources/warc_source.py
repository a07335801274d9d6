"""WARC ingestion — the web-crawl archive format (ISO 28500; what
Common Crawl ships) as a Spark Python DataSource, partition per file:

    spark.read.format("warc").load("/crawl/segment/")
    → (record_type, url, date, warc_content_type, http_status,
       http_content_type, payload, record_id, file)

Format facts the reader implements:

- A WARC file is concatenated records: ``WARC/1.x`` version line,
  CRLF headers, empty line, ``Content-Length`` bytes of block, then
  two CRLFs. Compressed WARCs are one GZIP MEMBER PER RECORD (the
  spec's recommendation, and why the reader can stream member by
  member instead of inflating the file) — but a single-member gzip of
  many records and plain uncompressed files both parse too.
- ``response`` records wrap an HTTP response: the reader splits the
  status line + headers and emits the BODY as ``payload`` with
  ``http_status``/``http_content_type`` lifted out; other record
  types (request/metadata/warcinfo/resource) carry their block as-is.

Crawl discipline: truncated tails and malformed records END the file
(or member) quietly — never a task death; each gzip member inflates
under a bomb cap. WARC files are not splittable mid-file, so the
partition unit is the file — Common Crawl segments are ~1 GB gz,
sized for exactly this. Like the webdataset source, ``read()`` opens
the file on the EXECUTOR via local path (mounted/fuse stores for
remote bytes).

``write_warc`` is a real writer (member-per-record gzip or plain) —
fixtures and export both.
"""

from __future__ import annotations

import gzip
import io
import os
import zlib
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FULL_SCHEMA = (
    "record_type string, url string, date string, "
    "warc_content_type string, http_status int, http_content_type string, "
    "payload binary, record_id string, file string"
)

_MAX_MEMBER_OUT = 1 << 30  # 1 GiB inflated per gzip member — bomb cap


def _parse_warc_headers(header_bytes: bytes) -> dict[str, str]:
    """Lower-cased header dict from the bytes between the ``WARC/``
    version line and the blank line (exclusive of both CRLFCRLF)."""
    headers: dict[str, str] = {}
    for line in header_bytes.split(b"\r\n")[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.decode("latin-1").strip().lower()] = v.decode(
                "latin-1", "replace"
            ).strip()
    return headers


def _record_dict(headers: dict[str, str], block: bytes) -> dict:
    return {
        "record_type": headers.get("warc-type"),
        "url": headers.get("warc-target-uri"),
        "date": headers.get("warc-date"),
        "warc_content_type": headers.get("content-type"),
        "record_id": headers.get("warc-record-id"),
        "block": block,
    }


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield record dicts from a DECOMPRESSED byte run of one or more
    concatenated records; stops quietly at the first malformed or
    truncated record."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        headers = _parse_warc_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        block_start = hdr_end + 4
        if length < 0 or block_start + length > n:
            return  # truncated tail — quiet stop
        yield _record_dict(headers, data[block_start : block_start + length])
        pos = block_start + length


def split_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an HTTP response block;
    (None, None, block) when it isn't one."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    hdr_end = block.find(b"\r\n\r\n")
    if hdr_end < 0:
        return None, None, block
    lines = block[:hdr_end].split(b"\r\n")
    parts = lines[0].split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, block
    ctype = None
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep and k.decode("latin-1").strip().lower() == "content-type":
            ctype = v.decode("latin-1", "replace").strip()
            break
    return status, ctype, block[hdr_end + 4 :]


def _gzip_members(path: str, chunk: int = 1 << 20) -> Iterator[bytes]:
    """Inflate one gzip member at a time, reading the FILE in chunks —
    memory holds one compressed chunk plus one inflated member
    (bomb-capped), never the whole archive. Ends quietly on a
    corrupt/truncated tail.

    The cap bounds ALLOCATION, not just post-hoc detection: every
    ``decompress`` call carries a ``max_length`` budget of the bytes
    left under the cap, so a 1 MiB chunk of a bomb member can never
    inflate past ``_MAX_MEMBER_OUT + 1`` in one call (input the budget
    parks lands in ``unconsumed_tail`` and is re-fed)."""
    with open(path, "rb") as f:
        d = zlib.decompressobj(wbits=31)
        member = bytearray()
        carry = b""
        while True:
            data = carry or f.read(chunk)
            carry = b""
            if not data:
                return  # EOF mid-member: truncated tail, quiet stop
            try:
                piece = d.decompress(data, _MAX_MEMBER_OUT + 1 - len(member))
                member += piece
                # output budget hit parks leftover INPUT — re-feed under
                # the remaining budget until the cap trips or input drains
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
                return
            if len(member) > _MAX_MEMBER_OUT:
                return  # bomb member: drop the rest of the file quietly
            if d.eof:
                yield bytes(member)
                member = bytearray()
                carry = d.unused_data
                if len(carry) < 2:
                    carry += f.read(2 - len(carry))  # magic may straddle a chunk
                    if not carry:
                        return  # clean end of archive
                if carry[:2] != b"\x1f\x8b":
                    return  # trailing garbage after the last member
                d = zlib.decompressobj(wbits=31)


_MAX_HEADER = 1 << 20  # 1 MiB of record headers — far beyond real WARCs


def stream_plain_records(
    path: str, max_block: int = _MAX_MEMBER_OUT, chunk: int = 1 << 16
) -> Iterator[dict]:
    """Yield record dicts from an UNCOMPRESSED WARC file with
    one-record memory: records are length-prefixed by
    ``Content-Length``, so a read-header / read-block loop over the
    file handle never holds more than one (bomb-capped) block — a
    50 GB uncompressed archive (legal per ISO 28500) streams instead
    of OOMing the task. Records whose block exceeds ``max_block`` are
    SKIPPED via ``seek`` (plain files are seekable — strictly better
    than the gzip branch's drop-rest-of-file, which cannot resync
    mid-member); malformed or truncated input ends the file quietly,
    matching ``parse_warc_records``."""
    with open(path, "rb") as f:
        buf = b""
        while True:
            # accumulate until the header block (WARC/ line .. CRLFCRLF)
            # is fully in buf, under a header-size cap
            while True:
                while buf.startswith(b"\r\n"):
                    buf = buf[2:]
                hdr_end = buf.find(b"\r\n\r\n")
                if hdr_end >= 0:
                    break
                if len(buf) > _MAX_HEADER:
                    return
                data = f.read(chunk)
                if not data:
                    return  # EOF (clean or mid-header) — quiet stop
                buf += data
            if not buf.startswith(b"WARC/"):
                return
            headers = _parse_warc_headers(buf[:hdr_end])
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                return
            if length < 0:
                return
            body = buf[hdr_end + 4 :]
            buf = b""
            if length > max_block:
                # oversized block: skip it in place, keep the tail
                if len(body) >= length:
                    buf = body[length:]
                else:
                    try:
                        f.seek(length - len(body), 1)
                    except OSError:
                        return
                continue
            while len(body) < length:
                data = f.read(max(chunk, length - len(body)))
                if not data:
                    return  # truncated tail — quiet stop
                body += data
            yield _record_dict(headers, body[:length])
            buf = body[length:]


class WarcDataSource(DataSource):
    """``spark.read.format("warc").load(path)`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return FULL_SCHEMA

    def reader(self, schema) -> "WarcReader":
        return WarcReader(self.options, schema)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options, schema):
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires a path")
        self.path = path
        self.suffixes = tuple(
            options.get("suffix", ".warc,.warc.gz").split(",")
        )
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        files = self._list_files()
        if not files:
            raise FileNotFoundError(f"no {self.suffixes} files under {self.path}")
        return [_FilePartition(p) for p in files]

    def _list_files(self) -> list[str]:
        if os.path.isfile(self.path):
            return [self.path]
        if not os.path.isdir(self.path):
            return []
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(self.suffixes)
        )

    def read(self, partition):
        path = partition.path
        with open(path, "rb") as f:
            head = f.read(2)
        if head == b"\x1f\x8b":
            recs: Iterator[dict] = (
                rec for run in _gzip_members(path) for rec in parse_warc_records(run)
            )
        else:
            recs = stream_plain_records(path)
        want_payload = "payload" in self.fields
        for rec in recs:
            status, ctype, body = (
                split_http_response(rec["block"])
                if rec["record_type"] == "response"
                else (None, None, rec["block"])
            )
            row = {
                "record_type": rec["record_type"],
                "url": rec["url"],
                "date": rec["date"],
                "warc_content_type": rec["warc_content_type"],
                "http_status": status,
                "http_content_type": ctype,
                "payload": body if want_payload else None,
                "record_id": rec["record_id"],
                "file": path,
            }
            yield tuple(row[f] for f in self.fields)


def write_warc(path: str, records: list, gzip_members: bool = True) -> list[dict]:
    """Write records (dicts with ``type``, optional ``url``,
    ``payload`` bytes, optional ``http`` flag + ``content_type`` /
    ``status``) in real WARC/1.0 layout — one gzip member per record
    when ``gzip_members`` (the spec-recommended compressed form).

    Returns the archive's byte-range index — one ``{url, record_type,
    offset, length}`` per record (the member's compressed range under
    ``gzip_members``, the record's plain range otherwise) — ready for
    ``sources.cdx.write_cdxj`` / ``read_warc_members``."""
    out = io.BytesIO()
    index: list[dict] = []
    for i, r in enumerate(records):
        payload = bytes(r.get("payload", b""))
        if r.get("http", False):
            status = int(r.get("status", 200))
            ctype = r.get("content_type", "text/html")
            payload = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1") + payload
        hdrs = [
            b"WARC/1.0",
            f"WARC-Type: {r.get('type', 'response')}".encode(),
            f"WARC-Record-ID: <urn:uuid:rec-{i}>".encode(),
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}".encode(),
        ]
        if r.get("url"):
            hdrs.append(f"WARC-Target-URI: {r['url']}".encode())
        hdrs.append(
            b"Content-Type: application/http; msgtype=response"
            if r.get("http", False)
            else f"Content-Type: {r.get('content_type', 'application/octet-stream')}".encode()
        )
        hdrs.append(f"Content-Length: {len(payload)}".encode())
        rec = b"\r\n".join(hdrs) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        start = out.tell()
        if gzip_members:
            out.write(gzip.compress(rec))
        else:
            out.write(rec)
        index.append(
            {"url": r.get("url"), "record_type": r.get("type", "response"),
             "offset": start, "length": out.tell() - start}
        )
    with open(path, "wb") as f:
        f.write(out.getvalue())
    return index


def register(spark) -> None:
    """Make ``format("warc")`` resolvable on this session."""
    spark.dataSource.register(WarcDataSource)
