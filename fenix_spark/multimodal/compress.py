"""Compressed-payload handling for crawl/blob columns — real codecs
from the stdlib (gzip/zlib, bzip2, xz/lzma), magic-based sniffing for
the rest (zstd/lz4/brotli/snappy are DETECTED by magic but need libs
this image lacks — ``decompress_payload`` raises by name at that
boundary, same policy as the media codecs).

Decompression of untrusted bytes is a BOMB surface: a 1 KB zlib blob
can inflate to gigabytes and kill the executor. Every decompress here
streams through the stdlib's incremental decompressors with a hard
``max_out`` cap and fails loudly (callers choose between rejecting
and truncating — a silently truncated document poisons dedup).

Spark surface: ``decompress_blobs`` — one Arrow-batched pass emitting
(id, codec, ok, data); dirty inputs produce ``ok=false`` rows, never
task death.
"""

from __future__ import annotations

import bz2
import lzma
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sniff_compression", "decompress_payload", "decompress_blobs"]

_MAGIC = [
    (b"\x1f\x8b", "gzip"),
    (b"BZh", "bzip2"),
    (b"\xfd7zXZ\x00", "xz"),
    (b"\x28\xb5\x2f\xfd", "zstd"),
    (b"\x04\x22\x4d\x18", "lz4"),
]


def sniff_compression(data: bytes) -> str | None:
    """Codec name from magic bytes, or None for (apparently)
    uncompressed input. zlib has no magic — its 2-byte header checksum
    rule (cmf·256+flg ≡ 0 mod 31, cm=8) is checked LAST since random
    text can satisfy it ~1/31 of the time on top of the cm/cinfo
    constraints."""
    if not data:
        return None
    for magic, name in _MAGIC:
        if data[: len(magic)] == magic:
            return name
    if len(data) >= 2 and data[0] & 0x0F == 8 and data[0] >> 4 <= 7:
        if ((data[0] << 8) | data[1]) % 31 == 0:
            return "zlib"
    return None


_DECOMPRESSORS = {
    "gzip": lambda: zlib.decompressobj(wbits=31),
    "zlib": lambda: zlib.decompressobj(wbits=15),
    "bzip2": bz2.BZ2Decompressor,
    "xz": lzma.LZMADecompressor,
}


def decompress_payload(
    data: bytes, codec: str | None = None, max_out: int = 1 << 28
) -> bytes:
    """Decompress one blob (codec sniffed when not given), streaming
    with a hard ``max_out`` bomb cap (default 256 MiB) — exceeding it
    raises ValueError rather than silently truncating. Codecs the
    image has no library for (zstd/lz4/...) raise NotImplementedError
    at this single swap-in point."""
    codec = codec or sniff_compression(data)
    if codec is None:
        return bytes(data)
    maker = _DECOMPRESSORS.get(codec)
    if maker is None:
        raise NotImplementedError(
            f"no {codec} library in this environment; decompress_payload "
            "is the single swap-in point (magic detection via "
            "sniff_compression already works)"
        )
    out: list[bytes] = []
    total = 0
    feed: bytes = bytes(data)
    while True:
        d = maker()
        chunk = d.decompress(feed, max_out + 1)
        out.append(chunk)
        total += len(chunk)
        # continuation differs per stdlib API: zlib parks leftover
        # INPUT in unconsumed_tail and wants it re-fed; bz2/lzma
        # buffer it internally and want b"". Empty chunk = no progress.
        while total <= max_out and not getattr(d, "eof", False):
            tail = getattr(d, "unconsumed_tail", b"")
            chunk = d.decompress(tail, max_out + 1 - total)
            if not chunk:
                break
            out.append(chunk)
            total += len(chunk)
        if total > max_out:
            raise ValueError(
                f"{codec} payload inflates past max_out={max_out:,} bytes — "
                "decompression-bomb guard"
            )
        # multi-MEMBER streams (gzip/bzip2/xz all allow concatenated
        # members; parallel writers produce them routinely): continue
        # with a fresh decompressor on the leftover bytes — returning
        # only member 1 would silently truncate the document
        feed = getattr(d, "unused_data", b"")
        if not getattr(d, "eof", True) or len(feed) < 2:
            break
        if codec in ("gzip", "zlib") and feed[:2] != b"\x1f\x8b":
            break
        if codec == "bzip2" and feed[:3] != b"BZh":
            break
        if codec == "xz" and feed[:6] != b"\xfd7zXZ\x00":
            break
    # a decompressor that consumed all input without reaching eof means
    # the stream is TRUNCATED — returning the accumulated prefix would
    # silently hand a partial document downstream (the exact poisoning
    # the module contract forbids). Fail loudly like the bomb cap does.
    if not getattr(d, "eof", True):
        raise ValueError(
            f"{codec} stream truncated — decompressor never reached "
            "end-of-stream; refusing to return a partial payload"
        )
    return b"".join(out)


def decompress_blobs(
    df: DataFrame,
    blob_col: str = "data",
    id_col: str = "media_id",
    max_out: int = 1 << 28,
) -> DataFrame:
    """``(id, codec, ok, data)`` per blob: sniff + decompress with the
    stdlib codecs; rows that are uncompressed pass through unchanged
    (codec NULL), undecodable/bomb/unsupported rows come back with
    ``ok=false`` and NULL data — a curation pipeline counts them, it
    never dies on them."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids, codecs, oks, datas = [], [], [], []
            for mid, blob in zip(pdf["__id"], pdf["__data"]):
                ids.append(int(mid))
                if blob is None:
                    codecs.append(None), oks.append(False), datas.append(None)
                    continue
                raw = bytes(blob)
                codec = sniff_compression(raw)
                codecs.append(codec)
                if codec is None:
                    oks.append(True)
                    datas.append(bytearray(raw))
                    continue
                try:
                    datas.append(bytearray(decompress_payload(raw, codec, max_out)))
                    oks.append(True)
                except Exception:  # noqa: BLE001 - dirty crawl blob
                    datas.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {"id": ids, "codec": pd.array(codecs, dtype="string"),
                 "ok": oks, "data": datas}
            )

    src = df.select(F.col(id_col).alias("__id"), F.col(blob_col).alias("__data"))
    return src.mapInPandas(gen, "id bigint, codec string, ok boolean, data binary")
