"""Content-defined chunking (CDC) for binary payload columns —
blob-level dedup that survives INSERTIONS.

Fixed-size chunking breaks the moment one byte is inserted: every
later chunk boundary shifts and nothing matches. Gear-hash CDC (the
rolling hash behind FastCDC, Xia et al. USENIX ATC'16, and ddelta)
places boundaries where a rolling content hash hits a mask — so
boundaries re-synchronize within one chunk of an edit and the rest of
the blob chunks identically. That makes chunk hashes usable for:

- storage dedup accounting (`chunk_dedup_stats`: unique vs total
  bytes over a corpus of crawl media / model checkpoints),
- near-identical blob detection (`blob_chunk_pairs`: re-uploads with
  prepended headers, appended trailers, small in-place edits).

Spark shape: chunking is per-blob byte math inside ONE Arrow-batched
``mapInPandas`` (bytes never leave the executor that read them); the
emitted rows are ``(id, chunk_idx, offset, length, chunk_hash)`` —
~50 B/chunk. Dedup stats are one partial-aggregating groupBy on the
hash; pair detection is a bucket equi-join on the hash with the same
group-cap discipline as the LSH band joins (a chunk shared by
thousands of blobs — a common file header — would otherwise join
quadratically; headers are not evidence of near-duplication anyway).

The gear rolling hash at position i depends on exactly the previous
64 bytes (one shift-out per step), so the whole hash SEQUENCE is a
shifted dot product — computed here with 64 vectorized adds, no
per-byte Python loop; only the (rare) boundary-candidate walk is a
Python loop over ~n/avg_size positions.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "CDC_FORMAT_VERSION",
    "cdc_chunk_spans",
    "blob_chunks",
    "chunk_dedup_stats",
    "blob_chunk_pairs",
]

# bump whenever chunk boundaries move for the same input bytes (gear
# table, window, or cut-rule changes); store it beside persisted chunk
# state and refuse to merge across versions (see the gear-table note).
CDC_FORMAT_VERSION = 2

# deterministic gear table: 256 uint64s derived from blake2b(i) — any
# fixed uniform table works, but it must NOT come from an RNG stream
# (NumPy does not guarantee Generator bit-stream stability across
# releases, and a shifted table silently moves every persisted chunk
# boundary). blake2b is a pinned spec (RFC 7693): the table is
# byte-identical on every numpy/python/engine combination.
#
# CHUNKING FORMAT VERSION 2 (the blake2b table). Version 1 (NumPy
# PCG64 table, pre-2026-08) produced DIFFERENT chunk boundaries:
# chunk hashes / dedup state / rollups persisted under v1 will not
# match v2 chunkings of the same bytes — the dedup hit rate collapses
# silently, with no error. Any persisted chunk state must be rebuilt
# when crossing this bump; compare CDC_FORMAT_VERSION stored with the
# state against the current constant to detect the mismatch loudly.
_GEAR = np.frombuffer(
    b"".join(
        hashlib.blake2b(bytes([i]), digest_size=8).digest() for i in range(256)
    ),
    dtype=">u8",
).astype(np.uint64)
_WINDOW = 64  # bytes of context in the rolling hash (one bit shifts out/step)


def cdc_chunk_spans(
    data: bytes, min_size: int = 2048, avg_size: int = 8192, max_size: int = 65536
) -> list[tuple[int, int]]:
    """Gear-CDC chunk spans ``[(offset, length), ...]`` covering
    ``data`` exactly. Boundaries fall where the rolling hash has
    ``log2(avg_size)`` zero low bits, at least ``min_size`` after the
    previous cut; a cut is forced at ``max_size``. Deterministic pure
    function of the bytes."""
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError(f"need 0 < min {min_size} <= avg {avg_size} <= max {max_size}")
    n = len(data)
    if n == 0:
        return []
    mask = (1 << int(np.log2(avg_size))) - 1
    g = _GEAR[np.frombuffer(data, dtype=np.uint8)]
    h = np.zeros(n, dtype=np.uint64)
    for j in range(min(_WINDOW, n)):
        # contribution of the byte j steps back, shifted j times
        h[j:] += g[: n - j] << np.uint64(j)
    candidates = np.flatnonzero((h & np.uint64(mask)) == 0) + 1  # cut AFTER pos
    spans, last = [], 0
    for c in candidates:
        c = int(c)
        while c - last > max_size:
            spans.append((last, max_size))
            last += max_size
        if c - last >= min_size:
            spans.append((last, c - last))
            last = c
    while n - last > max_size:
        spans.append((last, max_size))
        last += max_size
    if n - last:
        spans.append((last, n - last))
    return spans


def blob_chunks(
    df: DataFrame,
    blob_col: str = "data",
    id_col: str = "media_id",
    min_size: int = 2048,
    avg_size: int = 8192,
    max_size: int = 65536,
) -> DataFrame:
    """``(id, chunk_idx, offset, length, chunk_hash)`` — one row per
    CDC chunk of each blob; ``chunk_hash`` is the md5 hex of the chunk
    bytes (content-addressed, engine-portable). NULL blobs emit
    nothing. Bytes never leave the scan: only ~50-byte chunk records
    shuffle downstream."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids, idxs, offs, lens, hashes = [], [], [], [], []
            for i in range(len(pdf)):
                raw = pdf["__data"].iloc[i]
                if raw is None:
                    continue
                data = bytes(raw)
                for k, (off, ln) in enumerate(
                    cdc_chunk_spans(data, min_size, avg_size, max_size)
                ):
                    ids.append(pdf["__id"].iloc[i])
                    idxs.append(k)
                    offs.append(off)
                    lens.append(ln)
                    hashes.append(hashlib.md5(data[off : off + ln]).hexdigest())
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="Int64"),
                    "chunk_idx": pd.array(idxs, dtype="Int64"),
                    "offset": pd.array(offs, dtype="Int64"),
                    "length": pd.array(lens, dtype="Int64"),
                    "chunk_hash": pd.array(hashes, dtype="string"),
                }
            )

    src = df.select(F.col(id_col).alias("__id"), F.col(blob_col).alias("__data"))
    return src.mapInPandas(
        gen, "id bigint, chunk_idx bigint, offset bigint, length bigint, chunk_hash string"
    )


def chunk_dedup_stats(chunks: DataFrame) -> DataFrame:
    """One-row storage-dedup accounting over a chunk table:
    ``(total_bytes, unique_bytes, total_chunks, unique_chunks,
    dedup_ratio)``. Identical chunk content counts once in
    ``unique_bytes`` — the bytes a content-addressed store would hold.
    One partial-agg groupBy on the hex-md5 chunk hash, then a 1-row
    agg."""
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.first("length").alias("length"), F.count(F.lit(1)).alias("occ")
    )
    return per_hash.agg(
        F.sum(F.col("length") * F.col("occ")).alias("total_bytes"),
        F.sum("length").alias("unique_bytes"),
        F.sum("occ").alias("total_chunks"),
        F.count(F.lit(1)).alias("unique_chunks"),
        (F.sum(F.col("length") * F.col("occ")) / F.sum("length")).alias("dedup_ratio"),
    )


def blob_chunk_pairs(
    chunks: DataFrame,
    min_shared_fraction: float = 0.5,
    max_group: int = 1024,
) -> DataFrame:
    """Blob pairs sharing CDC chunks: ``(id_a, id_b, shared_chunks,
    frac_a, frac_b)`` with ``max(frac_a, frac_b) ≥
    min_shared_fraction`` (fraction of that blob's chunks found in the
    other — detects contained/extended re-uploads, not just equal
    pairs). The join key is the chunk hash; hashes shared by more than
    ``max_group`` blobs (universal file headers, zero-padding chunks)
    are dropped from PAIR GENERATION before the self-join — the same
    mega-bucket discipline as the LSH band joins, since such chunks
    would join quadratically while carrying no near-dup evidence."""
    membership = chunks.select("id", "chunk_hash").distinct()
    # fractions are over DISTINCT chunk contents per blob, so a blob
    # with internal chunk repetition still reaches frac == 1.0 against
    # an identical copy
    per_blob = membership.groupBy("id").agg(F.count(F.lit(1)).alias("n_chunks"))
    # group sizes via partial-agg groupBy + join (NOT a count window:
    # a universal-header hash would funnel into one window task)
    grp = membership.groupBy("chunk_hash").agg(F.count(F.lit(1)).alias("grp"))
    sized = membership.join(grp.where(F.col("grp") <= max_group), "chunk_hash")
    a = sized.select(F.col("id").alias("id_a"), "chunk_hash")
    b = sized.select(F.col("id").alias("id_b"), "chunk_hash")
    pairs = (
        a.join(b, "chunk_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )
    na = per_blob.select(F.col("id").alias("id_a"), F.col("n_chunks").alias("na"))
    nb = per_blob.select(F.col("id").alias("id_b"), F.col("n_chunks").alias("nb"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("frac_a", F.col("shared_chunks") / F.col("na"))
        .withColumn("frac_b", F.col("shared_chunks") / F.col("nb"))
        .where(F.greatest("frac_a", "frac_b") >= min_shared_fraction)
        .select("id_a", "id_b", "shared_chunks", "frac_a", "frac_b")
    )
