"""Binary embedding quantization + Hamming-distance search.

The modern vector-DB compression tier below PQ (operators/index.py):
1-bit sign quantization packs a d-dim float vector into ⌈d/64⌉ int64
words — 32× smaller than float32 — and Hamming distance (xor +
popcount) approximates angular distance well enough that a
hamming-shortlist → exact-rerank pipeline preserves most recall
(RECALL-style sweep in the tests).

Everything is a native Catalyst expression:

- packing: per word, a 64-step integer fold setting bit i when
  vec[64w+i] > 0 (each bit contributes once, so two's-complement ADD
  is bitwise OR, including the sign bit);
- distance: zip_with(xor) → bit_count → sum — whole-stage-codegen'd,
  ~2 longs of work per word, no Python anywhere;
- search: scan → TakeOrdered top-k on (hamming, id); optional exact
  rerank reads float vectors for the shortlist only (broadcast join),
  exactly the ADC-rerank shape.

At 100 TB the binary column is the ONLY thing the candidate pass
reads (parquet column pruning) — ⌈d/64⌉·8 bytes/row vs d·4; the
rerank touches |shortlist| float vectors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.metrics import distance, query_literal


def binarize_expr(vec: Column, dim: int) -> Column:
    """array<bigint> of ⌈dim/64⌉ words; bit i of word w is set when
    vec[64·w + i] > 0. Tail positions beyond ``dim`` stay 0."""
    n_words = -(-dim // 64)
    words = []
    for w in range(n_words):
        bits = [
            F.when(
                F.element_at(vec, w * 64 + i + 1) > 0,
                F.lit(1 << i).cast("bigint") if i < 63 else F.lit(-(1 << 63)).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
            for i in range(min(64, dim - w * 64))
        ]
        acc = bits[0]
        for b in bits[1:]:
            acc = acc + b  # disjoint bits → ADD == OR (incl. sign bit)
        words.append(acc)
    return F.array(*words)


def binarize(df: DataFrame, vec_col: str, dim: int, out_col: str = "bits") -> DataFrame:
    return df.withColumn(out_col, binarize_expr(F.col(vec_col), dim))


def pack_bits(vec: Sequence[float]) -> list[int]:
    """Driver-side mirror of ``binarize_expr`` for query vectors (and
    the numpy-parity tests) — bit-identical by construction."""
    out = []
    for w in range(-(-len(vec) // 64)):
        word = 0
        for i in range(min(64, len(vec) - w * 64)):
            if vec[w * 64 + i] > 0:
                word |= 1 << i
        if word >= 1 << 63:
            word -= 1 << 64  # two's-complement int64
        out.append(word)
    return out


def hamming_expr(bits: Column, query_words: Sequence[int]) -> Column:
    """Σ popcount(bits[w] XOR query[w]) as a native fold."""
    q = F.array(*[F.lit(int(w)).cast("bigint") for w in query_words])
    return F.aggregate(
        F.zip_with(bits, q, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def hamming_knn(
    df: DataFrame,
    bits_col: str,
    id_col: str,
    target: Sequence[float],
    k: int = 10,
) -> DataFrame:
    """Top-k by Hamming distance to ``target`` (packed driver-side),
    deterministic (distance, id) order — the shortlist generator."""
    q = pack_bits(target)
    return (
        df.select(F.col(id_col), hamming_expr(F.col(bits_col), q).alias("__HAMMING__"))
        .orderBy("__HAMMING__", id_col)
        .limit(k)
    )


def hamming_knn_rerank(
    df: DataFrame,
    bits_col: str,
    vec_col: str,
    id_col: str,
    target: Sequence[float],
    k: int = 10,
    shortlist: int = 100,
    metric: str = "cosine",
    round_to: int | None = 6,
) -> DataFrame:
    """Hamming shortlist → exact rerank: the candidate pass reads only
    the packed words; float vectors are read for ``shortlist`` rows via
    a broadcast semi-join, then scored exactly (metrics.py
    conventions) and cut to k on (rounded distance, id)."""
    short = hamming_knn(df, bits_col, id_col, target, shortlist).select(id_col)
    d = distance(metric, F.col(vec_col).cast("array<double>"), query_literal(target))
    if round_to is not None:
        d = F.round(d, round_to) + F.lit(0.0)
    return (
        df.join(F.broadcast(short), id_col, "left_semi")
        .select(F.col(id_col), d.alias("__DISTANCE__"))
        .orderBy("__DISTANCE__", id_col)
        .limit(k)
    )
