"""Hashed document embeddings — deterministic, model-free doc vectors
from token hashes (random indexing / signed feature hashing: Sahlgren
2005, Weinberger et al. 2009), so the vector operators (KNN, IVF,
semdedup, embedding near-dup) have a text-only on-ramp when no learned
embeddings exist.

Construction: token t contributes ±1 to dimension i by bit i of
``hash60(t)`` — ONE md5 per token total (the simhash trick, but
keeping the per-dimension SUM rather than collapsing to the sign),
then L2 normalization. Cosine between two doc vectors concentrates
around the weighted token-overlap similarity (random signs make
cross-token terms cancel in expectation), which is exactly the signal
near-dup and clustering need.

Scale/portability:

- scan-local native expressions end to end: tokenize → one hash60 per
  token (let-bound — evaluated once, not once per dimension: the
  Catalyst inlining trap texthash.let exists for) → ≤60 integer
  bit-tests → array normalize; no shuffle, no Python, no model to
  broadcast;
- the SAME formula runs in DuckDB (md5 + bit arithmetic — mirrored in
  tests), so downstream vector results remain oracle-checkable;
- dim is capped at 60 (hash60's bit budget) — a LOUD error, not a
  silent wrap; for wider vectors train real embeddings or PCA-expand,
  the on-ramp's job is near-dup/cluster signal, not representation
  learning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60, let, tokens


def _bit_sum(bit: int):
    """aggregate-merge lambda: ±1 by the token hash's ``bit``-th bit."""
    return lambda acc, h: acc + (F.shiftright(h, bit) % F.lit(2)) * 2 - 1


def hashed_embedding(text: Column, dim: int = 60) -> Column:
    """array<double> (L2-normalized) hashed embedding of the text;
    an empty/tokenless doc yields the all-zero vector (not NaN)."""
    if not 1 <= dim <= 60:
        raise ValueError(
            f"hashed_embedding dim={dim}: the native path draws sign bits "
            "from one 60-bit hash per token; use dim ≤ 60 (near-dup and "
            "clustering saturate well below that), or train real "
            "embeddings for representation tasks."
        )

    def body(tk: Column) -> Column:
        return let(
            F.transform(tk, hash60),
            lambda hs: F.array(
                *[
                    F.aggregate(
                        hs, F.lit(0).cast("bigint"), _bit_sum(bit)
                    ).cast("double")
                    for bit in range(dim)
                ]
            ),
        )

    # null text → empty token list → the documented zero vector
    raw = let(tokens(F.coalesce(text, F.lit(""))), body)

    def normalize(v: Column) -> Column:
        norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
        return F.when(norm > 0, F.transform(v, lambda x: x / norm)).otherwise(v)

    return let(raw, normalize)


def hashed_doc_embeddings(
    df: DataFrame, text_col: str, id_col: str, dim: int = 60
) -> DataFrame:
    """(id, embedding) — one scan, no shuffle (``spread`` only guards
    single-file parallelism)."""
    from fenix_spark.operators.dedup import spread

    return spread(df).select(
        F.col(id_col).alias("id"),
        hashed_embedding(F.col(text_col), dim).alias("embedding"),
    )
