"""Portable text-hashing primitives: every helper here has a Spark
Column form AND a DuckDB SQL form that produce BIT-IDENTICAL values,
so the dedup / fingerprint operators built on them are oracle-checkable
end-to-end (the driver hash-compares result values).

The shared hash is the first 60 bits of md5 — md5 hex output is
identical everywhere, and 60 bits fits a signed int64 in both engines:

- Spark:  ``conv(substring(md5(x), 1, 15), 16, 10)`` cast to bigint
- DuckDB: ``('0x' || substring(md5(x), 1, 15))::BIGINT``

(The reference uses xxhash64 via the ``xxhash`` package for nothing in
the engine path; its UDF hashing lives in torch. We standardize on md5
purely for cross-engine checkability; swap ``xxhash64`` in for
production throughput — the operators only need *a* uniform hash.)

All positions are 1-based in both engines (Spark ``element_at`` /
``substring``, DuckDB ``list[i]`` / ``substr``), so formulas transfer
verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# "BPE-ish" lexer: letter runs, digit runs, single punctuation marks —
# the shape of a byte-level BPE pre-tokenizer's coarse split.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


# -- Spark side ------------------------------------------------------------


def hash60(c: Column) -> Column:
    """First 60 bits of md5(c) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def tokens(c: Column) -> Column:
    """Lowercased alphanumeric tokens, empties dropped."""
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def word_shingles(toks: Column, n: int) -> Column:
    """All n-token shingles joined by single spaces; one whole-document
    shingle when there are fewer than n tokens (explicit branch — Spark
    raises on out-of-bounds ``element_at`` while DuckDB returns NULL,
    so the short-doc case must never index past the end)."""
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    full = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, full).otherwise(F.array(F.array_join(toks, " ")))


def minhash_component(shingles: Column, seed: int) -> Column:
    """One minhash signature component: the minimum md5 hex digest of
    seed-prefixed shingles. Fixed-width hex compares lexicographically
    = numerically, so string min IS hash min."""
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))))


_NIBBLE = "0123456789abcdef"


def _chars_with_bit(bit_in_nibble: int) -> list[str]:
    return [c for i, c in enumerate(_NIBBLE) if (i >> bit_in_nibble) & 1]


def simhash_bit_vote(toks: Column, bit: int) -> Column:
    """Σ over tokens of ±1 for bit ``bit`` (0-31) of md5(token).

    Bit ``bit`` lives in hex nibble ``bit // 4`` (1-based position
    ``bit // 4 + 1``) at in-nibble position ``bit % 4`` (value
    ``2^(bit % 4)``); set-ness is a membership test on the hex char.
    """
    pos, sub = bit // 4 + 1, bit % 4
    chars = _chars_with_bit(sub)
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc
        + F.when(F.substring(F.md5(t), pos, 1).isin(*chars), F.lit(1)).otherwise(F.lit(-1)),
    )


def simhash(toks: Column, bits: int = 32) -> Column:
    """Classic simhash: per-bit majority vote over token hashes,
    assembled into a ``bits``-wide bigint."""
    out = F.lit(0).cast("bigint")
    for j in range(bits):
        out = out + F.when(simhash_bit_vote(toks, j) > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast(
            "bigint"
        )
    return out


# -- DuckDB side (SQL string builders, mirrored formulas) ------------------


def duck_hash60(e: str) -> str:
    return f"(('0x' || substring(md5({e}), 1, 15))::BIGINT)"


def duck_tokens(e: str) -> str:
    return f"list_filter(regexp_split_to_array(lower({e}), '{TOKEN_SPLIT_RE}'), t -> t != '')"


def duck_word_shingles(toks: str, n: int) -> str:
    """``toks`` must be a simple column reference (use a CTE) — it is
    inlined once per shingle position. Mirrors word_shingles exactly,
    including the short-document whole-text branch."""
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), i -> {parts}) "
        f"ELSE [array_to_string({toks}, ' ')] END"
    )


def duck_minhash_component(shingles: str, seed: int) -> str:
    return f"list_min(list_transform({shingles}, s -> md5('{seed}:' || s)))"


def duck_simhash_bit_vote(toks: str, bit: int) -> str:
    pos, sub = bit // 4 + 1, bit % 4
    chars = ", ".join(f"'{c}'" for c in _chars_with_bit(sub))
    return (
        f"list_sum(list_transform({toks}, t -> CASE WHEN substring(md5(t), {pos}, 1)"
        f" IN ({chars}) THEN 1 ELSE -1 END))"
    )


def duck_simhash(toks: str, bits: int = 32) -> str:
    terms = " + ".join(
        f"(CASE WHEN {duck_simhash_bit_vote(toks, j)} > 0 THEN {1 << j} ELSE 0 END)::BIGINT"
        for j in range(bits)
    )
    return f"({terms})"
