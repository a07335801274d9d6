"""Portable text-hashing primitives: every helper here has a Spark
Column form AND a DuckDB SQL form that produce BIT-IDENTICAL values,
so the dedup / fingerprint operators built on them are oracle-checkable
end-to-end (the driver hash-compares result values).

Shared hash bases (md5 hex is identical everywhere):

- ``hash60``  — first 60 bits of md5 as signed-int64-safe bigint
- ``hash32``  — first 32 bits of md5 as bigint (the base for minhash's
  universal-hash family and simhash's bit votes)

Performance design (the sf0.1 lesson — see ``let``):

- Catalyst INLINES a referenced expression into every use site, so an
  expensive array expression (tokenize+md5) referenced k times is
  evaluated k times — and references inside per-element lambdas are
  evaluated PER ELEMENT, turning O(n) plans into O(n²). ``let`` binds
  a value to a higher-order-function lambda variable, which Spark
  evaluates exactly once.
- One md5 per token/shingle, ever: minhash's 12 components are affine
  universal hashes (a_i·h + b_i mod P) over the SAME 32-bit base
  hash; simhash's 32 bit-votes are integer bit tests on it. (The
  original form — a fresh seed-prefixed md5 per component, hex-char
  membership per bit — was 12-32× more md5 work for the same
  statistical properties.)

All positions are 1-based in both engines (Spark ``element_at`` /
``substring``, DuckDB ``list[i]`` / ``substr``), so formulas transfer
verbatim. The reference engine hashes only in torch kernels
(src/fenix/io/coder/coder.py); md5 here is purely for cross-engine
checkability — swap xxhash64 in for production throughput.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# "BPE-ish" lexer: letter runs, digit runs, single punctuation marks —
# the shape of a byte-level BPE pre-tokenizer's coarse split.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# largest prime < 2^32: modulus of the minhash universal-hash family.
# a_i < 2^20 and h < 2^32 keep a_i*h + b_i < 2^52 — exact in int64 AND
# in float64, so engines can't disagree on overflow behavior.
MINHASH_P = 4294967291


def minhash_params(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for component ``i`` — fixed odd multiplier
    and offset below 2^20."""
    a = ((1000003 * (i + 1)) % 1048573) | 1
    b = (999983 * (i + 7)) % 1048573
    return a, b


# -- Spark side ------------------------------------------------------------


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Let-binding for expensive expressions: evaluates ``value`` ONCE
    and passes it to ``body`` as a bound lambda variable.

    Implemented as ``transform(array(value), v -> body(v))[1]`` —
    higher-order-function lambda variables are bound values in Spark's
    evaluator, unlike plain expression references which Catalyst
    inlines (and re-evaluates) at every use site."""
    return F.element_at(F.transform(F.array(value), body), 1)


def hash60(c: Column) -> Column:
    """First 60 bits of md5(c) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash32(c: Column) -> Column:
    """First 32 bits of md5(c) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def tokens(c: Column) -> Column:
    """Lowercased alphanumeric tokens, empties dropped."""
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def hash32_sql(operand: str) -> str:
    """SQL text of ``hash32(<operand>)`` — ONE definition shared by
    every str-operand fast path so the SQL and Column renderings of the
    hash cannot drift."""
    return f"CAST(conv(substring(md5({operand}), 1, 8), 16, 10) AS BIGINT)"


def tokens_sql(col_name: str) -> str:
    """SQL text of ``tokens(F.col(col_name))`` — for the str-operand
    fast paths below. Raises ValueError when the rendering cannot be
    exact: callers catch it and keep the Column path (see
    ``dedup.simhash_fingerprints``)."""
    if "`" in col_name:
        raise ValueError(f"column name {col_name!r} cannot be backtick-quoted")
    # Spark SQL single-quoted literals process backslash escapes: a
    # regex containing \ or ' would silently change meaning inside the
    # rendered string while the Column path keeps the real regex. The
    # current TOKEN_SPLIT_RE is literal-safe; refuse loudly if a future
    # edit makes it not so, instead of diverging from duck_tokens.
    if any(ch in TOKEN_SPLIT_RE for ch in "\\'"):
        raise ValueError(
            f"TOKEN_SPLIT_RE {TOKEN_SPLIT_RE!r} is not SQL-literal-safe; "
            "use the Column path"
        )
    return f"filter(split(lower(`{col_name}`), '{TOKEN_SPLIT_RE}'), t -> t != '')"


def word_shingles(toks: Column, n: int) -> Column:
    """All n-token shingles joined by single spaces; one whole-document
    shingle when there are fewer than n tokens (explicit branch — Spark
    raises on out-of-bounds ``element_at`` while DuckDB returns NULL,
    so the short-doc case must never index past the end)."""

    def body(tk: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1))
        full = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(tk, (i + j).cast("int")) for j in range(n)]
            ),
        )
        return F.when(F.size(tk) >= n, full).otherwise(F.array(F.array_join(tk, " ")))

    return let(toks, body)


def minhash_signature(shingles: Column, num_components: int = 12) -> Column:
    """The full minhash signature (array<bigint>): component ``i`` is
    ``min over shingles of (a_i * hash32(s) + b_i) mod P``. One md5
    per shingle, shared across all components via ``let``."""
    return let(
        F.transform(shingles, hash32),
        lambda hs: minhash_signature_hashed(hs, num_components),
    )


def minhash_signature_hashed(
    hashed: Column | str, num_components: int = 12
) -> Column:
    """Signature over PRE-HASHED members (a hash32 array) — integer
    math only; pair with ``dedup.hashed_token_sets`` so member hashing
    happens exactly once per document.

    Pass a COLUMN NAME (str) to render the whole signature as one SQL
    expression: the fluent form costs ~6 py4j round trips per
    component (~0.4 s of driver time per invocation at 24 components);
    the parsed tree is identical — pure int64 arithmetic, so values
    are equal by construction."""
    if isinstance(hashed, str) and "`" not in hashed:
        comps_sql = ",".join(
            "array_min(transform(`{h}`, h -> ({a} * h + {b}) % {p}))".format(
                h=hashed, a=a, b=b, p=MINHASH_P
            )
            for a, b in (minhash_params(i) for i in range(num_components))
        )
        return F.expr(f"array({comps_sql})")
    hashed = F.col(hashed) if isinstance(hashed, str) else hashed
    comps = []
    for i in range(num_components):
        a, b = minhash_params(i)
        comps.append(
            F.array_min(
                F.transform(hashed, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P))
            )
        )
    return F.array(*comps)


def simhash(toks_or_sql: Column | str, bits: int = 32) -> Column:
    """Classic simhash (Charikar): per-bit majority vote over the
    (non-distinct) token hashes — term frequency weights the vote —
    assembled into a ``bits``-wide bigint. Bit ``j`` of the result is
    set iff Σ over tokens of ±1 (by bit ``j`` of hash32(token)) > 0.

    A ``str`` argument is RAW SQL TEXT for the token-array expression
    (NOT a column name — unlike ``minhash_signature_hashed``, which
    backtick-quotes its str argument; the parameter name carries the
    contract, ADVICE r13): rendering the whole ``bits``-vote fold as
    one parsed expression saves ~10 py4j round trips per bit (~1 s of
    driver time per invocation at 32 bits); integer math, values equal
    by construction. Never pass unvalidated caller input as the str
    form — it is spliced into SQL verbatim."""
    toks = toks_or_sql
    if isinstance(toks, str):
        hashed_sql = f"transform({toks}, t -> {hash32_sql('t')})"
        votes = " + ".join(
            "CAST(CASE WHEN (aggregate(hs, 0, (acc, h) -> acc + "
            f"CASE WHEN (shiftright(h, {j}) & 1) = 1 THEN 1 ELSE -1 END"
            f")) > 0 THEN {1 << j} ELSE 0 END AS BIGINT)"
            for j in range(bits)
        )
        return F.expr(
            "element_at(transform(array("
            + hashed_sql
            + f"), hs -> CAST(0 AS BIGINT) + {votes}), 1)"
        )
    hashed = F.transform(toks, hash32)

    def body(hs: Column) -> Column:
        out = F.lit(0).cast("bigint")
        for j in range(bits):
            vote = F.aggregate(
                hs,
                F.lit(0),
                lambda acc, h: acc
                + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                ),
            )
            out = out + F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("bigint")
        return out

    return let(hashed, body)


# -- DuckDB side (SQL string builders, mirrored formulas) ------------------
#
# DuckDB binds CTE columns by VALUE per row (no re-inlining), so the
# builders expect their array argument to be a plain column reference
# from a prior CTE stage — the SQL analog of ``let``.


def duck_hash60(e: str) -> str:
    return f"(('0x' || substring(md5({e}), 1, 15))::BIGINT)"


def duck_hash32(e: str) -> str:
    return f"(('0x' || substring(md5({e}), 1, 8))::BIGINT)"


def duck_tokens(e: str) -> str:
    return f"list_filter(regexp_split_to_array(lower({e}), '{TOKEN_SPLIT_RE}'), t -> t != '')"


def duck_word_shingles(toks: str, n: int) -> str:
    """``toks`` must be a simple column reference (use a CTE). Mirrors
    word_shingles exactly, including the short-document branch."""
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), i -> {parts}) "
        f"ELSE [array_to_string({toks}, ' ')] END"
    )


def duck_minhash_signature(hashed: str, num_components: int = 12) -> str:
    """``hashed`` = a column of hash32 values (list_transform the
    shingles through duck_hash32 in a prior CTE)."""
    comps = []
    for i in range(num_components):
        a, b = minhash_params(i)
        comps.append(
            f"list_min(list_transform({hashed}, h -> ({a} * h + {b}) % {MINHASH_P}))"
        )
    return "[" + ", ".join(comps) + "]"


def duck_simhash(hashed: str, bits: int = 32) -> str:
    """``hashed`` = a column of hash32 values of the tokens."""
    terms = []
    for j in range(bits):
        vote = (
            f"list_sum(list_transform({hashed}, h -> "
            f"CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << j} ELSE 0 END)::BIGINT")
    return "(" + " + ".join(terms) + ")"
