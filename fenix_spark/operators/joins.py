"""Temporal and inequality joins the reference engine lacks.

The reference's only joins are positional h-stack and union-all
(src/fenix/io/table/table.py:29-43). These operators add the two
join families a time-series / pipeline workload needs — each designed
around Spark's shuffle model rather than a naive theta-join:

- ``asof_join``: most-recent-match temporal join via the union+window
  ("piggyback") technique — ONE shuffle on the key, no range
  explosion, no per-row binary search. This is how you as-of join two
  100 TB tables: both sides shuffle once on the equi-key and merge in
  a single ordered window pass.
- ``range_join`` / ``range_join_bucketed``: point-in-interval joins.
  The broadcast form is for small interval tables (dimension bands);
  the bucketed form maps both sides onto integer buckets and
  EQUI-joins on the bucket id — turning an inequality join that Spark
  would execute as a nested loop into a shuffle hash join, at the cost
  of a post-filter. That transposition is the difference between
  O(|L|·|R|) and O(|L|+|R|) at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__ASOF_SIDE__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: int | float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` (``direction="backward"``, the default —
    DuckDB ``ASOF LEFT JOIN``), the smallest ``right_ts`` ≥ ``left_ts``
    (``"forward"``), or whichever of the two is closer (``"nearest"``,
    backward winning ties) — pandas ``merge_asof`` direction semantics,
    within the same key group.

    Implementation is the union+window technique: tag each side, union
    the (key, ts, payload) rows, and carry the right payload forward
    with ``last(..., ignorenulls=True)`` over an ordered window per
    key. Right rows sort BEFORE left rows at equal ts, so ties match
    (backward-inclusive). One shuffle total, both sides together; no
    interval explosion, no broadcast requirement — works large×large.

    If several right rows share (key, ts), the one with the greatest
    payload ordering position wins; pre-dedupe the right side for
    fully deterministic output.

    ``tolerance``: maximum allowed ts gap in the match direction;
    matches farther away are nulled out (pandas
    ``merge_asof(tolerance=...)``). ``nearest`` still shuffles ONCE:
    the forward fill is a second window SORT over the same hash
    partitioning, not a second exchange.

    Output: all left columns + ``right_cols`` (null when no match).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    ts = "__ASOF_TS__"

    pay = "__ASOF_PAY__"
    # The whole right payload (cols + right_ts) travels as ONE struct,
    # and last(ignorenulls) carries the struct — so a match is
    # all-or-nothing from a single right row. Filling each column
    # independently would skip a matched row's genuinely-NULL payload
    # value and carry an older row's value forward (and could mix
    # values from different right rows) — diverging from pandas
    # merge_asof / DuckDB ASOF semantics.
    payload_struct = F.struct(
        *[F.col(c).alias(c) for c in right_cols], F.col(right_ts).alias("__ts")
    )
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias(ts),
        F.lit(1).alias(_SIDE),
        F.lit(None).alias(pay),
    )
    # Right rows take the left column layout: key columns keep their
    # values (same names both sides), everything else is a typed null.
    r_tagged = right.select(
        *[
            (F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(_SIDE),
        payload_struct.alias(pay),
    )
    l_tagged = l_tagged.withColumn(
        pay, F.col(pay).cast(r_tagged.schema[pay].dataType)
    )

    unioned = l_tagged.unionByName(r_tagged)
    # Backward = carry the last right payload under ascending ts;
    # forward = the same fold under DESCENDING ts. Right rows (side 0)
    # sort before left at equal ts under BOTH orderings, so ties match
    # inclusively in either direction.
    w_b = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).desc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fills = []
    if direction in ("backward", "nearest"):
        fills.append(F.last("__pb_src", ignorenulls=True).over(w_b).alias("__pb"))
    if direction in ("forward", "nearest"):
        fills.append(F.last("__pf_src", ignorenulls=True).over(w_f).alias("__pf"))
    filled = (
        unioned.withColumn("__pb_src", F.col(pay))
        .withColumn("__pf_src", F.col(pay))
        .select(*[c for c in left.columns], F.col(ts), F.col(_SIDE), *fills)
    )
    out = filled.where(F.col(_SIDE) == 1)

    def _gate(col: Column, delta: Column) -> Column:
        """Null out a candidate whose gap exceeds tolerance."""
        if tolerance is None:
            return col
        return F.when(delta > tolerance, F.lit(None)).otherwise(col)

    if direction == "backward":
        out = out.withColumn(pay, _gate(F.col("__pb"), F.col(ts) - F.col("__pb")["__ts"]))
    elif direction == "forward":
        out = out.withColumn(pay, _gate(F.col("__pf"), F.col("__pf")["__ts"] - F.col(ts)))
    else:  # nearest: closer candidate wins, backward wins exact ties
        pb = _gate(F.col("__pb"), F.col(ts) - F.col("__pb")["__ts"])
        pf = _gate(F.col("__pf"), F.col("__pf")["__ts"] - F.col(ts))
        d_b = F.col(ts) - pb["__ts"]
        d_f = pf["__ts"] - F.col(ts)
        out = out.withColumn(
            pay,
            F.when(pb.isNull(), pf)
            .when(pf.isNull(), pb)
            .when(d_f < d_b, pf)
            .otherwise(pb),
        )
    out = out.select(
        *[c for c in left.columns],
        *[F.col(pay)[c].alias(f"right_{c}") for c in right_cols],
        F.col(pay)["__ts"].alias(f"right_{right_ts}"),
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join: the left side gets a deterministic
    per-row salt (hash of the whole row, so retries agree), the right
    side replicates ``salts``× with every salt value, and the join key
    becomes (key, salt) — a hot key's rows now spread over ``salts``
    reducers instead of melting one. Result is EXACTLY the plain join
    (each left row still meets every right row of its key, once).

    Cost: right side inflates ``salts``× through the shuffle — use for
    a *moderate-size* right side against a skewed big left, and prefer
    AQE's skew-join splitting when it already kicks in; this operator
    is for when it can't (e.g. aggregation-feeding joins AQE won't
    split, or fixed-partitioning pipelines).

    ``how`` is restricted to the joins the salt rewrite is exactly
    equivalent for: each left row holds ONE salt value, so right/full/
    outer joins would emit ``salts``−1 spurious null-extended rows per
    unmatched right row (the replicas with salts absent on the left)."""
    _SAFE_HOW = {"inner", "left", "leftouter", "left_outer", "semi",
                 "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in _SAFE_HOW:
        raise ValueError(
            f"salted_join(how={how!r}) is not equivalence-preserving; "
            f"use one of {sorted(_SAFE_HOW)} or a plain join for "
            "right/full/outer semantics"
        )
    sc = "__SALT__"
    l = left.withColumn(
        sc, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts)).cast("int")
    )
    r = right.withColumn(sc, F.explode(F.array(*[F.lit(s) for s in range(salts)])))
    return l.join(r, [key, sc], how).drop(sc)


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    value: str | Column,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join against a SMALL interval table:
    broadcast + non-equi condition ``lo <= value < hi``. Executes as a
    broadcast nested-loop join — right only for dimension-sized
    ``ranges`` (price bands, SLA tiers). For large interval tables use
    ``range_join_bucketed``."""
    v = F.col(value) if isinstance(value, str) else value
    cond = (F.col(lo) <= v) & (v < F.col(hi))
    return left.join(F.broadcast(ranges), cond, how)


def range_join_bucketed(
    left: DataFrame,
    ranges: DataFrame,
    value: str,
    bucket_width: float,
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Point-in-interval join rewritten as an EQUI-join on integer
    buckets: explode each interval into the buckets it covers, bucket
    each point, hash-join on the bucket id, post-filter the exact
    predicate. The shuffle key is ``floor(value / bucket_width)`` —
    both sides distribute, no broadcast, no nested loop. Pick
    ``bucket_width`` ≈ median interval length so intervals explode to
    O(1) buckets each."""
    b = "__BUCKET__"
    pts = left.withColumn(b, F.floor(F.col(value) / bucket_width).cast("bigint"))
    ivs = ranges.withColumn(
        b,
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bucket_width).cast("bigint"),
                # INCLUSIVE of hi's bucket: v → floor(v/w) is monotone,
                # so every v in [lo, hi) lands in [bucket(lo),
                # bucket(hi)]. Covering bucket(hi) costs one extra
                # replica per interval but is exact for ALL inputs —
                # an epsilon hack (hi − ε) silently drops matches when
                # hi − lo < ε or when v/w underflows near zero.
                F.floor(F.col(hi) / bucket_width).cast("bigint"),
            )
        ),
    )
    joined = pts.join(ivs, b)
    return joined.where((F.col(lo) <= F.col(value)) & (F.col(value) < F.col(hi))).drop(b)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
) -> DataFrame:
    """INTERVAL-OVERLAP equi-join: every (left, right) pair whose
    half-open spans have non-empty intersection
    (``max(l_lo, r_lo) < min(l_hi, r_hi)`` — the set-semantics form,
    which unlike the textbook ``l_lo < r_hi AND r_lo < l_hi`` stays
    correct for degenerate zero-length inputs) — the
    concurrent-sessions / overlapping-claims join that a plain range
    join can't express (both sides are intervals).

    Rewrite: each interval explodes into the integer buckets it
    covers, the join is a hash EQUI-join on bucket id (both sides
    distribute — no broadcast, no nested loop), the exact overlap
    predicate post-filters. De-duplication without a ``distinct``:
    a pair overlapping across many shared buckets is emitted ONLY in
    its CLAIM bucket — the bucket of ``max(l_lo, r_lo)``, the overlap
    span's start, which both sides provably cover — so each pair
    appears exactly once by construction (pinned against brute force).

    Pick ``bucket_width`` ≈ the median interval length: intervals
    then explode to O(1) buckets each. Column names must be disjoint
    between the two frames (raises otherwise). Zero-length intervals
    (lo == hi) overlap nothing under half-open semantics."""
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(
            f"interval_join requires disjoint column names; both sides "
            f"have {sorted(clash)} — rename one side first"
        )
    b = "__BUCKET__"

    def expand(df, lo, hi):
        return df.withColumn(
            b,
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / bucket_width).cast("bigint"),
                    # inclusive of hi's bucket — same exactness note as
                    # range_join_bucketed: epsilon hacks drop matches
                    F.floor(F.col(hi) / bucket_width).cast("bigint"),
                )
            ),
        )

    joined = expand(left, l_lo, l_hi).join(expand(right, r_lo, r_hi), b)
    overlap = F.greatest(F.col(l_lo), F.col(r_lo)) < F.least(
        F.col(l_hi), F.col(r_hi)
    )
    claim = (
        F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / bucket_width).cast(
            "bigint"
        )
        == F.col(b)
    )
    return joined.where(overlap & claim).drop(b)


def bloom_filtered_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Equi-join with a Bloom **runtime-filter reduction**: build a
    Bloom filter of the RIGHT side's join keys (one summary-sized
    shuffle of ≤ m_bits/32 words), pre-filter the LEFT side with a
    pure scan-side expression, then run the exact join on the
    survivors. Results are IDENTICAL to the plain join — the filter is
    one-sided (no false negatives), so no matching row is ever
    dropped; false positives just ride to the exact join and fall out
    there.

    This is the classic semi-join reduction (Bernstein & Chiu, JACM
    1981; Spark's own InjectRuntimeFilter does it for simple single-
    key cases): when the right side is selective — a keep-list, a
    quarantine set, this week's delta — the LEFT side's shuffle
    shrinks from |left| rows to |matches| + ε before the expensive
    exchange, at the cost of a 128 KB broadcast-able bit array. For
    ``how='inner'``/``'left_semi'`` the reduction is sound; other join
    types need the dropped rows (outer) or their absence (anti) and
    are rejected loudly.

    Multi-key joins hash the key TUPLE (null-safe struct hash) into
    one filter. Size ``m_bits`` for the right side's distinct-key
    count: fp ≈ (1 − e^{−k·n/m})^k; at n = 100k keys and the 2^20
    default, fp < 1% — the left shuffle carries < 1% non-matching
    slack.
    """
    from fenix_spark.operators.sketches import (
        bloom_build,
        bloom_contains_expr,
        bloom_to_words,
    )

    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom pre-filtering is only sound for inner/left_semi joins "
            f"(got {how!r}): outer joins need the non-matching rows kept, "
            "anti joins need exact absence"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("need at least one join key")

    def key_expr(df: DataFrame) -> Column:
        # null-safe canonical encoding of the key tuple; any null key
        # can never match an equi-join anyway, so nulls map to NULL
        # and are skipped by the build / fail the contains test
        parts = [F.col(c).cast("string") for c in keys]
        joined = F.concat_ws("\x1f", *parts)
        any_null = None
        for c in keys:
            cond = F.col(c).isNull()
            any_null = cond if any_null is None else (any_null | cond)
        return F.when(~any_null, joined)

    rk = right.select(key_expr(right).alias("__bf_key"))
    words = bloom_to_words(bloom_build(rk, "__bf_key", m_bits, k), m_bits)
    pre = left.where(
        bloom_contains_expr(key_expr(left), words, m_bits, k)
    )
    return pre.join(right, keys, how)
