"""Poisson-bootstrap confidence intervals — resampling at 100 TB
without resampling.

The classical bootstrap draws B resamples WITH replacement — a
non-starter distributed (each resample is a full shuffle of the
corpus). The Poisson bootstrap (public method: Hanley & MacGibbon
2006; standard at-scale practice for exactly this reason) replaces
each resample's multinomial row counts with independent Poisson(1)
weights per (row, replicate): for n large the replicate weight vector
is distributionally indistinguishable from a true resample, and every
statistic expressible as a weighted aggregate needs just ONE pass —
each row contributes w_b·x to replicate b's partial sum, partial
aggregation collapses map-side, and only (group, 2B doubles) reach the
shuffle.

Determinism: replicate weights are w_b = F⁻¹_Poisson(1)(u_b) with
u_b = (hash60(id ‖ "|b" ‖ b) + 1)/2⁶⁰ — the same md5-derived uniform
construction as the sampling family, so results are a pure function of
(ids, salt): layout-independent, retry-stable, and reproducible by any
engine (the numpy mirror in tests reproduces every replicate sum
bit-for-bit). The inverse CDF is a fixed 10-step threshold ladder
(P(X>9) < 1.1e-7 at λ=1 — truncation bias far below bootstrap noise).

Output per group: the point estimate, percentile-bootstrap lo/hi at
the requested confidence, and the replicate count. Replicates whose
total weight is zero (possible only for tiny groups) fall back to the
point estimate rather than poisoning the percentile order — tiny
groups should not be bootstrapped anyway, and the fallback is the
conservative choice (shrinks the interval toward the estimate).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60

__all__ = ["bootstrap_ci", "POISSON1_CDF"]

# P(Poisson(1) <= k) for k = 0..9; both the Spark expression and the
# test mirror index this exact ladder, so weights agree bit-for-bit.
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
    0.9999988747974116,
    0.9999998885745217,
]


def _ladder(u: Column) -> Column:
    """Poisson(1) inverse CDF: smallest k with u <= CDF[k], else 10.
    Only ever applied to a BOUND value (lambda variable / column ref):
    a CASE chain re-evaluates its scrutinee per branch, so feeding it
    the raw md5 expression directly re-hashes up to 11× per weight —
    measured 16 s for 80 replicates over 5k docs vs ~1 s bound."""
    expr = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        expr = F.when(u <= F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(expr)
    return expr.cast("double")


def _poisson_weights(id_col: str, n_boot: int, salt: str) -> Column:
    """Array of the ``n_boot`` replicate weights for this row: each
    replicate's uniform u_b = (hash60(id ‖ '|salt|b' ‖ b) + 1)/2⁶⁰ is
    computed exactly ONCE (one md5 per (row, replicate)), then the
    threshold ladder runs over the bound lambda variable."""
    id_str = F.col(id_col).cast("string")
    u_arr = F.transform(
        F.sequence(F.lit(0), F.lit(n_boot - 1)),
        lambda b: (
            hash60(F.concat(id_str, F.lit(f"|{salt}|b"), b.cast("string")))
            + 1
        )
        / F.lit(float(1 << 60)),
    )
    return F.transform(u_arr, _ladder)


def bootstrap_ci(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    id_col: str,
    stat: str = "mean",
    n_boot: int = 100,
    confidence: float = 0.95,
    salt: str = "",
) -> DataFrame:
    """Per-group percentile-bootstrap CI for ``mean`` or ``sum`` of
    ``value_col`` — one scan, one summary shuffle.

    Returns (keys..., estimate, lo, hi, n_boot). The interval is the
    empirical [α/2, 1−α/2] percentile of the B replicate statistics
    (indices ⌈Bα/2⌉ and B−⌈Bα/2⌉+1 of the sorted replicates — the
    standard percentile method). NULL values are excluded (they
    contribute to no resample). ``n_boot`` is capped at 500: each
    replicate adds two aggregate columns, and beyond a few hundred the
    bootstrap's own Monte-Carlo error is already below the interval's
    resolution."""
    if stat not in ("mean", "sum"):
        raise ValueError(f"stat must be 'mean' or 'sum', got {stat!r}")
    if not 0.5 < confidence < 1.0:
        raise ValueError(f"confidence must be in (0.5, 1), got {confidence}")
    if not 1 <= n_boot <= 500:
        raise ValueError(f"n_boot must be in [1, 500], got {n_boot}")
    key_list = list(keys)
    x = F.col(value_col).cast("double")
    # One projection materializes all replicate weights per row (one
    # md5 each); the aggregate expressions below only read array slots.
    # The Project stays BELOW the Aggregate (no optimizer rule inlines
    # a project into aggregate expressions), so the array is built
    # once per row, not once per aggregate column. spread() first: the
    # n_boot md5s per row are the dominant cost, and a one-file input
    # would otherwise compute them all in a single scan task (the
    # repartition ships only the projected key/value/id columns and is
    # a no-op once the input has >= cores files).
    from fenix_spark.operators.dedup import spread

    # ``__x`` is projected once so the replicate aggregates below can
    # be rendered as compact SQL strings: building 2B aggregate Columns
    # through the fluent API costs ~6 py4j round-trips EACH (~0.8 s of
    # driver time per invocation at B=80, measured) while one
    # ``F.expr`` per replicate parses JVM-side to the identical
    # expression tree.
    base = (
        spread(df.where(x.isNotNull()))
        .withColumn("__x", x)
        .withColumn("__bw", _poisson_weights(id_col, n_boot, salt))
    )

    aggs = [F.expr("sum(__x) AS __s_point")]
    if stat == "mean":
        aggs.append(F.expr("count(__x) AS __n_point"))
    for b in range(n_boot):
        aggs.append(F.expr(f"sum(element_at(__bw, {b + 1}) * __x) AS __s{b}"))
        if stat == "mean":
            aggs.append(F.expr(f"sum(element_at(__bw, {b + 1})) AS __n{b}"))

    grouped = (
        base.groupBy(*key_list).agg(*aggs)
        if key_list
        else base.groupBy().agg(*aggs)
    )

    if stat == "mean":
        point_sql = "(__s_point / __n_point)"
        theta_sqls = [
            f"(__s{b} / (CASE WHEN (__n{b} > 0) THEN __n{b} END))"
            for b in range(n_boot)
        ]
    else:
        point_sql = "__s_point"
        theta_sqls = [f"__s{b}" for b in range(n_boot)]

    # zero-weight replicates (tiny groups) fall back to the estimate
    arr_sql = (
        "sort_array(array("
        + ", ".join(f"coalesce({t}, {point_sql})" for t in theta_sqls)
        + "))"
    )
    alpha = 1.0 - confidence
    lo_idx = max(1, math.ceil(n_boot * alpha / 2))
    hi_idx = n_boot - lo_idx + 1
    out_cols = [
        *key_list,
        F.expr(point_sql).alias("estimate"),
        F.expr(f"element_at({arr_sql}, {lo_idx})").alias("lo"),
        F.expr(f"element_at({arr_sql}, {hi_idx})").alias("hi"),
        F.lit(n_boot).alias("n_boot"),
    ]
    return grouped.select(*out_cols)
