"""Experiment (A/B) analysis from distributed summary statistics —
the decision layer on top of the events/cohort/funnel family: compare
a metric between two variants with correct uncertainty, at any scale,
without ever moving raw data.

Everything reduces to ONE partial-aggregable groupBy producing per-
variant (n, mean, variance[, covariance]); the test arithmetic runs on
that two-row summary driver-side. P-values use the normal
approximation (``erfc``): exact for the proportion z-test, and the
standard large-sample treatment of Welch's t — the t statistic and
Welch–Satterthwaite df are returned exactly, so small-sample callers
can consult exact t tables; at the row counts this engine targets the
approximation error is far below any decision threshold.

``cuped_adjust`` implements CUPED (Deng, Xu, Kohavi & Walker, WSDM
2013): subtract θ·(x − x̄) using a pre-experiment covariate, removing
the covariate-explained variance (1 − ρ²) while provably preserving
every group's mean-difference expectation. θ = cov(y, x)/var(x) comes
from one corpus-wide aggregate; the adjustment is a scan-local
expression.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ab_summary", "welch_test", "proportion_ztest", "cuped_adjust"]


def _norm_sf(z: float) -> float:
    """P(Z > z) for standard normal — stdlib erfc, no scipy."""
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def ab_summary(df: DataFrame, group_col: str, metric_col: str) -> DataFrame:
    """(group, n, mean, var) per variant — sample variance (ddof=1),
    the input every test below consumes. One partial-aggregable
    groupBy; nulls excluded like any aggregate."""
    return df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(metric_col).alias("n"),
        F.avg(metric_col).alias("mean"),
        F.var_samp(metric_col).alias("var"),
    )


def _two_rows(summary: DataFrame, a, b) -> tuple:
    rows = {r["group"]: r for r in summary.collect()}
    for g in (a, b):
        if g not in rows:
            raise ValueError(f"variant {g!r} not present (have {sorted(map(str, rows))})")
        if rows[g]["n"] < 2:
            raise ValueError(f"variant {g!r} has n={rows[g]['n']} < 2")
    return rows[a], rows[b]


def welch_test(df: DataFrame, group_col: str, metric_col: str, a, b) -> dict:
    """Welch's unequal-variance two-sample test of mean(a) − mean(b):
    dict with n_a/n_b, mean_a/mean_b, diff, se, t, df (Welch–
    Satterthwaite), p_value (two-sided, normal approximation — see
    module docstring). Deterministic and driver-cheap: the data-sized
    work is the one aggregate in :func:`ab_summary`."""
    ra, rb = _two_rows(ab_summary(df, group_col, metric_col), a, b)
    va, vb = ra["var"] / ra["n"], rb["var"] / rb["n"]
    se = math.sqrt(va + vb)
    diff = ra["mean"] - rb["mean"]
    if se == 0.0:
        raise ValueError("both variants are constant — se is 0, t undefined")
    t = diff / se
    dof = (va + vb) ** 2 / (
        va**2 / (ra["n"] - 1) + vb**2 / (rb["n"] - 1)
    )
    return {
        "n_a": int(ra["n"]),
        "n_b": int(rb["n"]),
        "mean_a": float(ra["mean"]),
        "mean_b": float(rb["mean"]),
        "diff": float(diff),
        "se": float(se),
        "t": float(t),
        "df": float(dof),
        "p_value": float(2.0 * _norm_sf(abs(t))),
    }


def proportion_ztest(df: DataFrame, group_col: str, success_col, a, b) -> dict:
    """Two-sample pooled proportion z-test: ``success_col`` is a
    boolean column (or expression string). Exact normal-theory z and
    two-sided p. dict with n/successes/rate per variant, diff, z,
    p_value."""
    s = F.expr(success_col) if isinstance(success_col, str) else success_col
    summary = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(s.cast("int")).alias("k"),
    )
    rows = {r["group"]: r for r in summary.collect()}
    for g in (a, b):
        if g not in rows:
            raise ValueError(f"variant {g!r} not present")
        if rows[g]["n"] == 0:
            raise ValueError(f"variant {g!r} is empty")
    ra, rb = rows[a], rows[b]
    pa, pb = ra["k"] / ra["n"], rb["k"] / rb["n"]
    pool = (ra["k"] + rb["k"]) / (ra["n"] + rb["n"])
    se = math.sqrt(pool * (1 - pool) * (1 / ra["n"] + 1 / rb["n"]))
    if se == 0.0:
        raise ValueError("pooled rate is degenerate (all 0 or all 1)")
    z = (pa - pb) / se
    return {
        "n_a": int(ra["n"]),
        "n_b": int(rb["n"]),
        "rate_a": float(pa),
        "rate_b": float(pb),
        "diff": float(pa - pb),
        "z": float(z),
        "p_value": float(2.0 * _norm_sf(abs(z))),
    }


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    out_col: str | None = None,
) -> tuple[DataFrame, float]:
    """(df + adjusted column, theta) — CUPED: ``y_adj = y − θ·(x −
    x̄)`` with θ = cov(y, x)/var(x) fit on the WHOLE experiment (never
    per variant — a per-variant θ would bias the contrast). Rows with
    a null covariate pass through unadjusted (θ·0). The adjusted
    metric has identical per-variant expected means and variance
    shrunk by the squared correlation — both pinned in tests."""
    out_col = out_col or f"{metric_col}_cuped"
    row = df.agg(
        F.covar_samp(metric_col, covariate_col).alias("cov"),
        F.var_samp(covariate_col).alias("var"),
        F.avg(covariate_col).alias("xbar"),
    ).first()
    if row["var"] is None or row["var"] == 0.0:
        raise ValueError("covariate is constant or empty — CUPED undefined")
    theta = row["cov"] / row["var"]
    adj = F.col(metric_col) - F.lit(theta) * (
        F.coalesce(F.col(covariate_col), F.lit(row["xbar"])) - F.lit(row["xbar"])
    )
    return df.withColumn(out_col, adj), float(theta)
