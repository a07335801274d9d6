"""Binary-classifier evaluation at corpus scale — the measurement
layer for the repo's quality/langid/leakage classifiers: exact AUC,
Brier score, lift and calibration tables, all as aggregations (no
threshold sweeps over collected scores, no sklearn).

- ``binary_auc``: EXACT area under the ROC curve via the Mann-Whitney
  rank identity AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N), with
  tied scores handled by average ranks (the textbook correction —
  equivalent to counting ties as half-wins). One global rank window
  over (score) + one aggregate; the window input is (score, label)
  pairs, not payloads. For the rank window Spark single-partitions
  the sort — at extreme scale pre-aggregate to (score, n_pos, n_neg)
  first, which this does automatically: ranks only ever need the
  per-DISTINCT-score totals, collapsing billions of rows to
  |distinct scores| before any global step.
- ``brier_score``: mean squared error of the probability — one
  aggregate.
- ``lift_table``: score deciles (equal-count bins by rank) with per-
  bin response rate, lift over the base rate, and cumulative capture.
- ``calibration_table``: equal-WIDTH probability bins with predicted
  vs observed rates — the reliability-diagram data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["binary_auc", "brier_score", "lift_table", "calibration_table"]


def binary_auc(df: DataFrame, score_col: str, label_col: str) -> float:
    """Exact ROC AUC (ties → average rank). Raises if either class is
    absent — an AUC over one class is undefined, not 0.5."""
    # collapse to per-distinct-score totals FIRST: the global rank
    # step then runs over |distinct scores| rows, not |data|
    g = (
        df.select(
            F.col(score_col).alias("s"),
            F.col(label_col).cast("int").alias("y"),
        )
        .where(F.col("s").isNotNull() & F.col("y").isNotNull())
        .groupBy("s")
        .agg(
            F.sum("y").alias("pos"),
            F.sum(F.lit(1) - F.col("y")).alias("neg"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.withColumn(
        "below", F.coalesce(F.sum(F.col("pos") + F.col("neg")).over(w), F.lit(0))
    )
    # average rank of this score group = below + (group_size + 1)/2
    avg_rank = F.col("below") + (F.col("pos") + F.col("neg") + 1) / 2.0
    row = ranked.agg(
        F.sum(F.col("pos") * avg_rank).alias("rank_sum"),
        F.sum("pos").alias("P"),
        F.sum("neg").alias("N"),
    ).first()
    if not row["P"] or not row["N"]:
        raise ValueError(
            f"AUC needs both classes (got P={row['P']}, N={row['N']})"
        )
    return float(
        (row["rank_sum"] - row["P"] * (row["P"] + 1) / 2.0)
        / (row["P"] * row["N"])
    )


def brier_score(df: DataFrame, score_col: str, label_col: str) -> float:
    """Mean (p − y)² — lower is better; 0.25 is the no-skill constant
    p=0.5 baseline."""
    row = df.agg(
        F.avg(
            (F.col(score_col) - F.col(label_col).cast("double")) ** 2
        ).alias("b")
    ).first()
    if row["b"] is None:
        raise ValueError("no rows to score")
    return float(row["b"])


def lift_table(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """(bin, n, n_pos, rate, lift, cum_capture) — rows ranked by score
    DESC into ``n_bins`` equal-count bins (ntile; bin 1 = highest
    scores). ``lift`` = bin rate / base rate; ``cum_capture`` =
    fraction of all positives found in bins 1..i. The rank window
    single-partitions (score, label) pairs — pre-aggregate or sample
    first if even that is too large."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be ≥ 2 (got {n_bins})")
    w = Window.orderBy(F.desc(score_col))
    binned = df.select(
        F.col(label_col).cast("int").alias("y"),
        F.ntile(n_bins).over(w).alias("bin"),
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos")
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    return (
        per.withColumn("rate", F.col("n_pos") / F.col("n"))
        .withColumn(
            "lift",
            (F.col("n_pos") / F.col("n"))
            / (F.sum("n_pos").over(tot) / F.sum("n").over(tot)),
        )
        .withColumn(
            "cum_capture",
            F.sum("n_pos").over(wc) / F.sum("n_pos").over(tot),
        )
        .orderBy("bin")
    )


def calibration_table(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """(bin, lo, hi, n, mean_score, observed_rate) — equal-width
    probability bins over [0, 1]; a calibrated model has mean_score ≈
    observed_rate per bin. Scores outside [0, 1] raise (calibration
    is only defined for probabilities)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be ≥ 2 (got {n_bins})")
    s = F.col(score_col)
    bad = df.where((s < 0) | (s > 1)).head(1)
    if bad:
        raise ValueError("calibration needs probability scores in [0, 1]")
    b = F.least(F.floor(F.col("s") * n_bins).cast("int"), F.lit(n_bins - 1))
    return (
        df.select(s.alias("s"), F.col(label_col).cast("int").alias("y"))
        .withColumn("bin", b)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("s").alias("mean_score"),
            F.avg("y").alias("observed_rate"),
        )
        .withColumn("lo", F.col("bin") / n_bins)
        .withColumn("hi", (F.col("bin") + 1) / n_bins)
        .select("bin", "lo", "hi", "n", "mean_score", "observed_rate")
        .orderBy("bin")
    )
