"""Distribution-drift monitoring between corpus versions — the check
a 100 TB pipeline runs between snapshot N and N+1 (or between a
reference window and the live stream) to catch silent shifts: a
scraper change flattening quality scores, a dedup bug collapsing
length distributions, an upstream feed going stale.

Everything here runs on SUMMARIES, never data: the inputs are the
sketch-family rollups (`sketches.hist_rollup` — exact-mergeable
equi-width histograms; `profile.profile` frames), so drift between
two 100 TB corpora costs a join of two ≤ bins-per-key row sets.

Metrics (per key group, all ENTIRELY NATIVE):

- **PSI** (population stability index, the industry drift score):
  Σ (p−q)·ln(p/q) over bins, with additive ε-smoothing so empty bins
  don't blow up. Common thresholds: < 0.1 stable, 0.1–0.25 drifting,
  > 0.25 shifted (reported, not enforced).
- **JSD** (Jensen–Shannon divergence, Lin 1991, natural log):
  symmetric, bounded [0, ln 2], robust to disjoint support.
- **TV** (total variation distance): ½ Σ |p−q| ∈ [0, 1] — the
  fraction of probability mass that moved.

``profile_drift`` compares two `profile.profile` frames column-wise
(null-rate delta, distinct-count ratio, range endpoints) — schema- and
health-drift to go with the distributional metrics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hist_drift", "profile_drift", "freq_drift", "kll_ks", "embedding_drift"]


def hist_drift(
    ref: DataFrame,
    cur: DataFrame,
    keys: Sequence[str],
    eps: float = 1e-6,
) -> DataFrame:
    """(keys..., psi, jsd, tv, n_ref, n_cur) from two ``hist_rollup``
    summaries built with the SAME (lo, hi, bins) — the layouts must
    match for bins to be comparable (the caller owns that contract,
    as with ``hist_merge``). Keys present in only one side compare
    against an all-ε distribution (maximal drift, not a silent skip).

    One full-outer join on (keys, bin) + one groupBy — summary-sized.
    ε-smoothing: each side's per-bin probability is floored at
    ``eps`` before the log terms, the standard PSI guard for empty
    bins; with both sides identical, every metric is exactly 0.
    Empty ``keys`` compares the two GRAND histograms (one output row).

    A key with NO data on one side compares against the all-ε floor:
    PSI saturates (≫ 0.25) and TV lands near 0.5 (the absent side is
    an ε-measure, not a distribution — half the mass difference), and
    the missing side's ``n_ref``/``n_cur`` comes back NULL so callers
    can distinguish "appeared/vanished" from "shifted"."""
    key_list = list(keys)
    if not key_list:
        g = F.lit("__all").alias("__g")
        return hist_drift(
            ref.select(g, "bin", "c"), cur.select(g, "bin", "c"), ["__g"], eps
        ).drop("__g")

    def norm(df: DataFrame, tag: str) -> DataFrame:
        # per-(key, bin) counts, then the per-key total as a WINDOW sum
        # over the already-aggregated (≤ bins-per-key) rows — one
        # exchange per side instead of a groupBy + join-back pair
        counts = df.groupBy(*key_list, "bin").agg(
            F.sum("c").alias(f"__c_{tag}")
        )
        w = Window.partitionBy(*key_list)
        return counts.withColumn(f"__n_{tag}", F.sum(f"__c_{tag}").over(w))

    r = norm(ref, "ref")
    c = norm(cur, "cur")
    joined = r.join(c, [*key_list, "bin"], "full_outer")
    # per-key totals survive only on rows from that side; re-spread
    # them across the group (window max over summary rows) so
    # one-sided bins get real probabilities
    w = Window.partitionBy(*key_list)
    j = joined.withColumn("n_ref", F.max("__n_ref").over(w)).withColumn(
        "n_cur", F.max("__n_cur").over(w)
    )
    p = F.greatest(
        F.coalesce(F.col("__c_ref") / F.col("n_ref"), F.lit(0.0)), F.lit(eps)
    )
    q = F.greatest(
        F.coalesce(F.col("__c_cur") / F.col("n_cur"), F.lit(0.0)), F.lit(eps)
    )
    m = (p + q) / 2
    return j.groupBy(*key_list).agg(
        F.sum((p - q) * F.log(p / q)).alias("psi"),
        F.sum(0.5 * (p * F.log(p / m) + q * F.log(q / m))).alias("jsd"),
        (F.sum(F.abs(p - q)) / 2).alias("tv"),
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
    )


def profile_drift(ref: DataFrame, cur: DataFrame) -> DataFrame:
    """Column-wise health drift between two ``profile.profile``
    frames: (column, dtype_changed, null_rate_ref, null_rate_cur,
    null_rate_delta, distinct_ratio, min/max endpoint changes,
    row_ratio). Columns present in only one profile surface with
    ``missing_in`` set — a dropped or added column IS drift, not a
    join casualty. The inputs are profile rows (one per column), so
    this is driver-scale arithmetic expressed as a join."""
    def prep(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            "column",
            F.col("dtype").alias(f"dtype_{tag}"),
            F.col("n_rows").alias(f"rows_{tag}"),
            (F.col("n_nulls") / F.greatest(F.col("n_rows"), F.lit(1))).alias(
                f"null_rate_{tag}"
            ),
            F.col("approx_distinct").alias(f"dist_{tag}"),
            F.col("min_repr").alias(f"min_{tag}"),
            F.col("max_repr").alias(f"max_{tag}"),
        )

    j = prep(ref, "ref").join(prep(cur, "cur"), "column", "full_outer")
    return j.select(
        "column",
        F.when(F.col("dtype_ref").isNull(), F.lit("ref"))
        .when(F.col("dtype_cur").isNull(), F.lit("cur"))
        .alias("missing_in"),
        (F.col("dtype_ref") != F.col("dtype_cur")).alias("dtype_changed"),
        F.col("null_rate_ref"),
        F.col("null_rate_cur"),
        (F.col("null_rate_cur") - F.col("null_rate_ref")).alias("null_rate_delta"),
        (
            F.col("dist_cur") / F.greatest(F.col("dist_ref"), F.lit(1))
        ).alias("distinct_ratio"),
        (F.col("min_ref") != F.col("min_cur")).alias("min_changed"),
        (F.col("max_ref") != F.col("max_cur")).alias("max_changed"),
        (
            F.col("rows_cur") / F.greatest(F.col("rows_ref"), F.lit(1))
        ).alias("row_ratio"),
    )


def freq_drift(
    ref: DataFrame,
    cur: DataFrame,
    keys: Sequence[str],
    cat_col: str,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI/JSD/TV over a CATEGORICAL column (language mix, source mix,
    status codes) — same metrics and ε-floor semantics as
    ``hist_drift``, with the category itself as the bucket: the inputs
    are RAW frames; each side folds to per-key category counts with
    one partial-agg groupBy, and the comparison re-uses hist_drift's
    summary-sized join (categories are the drift unit, so the
    "histogram" is |categories| rows per key)."""
    def counts(df: DataFrame) -> DataFrame:
        return (
            df.where(F.col(cat_col).isNotNull())
            .groupBy(*keys, F.col(cat_col).alias("bin"))
            .agg(F.count(F.lit(1)).alias("c"))
        )

    return hist_drift(counts(ref), counts(cur), keys, eps)


def kll_ks(
    a: DataFrame, b: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """(keys..., ks, n_a, n_b) — the two-sample Kolmogorov–Smirnov
    statistic max |CDF_a − CDF_b| estimated from two KLL rollups
    (``sketches.kll_rollup``) built on the same column: the range-FREE
    drift test (``hist_drift`` needs a fixed [lo, hi] layout; KLL does
    not). Entirely native over sketch rows: full-outer join on
    (keys, item), one cumulative window per side, max abs difference.
    The estimate inherits KLL's rank error — ±O(1/k) per side — so at
    k=200 a KS below ~0.02 is indistinguishable from zero; planted
    shifts land within that band of the exact statistic (tested)."""
    key_list = list(keys)
    if not key_list:
        g = F.lit("__all").alias("__g")
        return kll_ks(
            a.select(g, "item", "weight"), b.select(g, "item", "weight"), ["__g"]
        ).drop("__g")

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(*key_list, "item").agg(
            F.sum("weight").alias(f"__w_{tag}")
        )

    j = side(a, "a").join(side(b, "b"), [*key_list, "item"], "full_outer")
    w = Window.partitionBy(*key_list).orderBy("item").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy(*key_list)
    j = (
        j.withColumn("__w_a", F.coalesce("__w_a", F.lit(0)))
        .withColumn("__w_b", F.coalesce("__w_b", F.lit(0)))
        .withColumn("__ca", F.sum("__w_a").over(w))
        .withColumn("__cb", F.sum("__w_b").over(w))
        .withColumn("__na", F.sum("__w_a").over(tot))
        .withColumn("__nb", F.sum("__w_b").over(tot))
    )
    diff = F.abs(
        F.col("__ca") / F.greatest(F.col("__na"), F.lit(1))
        - F.col("__cb") / F.greatest(F.col("__nb"), F.lit(1))
    )
    return j.groupBy(*key_list).agg(
        F.max(diff).alias("ks"),
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
    )


def _vec_suff_stats(df: DataFrame, vec_col: str) -> tuple:
    """(n, Σx, Σx²) over an embedding column in ONE Arrow pass —
    per-batch numpy partials (two d-vectors each), driver fold. The
    diagonal-only sibling of pca.fit_pca's Gram pass: drift needs
    per-dim means/variances, not the full covariance."""
    import numpy as np
    import pandas as pd  # noqa: F401

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if not len(vecs):
                continue
            X = np.stack(vecs.to_numpy()).astype("float64")
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "q": [(X * X).sum(axis=0).tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, q array<double>")
        .collect()
    )
    if not rows:
        raise ValueError(f"no non-null vectors in {vec_col!r}")
    n = sum(r["n"] for r in rows)
    s = np.sum([r["s"] for r in rows], axis=0)
    q = np.sum([r["q"] for r in rows], axis=0)
    return n, s, q


def embedding_drift(
    ref: DataFrame, cur: DataFrame, vec_col: str
) -> dict:
    """Model-sized drift report between two embedding corpora — the
    check that catches a silently swapped/retrained embedder or an
    upstream normalization change, from two single-pass scans:

    - ``centroid_cos_dist``: 0.5−0.5·cos between mean vectors (the
      repo's cosine convention) — direction shift;
    - ``centroid_l2``: Euclidean distance between means;
    - ``trace_ratio``: total variance cur/ref — a scale/temperature
      change (≈ s² under x→s·x);
    - ``max_dim_z``/``max_dim``: the largest per-dimension
      standardized mean shift |μc−μr|/√((vr+vc)/2) and which
      dimension — localizes single-feature drift;
    - ``n_ref``/``n_cur``.

    Driver math is d-sized numpy; nothing data-sized leaves the
    executors (two d-vectors per Arrow batch)."""
    import numpy as np

    n_r, s_r, q_r = _vec_suff_stats(ref, vec_col)
    n_c, s_c, q_c = _vec_suff_stats(cur, vec_col)
    if len(s_r) != len(s_c):
        raise ValueError(
            f"dim mismatch: ref {len(s_r)} vs cur {len(s_c)}"
        )
    mu_r, mu_c = s_r / n_r, s_c / n_c
    var_r = np.maximum(q_r / n_r - mu_r**2, 0.0)
    var_c = np.maximum(q_c / n_c - mu_c**2, 0.0)
    nr = float(np.linalg.norm(mu_r))
    nc = float(np.linalg.norm(mu_c))
    cos = (
        float(mu_r @ mu_c) / (nr * nc) if nr > 0 and nc > 0 else 1.0
    )
    pooled = np.sqrt((var_r + var_c) / 2.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(pooled > 0, np.abs(mu_c - mu_r) / pooled, 0.0)
    tr_r, tr_c = float(var_r.sum()), float(var_c.sum())
    return {
        "n_ref": int(n_r),
        "n_cur": int(n_c),
        "centroid_cos_dist": 0.5 - 0.5 * cos,
        "centroid_l2": float(np.linalg.norm(mu_c - mu_r)),
        "trace_ratio": tr_c / tr_r if tr_r > 0 else float("inf"),
        "max_dim_z": float(z.max()),
        "max_dim": int(z.argmax()),
    }
