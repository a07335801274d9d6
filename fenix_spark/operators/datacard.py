"""Corpus datacard — the one-page statistical summary a dataset ships
with (Datasheets for Datasets, Gebru et al. 2021; the quantitative
half), computed in TWO scans regardless of corpus size:

- scan 1: one wide aggregation of scan-local expressions — doc count,
  token totals/moments, quality-score moments, exact-dup rate
  (distinct content hashes vs docs via HLL — estimate, marked as
  such), distinct-token estimate over a hashed sample of tokens;
- scan 1b (over the same checkpointed per-doc frame): token-length and
  quality quantiles from a KLL rollup (operators/sketches.py) — the
  sketch is rank-error-bounded AND mergeable, so per-batch cards roll
  up into corpus cards by KLL merge; ``approx_percentile``'s state
  dies with the query, which is why it was replaced here;
- scan 2: the language distribution (a groupBy over ≤ |languages|
  keys with map-side partial agg).

Returns (card: dict of scalars, lang_dist: DataFrame) — the dict is a
driver-side summary by design; nothing data-sized is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.textstats import lang_id, quality_score, ws_token_count
from fenix_spark.functions.texthash import hash60
from fenix_spark.operators.dedup import normalized_text
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy


def datacard(
    df: DataFrame,
    text_col: str,
    id_col: str,
    metadata_cols: tuple[str, ...] = (),
    redundancy_nmi: float = 0.9,
) -> tuple[dict, DataFrame]:
    """See module docstring. With ``metadata_cols``, the card gains a
    column-dependence section (operators/infotheory.py): per-column
    Shannon entropy — a zero-entropy metadata column carries nothing —
    and every column pair whose normalized mutual information exceeds
    ``redundancy_nmi`` listed as redundant (one is (nearly) a renaming
    of the other). Both run over CATEGORY-sized aggregates; corpus
    size never hits the driver."""
    from fenix_spark.operators.dedup import spread

    t = F.col(text_col)
    src = spread(df).select(
        F.col(id_col).alias("id"),
        ws_token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        quality_score(t).alias("quality"),
        hash60(normalized_text(t)).alias("content_hash"),
        lang_id(t).alias("lang"),
    ).transform(_ckpt_lazy)

    row = src.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("n_tokens").alias("avg_tokens"),
        F.avg("n_chars").alias("avg_chars"),
        F.avg("quality").alias("avg_quality"),
        F.approx_count_distinct("content_hash").alias("distinct_content_est"),
    ).first()

    # quantiles from the mergeable KLL rollup over the SAME
    # checkpointed frame (both metrics sketch in one pass via stack)
    from fenix_spark.operators.sketches import kll_quantiles, kll_rollup

    stacked = src.selectExpr(
        "stack(2, 'n_tokens', cast(n_tokens as double), "
        "'quality', cast(quality as double)) as (metric, value)"
    )
    roll = kll_rollup(stacked, ["metric"], "value", 200)
    q = {
        (r["metric"], round(r["q"], 4)): float(r["value"])
        for r in kll_quantiles(
            roll, ["metric"], [0.1, 0.5, 0.95, 0.99]
        ).collect()
    }

    n_docs = row["n_docs"]
    card = {
        "n_docs": int(n_docs),
        "total_tokens": int(row["total_tokens"] or 0),
        "avg_tokens": float(row["avg_tokens"] or 0.0),
        "tokens_p50": q.get(("n_tokens", 0.5), 0.0),
        "tokens_p95": q.get(("n_tokens", 0.95), 0.0),
        "tokens_p99": q.get(("n_tokens", 0.99), 0.0),
        "avg_chars": float(row["avg_chars"] or 0.0),
        "avg_quality": float(row["avg_quality"] or 0.0),
        "quality_p10": q.get(("quality", 0.1), 0.0),
        # estimate (HLL ±~2%): flagged in the key name, not hidden
        "exact_dup_rate_est": (
            max(0.0, 1.0 - row["distinct_content_est"] / n_docs) if n_docs else 0.0
        ),
    }
    lang_dist = (
        src.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn("doc_frac", F.col("n_docs") / F.lit(float(n_docs or 1)))
        .orderBy(F.col("n_docs").desc(), F.col("lang").asc())
    )
    if metadata_cols:
        from fenix_spark.operators.infotheory import column_entropy, mi_matrix

        card["metadata_entropy"] = {
            r["column"]: float(r["entropy"])
            for r in column_entropy(df, list(metadata_cols)).collect()
        }
        if len(metadata_cols) >= 2:
            card["redundant_metadata_pairs"] = sorted(
                (r["col_a"], r["col_b"], float(r["nmi"]))
                for r in mi_matrix(df, list(metadata_cols)).collect()
                if r["nmi"] >= redundancy_nmi
            )
    return card, lang_dist
