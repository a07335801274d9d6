"""Curation recipes — compose the operator families into end-to-end
training-data pipelines with per-stage provenance.

A pipeline is just an ordered list of named stages, each a
``DataFrame -> DataFrame`` function built from this repo's operators.
``run_pipeline`` chains them LAZILY (one logical plan when
``audit=False`` — Catalyst fuses scan-local stages into a single
pass) or with per-stage row accounting (``audit=True`` — one count
job per stage boundary, the mode for pipeline bring-up and drift
monitoring).

``standard_curation`` is the reference recipe — the order matters and
is the industry-standard one:

1. exact dedup FIRST (cheapest, shrinks everything downstream),
2. near-dup second (quadratic-ish candidate costs want the smallest
   corpus),
3. quality/perplexity gates third (model scoring per surviving doc),
4. decontamination fourth (against the post-dedup corpus so flagged
   ids stay valid),
5. PII scrub last (rewrites text; earlier stages hash/shingle the
   ORIGINAL text so dedup decisions are stable across scrub-config
   changes).

Each stage is also exported standalone — the recipe is composition,
not new semantics.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy

Stage = tuple[str, Callable[[DataFrame], DataFrame]]


@dataclass(frozen=True)
class StageReport:
    name: str
    rows_in: int
    rows_out: int
    psi: float | None = None

    @property
    def dropped(self) -> int:
        return self.rows_in - self.rows_out


def run_pipeline(
    df: DataFrame,
    stages: Sequence[Stage],
    audit: bool = True,
    watch: tuple[str, float, float, int] | None = None,
    max_psi: float | None = None,
) -> tuple[DataFrame, list[StageReport]]:
    """Chain stages; with ``audit`` return per-stage row accounting
    (each boundary is counted once — the checkpoint stops upstream
    recompute per count).

    ``watch=(col, lo, hi, bins)`` adds distribution monitoring to the
    audit: each stage's PSI of the watched numeric column (its output
    distribution vs its input's, `operators/drift.py`) lands in the
    report — one extra hist_rollup per boundary, summary-sized. A
    curation stage SHOULD drop rows; what it should NOT do is RESHAPE
    the survivors' distribution (a miswired quality gate flattening
    token lengths shows up here while row counts still look sane).
    ``max_psi`` turns the monitor into a gate: the first stage
    exceeding it raises, naming the stage and its score (> 0.25 is
    the conventional "shifted" threshold)."""
    reports: list[StageReport] = []
    cur = df
    if not audit:
        for _, fn in stages:
            cur = fn(cur)
        return cur, reports

    def hist(frame: DataFrame):
        from fenix_spark.operators.sketches import hist_rollup

        col, lo, hi, bins = watch
        return hist_rollup(
            frame.select(F.lit("w").alias("__w"), F.col(col)),
            ["__w"], col, lo, hi, bins,
        ).transform(_ckpt_lazy)

    n_in = cur.count()
    h_prev = hist(cur) if watch else None
    for name, fn in stages:
        cur = fn(cur).transform(_ckpt_lazy)
        n_out = cur.count()
        psi = None
        if watch is not None:
            from fenix_spark.operators.drift import hist_drift

            h_cur = hist(cur)
            row = hist_drift(h_prev, h_cur, ["__w"]).head()
            psi = float(row["psi"]) if row is not None else None
            h_prev = h_cur
            if max_psi is not None and psi is not None and psi > max_psi:
                raise ValueError(
                    f"stage {name!r} shifted the {watch[0]!r} distribution: "
                    f"PSI {psi:.4f} > max_psi {max_psi} (rows {n_in} -> "
                    f"{n_out}) — a curation stage should drop rows, not "
                    "reshape the survivors"
                )
        reports.append(StageReport(name, n_in, n_out, psi))
        n_in = n_out
    return cur, reports


# ----------------------------------------------------- stage builders


def exact_dedup_stage(text_col: str, id_col: str) -> Stage:
    """Keep the lowest-id row per normalized-content hash."""
    from fenix_spark.operators.dedup import exact_dedup_by_hash

    def fn(df: DataFrame) -> DataFrame:
        keep = exact_dedup_by_hash(df, text_col, id_col).select(
            F.col("kept_id").alias(id_col)
        )
        return df.join(keep, id_col, "left_semi")

    return ("exact_dedup", fn)


def near_dedup_stage(
    text_col: str,
    id_col: str,
    threshold: float = 0.95,
    shingle: int = 1,
) -> Stage:
    """MinHash-LSH pairs → connected components → min-id survivor."""
    from fenix_spark.operators.components import dedup_keep_list
    from fenix_spark.operators.dedup import minhash_neardup_pairs

    def fn(df: DataFrame) -> DataFrame:
        pairs = minhash_neardup_pairs(df, text_col, id_col, threshold, shingle)
        return dedup_keep_list(df, pairs, id_col, "id_l", "id_r")

    return ("near_dedup", fn)


def quality_stage(
    text_col: str, id_col: str, qm, alpha: float = 9.0, salt: str = ""
) -> Stage:
    """Classifier score + Pareto keep rule (operators/quality.py)."""
    from fenix_spark.operators.quality import quality_filter

    def fn(df: DataFrame) -> DataFrame:
        return quality_filter(df, text_col, id_col, qm, alpha, salt)

    return ("quality", fn)


def perplexity_stage(
    text_col: str, id_col: str, lm, max_ppl: float
) -> Stage:
    """Drop the high-perplexity tail under a trusted bigram LM;
    short docs (null ppl — no bigram evidence) are kept."""
    from fenix_spark.functions.ngram_lm import perplexity

    def fn(df: DataFrame) -> DataFrame:
        scores = perplexity(df, text_col, id_col, lm)
        keep = scores.where(
            F.col("ppl").isNull() | (F.col("ppl") <= max_ppl)
        ).select(F.col("id").alias(id_col))
        return df.join(keep, id_col, "left_semi")

    return ("perplexity", fn)


def decontaminate_stage(
    text_col: str, id_col: str, eval_df: DataFrame,
    n: int = 8, min_hits: int = 1
) -> Stage:
    """``eval_df`` must expose the benchmark text under the same
    ``text_col`` name; a synthetic id is added to satisfy the
    operator's uniform-schema contract."""
    from fenix_spark.operators.decontaminate import decontaminate

    bench = eval_df.select(
        F.monotonically_increasing_id().alias(id_col), F.col(text_col)
    )

    def fn(df: DataFrame) -> DataFrame:
        return decontaminate(df, bench, text_col, id_col, n=n, min_hits=min_hits)

    return ("decontaminate", fn)


def scrub_stage(text_col: str) -> Stage:
    """Redact PII in place (functions/scrub.py); row count unchanged."""
    from fenix_spark.functions.scrub import redact_pii

    def fn(df: DataFrame) -> DataFrame:
        return df.withColumn(text_col, redact_pii(F.col(text_col)))

    return ("scrub_pii", fn)


def sample_stage(id_col: str, fraction: float, salt: str = "") -> Stage:
    from fenix_spark.operators.sampling import deterministic_sample

    def fn(df: DataFrame) -> DataFrame:
        return deterministic_sample(df, id_col, fraction, salt)

    return ("sample", fn)


def standard_curation(
    text_col: str,
    id_col: str,
    *,
    neardup_threshold: float = 0.95,
    quality_model=None,
    quality_alpha: float = 9.0,
    lm=None,
    max_ppl: float | None = None,
    eval_df: DataFrame | None = None,
    scrub: bool = True,
    salt: str = "",
) -> list[Stage]:
    """The reference recipe (module docstring order); optional stages
    are included iff their models/inputs are supplied."""
    stages: list[Stage] = [
        exact_dedup_stage(text_col, id_col),
        near_dedup_stage(text_col, id_col, neardup_threshold),
    ]
    if quality_model is not None:
        stages.append(quality_stage(text_col, id_col, quality_model, quality_alpha, salt))
    if lm is not None and max_ppl is not None:
        stages.append(perplexity_stage(text_col, id_col, lm, max_ppl))
    if eval_df is not None:
        stages.append(decontaminate_stage(text_col, id_col, eval_df))
    if scrub:
        stages.append(scrub_stage(text_col))
    return stages


def paragraph_dedup_stage(text_col: str, id_col: str, min_chars: int = 20) -> Stage:
    """Rewrite documents with globally-repeated paragraphs removed
    (operators/paragraphs.py); rows survive (possibly emptied — pair
    with ``min_length_stage`` downstream)."""
    from fenix_spark.operators.paragraphs import dedup_paragraphs

    def fn(df: DataFrame) -> DataFrame:
        deduped = dedup_paragraphs(df, text_col, id_col, min_chars).select(
            F.col("id").alias(id_col), F.col("text").alias("__new_text")
        )
        return (
            df.join(deduped, id_col)
            .withColumn(text_col, F.col("__new_text"))
            .drop("__new_text")
        )

    return ("paragraph_dedup", fn)


def compression_stage(
    text_col: str, id_col: str, min_ratio: float = 0.15
) -> Stage:
    """Drop pathologically compressible (repetitive) documents —
    ratio below ``min_ratio`` (functions/scrub.compression_ratios);
    empty docs (null ratio) are dropped too."""
    from fenix_spark.functions.scrub import compression_ratios

    def fn(df: DataFrame) -> DataFrame:
        keep = compression_ratios(df, text_col, id_col).where(
            F.col("ratio") >= min_ratio
        ).select(F.col("id").alias(id_col))
        return df.join(keep, id_col, "left_semi")

    return ("compression", fn)


def min_length_stage(text_col: str, min_chars: int = 1) -> Stage:
    def fn(df: DataFrame) -> DataFrame:
        return df.where(F.length(F.trim(F.col(text_col))) >= min_chars)

    return ("min_length", fn)


def dsir_stage(
    text_col: str, id_col: str, model, k: int, salt: str = ""
) -> Stage:
    """Importance-resample down to k documents (operators/dsir.py) —
    the terminal budget stage of a target-matched curation recipe."""
    from fenix_spark.operators.dsir import dsir_select

    def fn(df: DataFrame) -> DataFrame:
        keep = dsir_select(df, text_col, id_col, model, k, salt).select(
            F.col("id").alias(id_col)
        )
        return df.join(keep, id_col, "left_semi")

    return ("dsir_select", fn)


def unicode_stage(text_col: str, nfkc: bool = False) -> Stage:
    """Unicode hygiene (functions/unicode.py), the stage to run FIRST
    — before anything hashes or shingles the text: mojibake repair →
    NFC (or NFKC) normalization → invisible-codepoint strip. Composed
    vs decomposed accents, zero-width-split tokens, and cp1252
    double-decodes all collapse BEFORE dedup keys are derived, so
    formatting-only variants dedup instead of surviving as distinct
    content."""
    from fenix_spark.functions.unicode import (
        fix_mojibake,
        normalize_text,
        strip_invisible,
    )

    form = "NFKC" if nfkc else "NFC"

    def fn(df: DataFrame) -> DataFrame:
        c = fix_mojibake(F.col(text_col))
        c = normalize_text(c, form)
        return df.withColumn(text_col, strip_invisible(c))

    return ("unicode", fn)


def repetition_stage(
    text_col: str, thresholds: dict[str, float] | None = None
) -> Stage:
    """Drop documents failing the Gopher repetition rules
    (functions/repetition.py): duplicated lines / dominant n-grams at
    the published thresholds (override per-signal via
    ``thresholds``). Runs scan-local; the signal columns do not
    survive the stage."""
    from fenix_spark.functions.repetition import gopher_repetition_filter

    def fn(df: DataFrame) -> DataFrame:
        out = gopher_repetition_filter(df, text_col, thresholds, "__rep_ok")
        return out.where(F.col("__rep_ok")).drop("__rep_ok", "__rep_ok_signals")

    return ("repetition_filter", fn)
