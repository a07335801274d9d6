"""Data Selection via Importance Resampling (DSIR) — pick the subset
of a raw crawl that is distributed like a trusted target corpus
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023).

The method, re-expressed Spark-first:

1. **Features**: hashed n-gram counts. Every unigram and bigram of a
   document is hashed into ``buckets`` bins (hash60 % B — the same
   md5-derived portable hash the dedup family uses, so every stage is
   DuckDB-mirrorable).
2. **Fit** bag-of-ngrams categorical distributions for the target
   corpus ``p`` and the raw corpus ``q`` with add-α smoothing:
   ``log p_b = ln((c_b^tgt + α) / (N_tgt + α·B))`` and likewise for
   ``q``. Each fit is ONE count aggregation whose shuffle carries
   (bucket, count) pairs — at most B=10k distinct keys with map-side
   partial aggregation, independent of corpus size.
3. **Score** each raw document with its importance log-weight
   ``log w(x) = Σ_grams (log p_b − log q_b)`` — a broadcast join of
   the gram stream against the B-row log-ratio table plus one per-doc
   aggregation. No driver-side anything; the only corpus-sized
   shuffle is the per-doc sum keyed by id.
4. **Resample** k documents without replacement with probability
   ∝ w(x) via the Gumbel top-k trick (Vieira 2014): key =
   ``log w + Gumbel(0,1)``, take the k largest. The Gumbel noise is
   derived from ``hash60(id ‖ salt)`` instead of an RNG, so selection
   is a pure row function — deterministic across retries,
   repartitioning, and engines — and the take is Spark's
   ``TakeOrderedAndProject`` (per-partition top-k, then a k-row merge
   on the driver; no global sort materialization).

Scale ledger: feature extraction is scan-local; the two fits shuffle
≤ B rows per partition; scoring broadcasts 10k rows and shuffles
(id, partial-sum) pairs; selection ships k rows. Nothing moves
document text except the final keep-join output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60, let, tokens
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy

DEFAULT_BUCKETS = 10_000
# 2^60: hash60's range, the divisor that maps it onto (0, 1).
_HASH60_RANGE = 1 << 60


def gram_occurrences(text: Column, max_ngram: int = 2) -> Column:
    """array<string> of every n-gram OCCURRENCE (n = 1..max_ngram) of
    the tokenized text — counts matter for the bag-of-ngrams model, so
    no distinct. A document with fewer than n tokens contributes no
    n-grams for that n (explicit empty branch; unlike
    ``word_shingles`` there is no whole-document fallback, which would
    double-count the unigram stream)."""

    def body(tk: Column) -> Column:
        # a real closure per n: F.transform treats a 2-arg lambda as
        # (value, index), so the usual `lambda i, n=n` capture misfires
        def ngram_at(n: int):
            return lambda i: F.concat_ws(
                " ", *[F.element_at(tk, (i + j).cast("int")) for j in range(n)]
            )

        arms = [tk]
        for n in range(2, max_ngram + 1):
            idx = F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1))
            full = F.transform(idx, ngram_at(n))
            arms.append(
                F.when(F.size(tk) >= n, full).otherwise(
                    F.array().cast("array<string>")
                )
            )
        return F.concat(*arms) if len(arms) > 1 else arms[0]

    return let(tokens(text), body)


def doc_gram_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = DEFAULT_BUCKETS,
    max_ngram: int = 2,
) -> DataFrame:
    """(id, b) — one row per gram occurrence, b = hash60(gram) % B.
    Scan-local (tokenize + hash inside the scan projection); the
    ``spread`` guard keeps small single-file inputs parallel."""
    from fenix_spark.operators.dedup import spread

    return spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                gram_occurrences(F.col(text_col), max_ngram),
                lambda g: hash60(g) % F.lit(buckets),
            )
        ).alias("b"),
    )


@dataclass(frozen=True)
class ImportanceModel:
    """The fitted log-ratio table: (b, log_ratio) over the FULL bucket
    domain 0..B-1 (so scoring is a plain inner join — every gram's
    bucket is present). 10k rows — broadcast it."""

    log_ratio: DataFrame
    buckets: int
    alpha: float
    max_ngram: int


def _bucket_counts(grams: DataFrame) -> DataFrame:
    return grams.groupBy("b").agg(F.count(F.lit(1)).alias("c"))


def fit_importance_model(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 0.5,
    max_ngram: int = 2,
) -> ImportanceModel:
    """Fit p (target) and q (raw) hashed-ngram distributions and
    return the per-bucket log ratio ``ln p_b − ln q_b``.

    The two totals are collected as driver scalars (two tiny jobs over
    the B-row count frames); the ratio table itself is built over
    ``spark.range(buckets)`` so untouched buckets still carry their
    smoothed ratio."""
    spark = target_df.sparkSession
    tc = _bucket_counts(
        doc_gram_buckets(target_df, text_col, id_col, buckets, max_ngram)
    ).transform(_ckpt_lazy)
    rc = _bucket_counts(
        doc_gram_buckets(raw_df, text_col, id_col, buckets, max_ngram)
    ).transform(_ckpt_lazy)
    n_t = tc.agg(F.sum("c")).first()[0] or 0
    n_r = rc.agg(F.sum("c")).first()[0] or 0
    dom = spark.range(buckets).select(F.col("id").alias("b"))
    ratio = (
        dom.join(tc.withColumnRenamed("c", "ct"), "b", "left")
        .join(rc.withColumnRenamed("c", "cr"), "b", "left")
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                    / F.lit(float(n_t) + alpha * buckets)
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(alpha))
                    / F.lit(float(n_r) + alpha * buckets)
                )
            ).alias("log_ratio"),
        )
    )
    return ImportanceModel(ratio, buckets, float(alpha), max_ngram)


def importance_weights(
    df: DataFrame, text_col: str, id_col: str, model: ImportanceModel
) -> DataFrame:
    """(id, n_grams, log_weight) per document. Documents with no grams
    get log_weight 0 (weight 1 — no evidence either way), n_grams 0.

    log_weight is rounded at 6dp (repo oracle convention); the sum is
    over float64 log ratios of exact integer counts, reproducible by
    DuckDB to well past 6dp on realistic gram counts."""
    g = doc_gram_buckets(df, text_col, id_col, model.buckets, model.max_ngram)
    scored = (
        g.join(F.broadcast(model.log_ratio), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("log_ratio").alias("lw"),
        )
    )
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        (F.round(F.coalesce(F.col("lw"), F.lit(0.0)), 6) + F.lit(0.0)).alias(
            "log_weight"
        ),
    )


def gumbel_key(id_col: Column, salt: str = "") -> Column:
    """Deterministic standard-Gumbel draw from the row id: u =
    (hash60(id ‖ salt) + 0.5) / 2^60 ∈ (0, 1), g = −ln(−ln u). The
    +0.5 keeps u strictly inside (0, 1) so both logs are finite."""
    u = (
        hash60(F.concat(id_col.cast("string"), F.lit(salt))).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_HASH60_RANGE))
    return -F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: ImportanceModel,
    k: int,
    salt: str = "",
) -> DataFrame:
    """The k resampled documents: (id, log_weight, gumbel_score),
    sampled without replacement with probability ∝ exp(log_weight)
    via deterministic Gumbel top-k. Ties (impossible at float64
    precision except for identical ids) break on id for stable output.

    The take is orderBy + limit → ``TakeOrderedAndProject``: each
    partition keeps its local top-k and the driver merges k·P rows —
    no global sort, no full shuffle. Join the result back to ``df``
    on id to fetch the kept documents' payload."""
    w = importance_weights(df, text_col, id_col, model)
    keyed = w.withColumn(
        "gumbel_score",
        (F.round(F.col("log_weight") + gumbel_key(F.col("id"), salt), 6) + F.lit(0.0)),
    )
    return keyed.orderBy(F.col("gumbel_score").desc(), F.col("id").asc()).limit(k)
