"""N-gram language-model quality scoring (CCNet-style perplexity
filter, Wenzek et al. 2020) — the statistical complement to the
rule-based ``textstats.quality_score``.

A production pipeline scores every document's perplexity under an LM
trained on trusted text and drops the high-perplexity tail. KenLM
needs an external binary; the dependency-free analog with the same
pipeline shape is an add-α-smoothed bigram model:

    logp(w2 | w1) = ln( (c(w1,w2) + α) / (c(w1) + α·V) )
    H(doc)  = −mean logp over the doc's bigrams
    ppl(doc) = exp(H)

Scale shape:

- TRAINING is two count aggregations over exploded token pairs — the
  shuffles move (token, count) / (token-pair, count) rows, never text.
  Model size is vocabulary-shaped (unigrams ~V, bigrams ~observed
  pairs), stored as DataFrames, writable through the catalog like any
  table.
- SCORING is two equi-joins of the doc's bigram stream against the
  model (broadcast when the model is small — the common case for a
  filter LM trained on a curated reference corpus; shuffle hash join
  otherwise) + one per-doc aggregation. No driver-side anything.
- Unseen bigrams and unseen context words fall out of the same
  formula via count coalesce-to-0 — the add-α mass, no special cases.

Every float is rounded at 6dp on output (repo oracle convention);
the arithmetic is plain float64 on exact integer counts, so DuckDB
reproduces it bit-for-bit (tested in tests/test_ngram_lm.py with an
in-process DuckDB mirror).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import let, tokens
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy


@dataclass(frozen=True)
class BigramLM:
    unigrams: DataFrame  # (w1, c1)
    bigrams: DataFrame  # (w1, w2, c12)
    vocab_size: int
    alpha: float


def doc_token_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per consecutive token pair. The token
    array is let-bound (one tokenize per row); docs with < 2 tokens
    contribute no rows."""
    from fenix_spark.operators.dedup import spread

    def body(tk: Column) -> Column:
        # explicit short-doc branch: Spark's sequence(1, 0) is a
        # DESCENDING [1, 0], not empty (same trap word_shingles guards)
        idx = F.when(
            F.size(tk) >= 2, F.sequence(F.lit(1), F.size(tk) - 1)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(tk, i.cast("int")).alias("w1"),
                F.element_at(tk, (i + 1).cast("int")).alias("w2"),
            ),
        )

    return (
        spread(df)
        .select(F.col(id_col).alias("id"), F.explode(let(tokens(F.col(text_col)), body)).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_lm(
    df: DataFrame, text_col: str, id_col: str, alpha: float = 0.5
) -> BigramLM:
    """Count-based training (module docstring). The two aggregations
    are the only corpus-sized shuffles; both frames are lazily
    reusable DataFrames (persist or write them for reuse across
    scoring runs)."""
    pairs = doc_token_pairs(df, text_col, id_col).transform(_ckpt_lazy)
    unigrams = (
        pairs.groupBy(F.col("w1"))
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bigrams = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # V = distinct tokens anywhere in the corpus (first or second slot)
    vocab_size = (
        pairs.select(F.col("w1").alias("w"))
        .union(pairs.select(F.col("w2").alias("w")))
        .distinct()
        .count()
    )
    return BigramLM(unigrams, bigrams, int(vocab_size), float(alpha))


def perplexity(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lm: BigramLM,
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, n_bigrams, cross_entropy, ppl) per document; documents with
    fewer than two tokens get null entropy/ppl (no bigram evidence —
    explicit, not an arbitrary score)."""
    bg = doc_token_pairs(df, text_col, id_col)
    b = F.broadcast(lm.bigrams) if broadcast_model else lm.bigrams
    u = F.broadcast(lm.unigrams) if broadcast_model else lm.unigrams
    joined = bg.join(b, ["w1", "w2"], "left").join(u, ["w1"], "left")
    logp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(lm.alpha))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(lm.alpha * lm.vocab_size))
    )
    scored = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg(logp)).alias("h"),
    )
    out = df.select(F.col(id_col).alias("id")).join(scored, "id", "left")
    return out.select(
        "id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        (F.round(F.col("h"), 6) + F.lit(0.0)).alias("cross_entropy"),
        (F.round(F.exp(F.col("h")), 6) + F.lit(0.0)).alias("ppl"),
    )
