"""Benchmark decontamination: flag / drop training documents that
share n-gram content with a held-out evaluation set.

The standard training-data hygiene pass (GPT-3 §C-style 13-gram
collision, scaled down for short documents): a corpus document is
contaminated when any of its word n-grams also appears in the
benchmark. Extends the reference's dedup surface (the engine family at
`/root/reference/src/fenix/io/coder.py` covers only vector-space
similarity) with the text-overlap variant every LLM data pipeline
needs.

Scale design (100 TB corpus, benchmark ≪ corpus):

- The benchmark's DISTINCT gram-hash set is tiny (eval sets are
  thousands of docs) and is broadcast — the corpus side then does a
  map-side semi-join on 8-byte hashes: corpus text is tokenized,
  shingled, and hashed INSIDE the scan projection, never shuffled.
- The only shuffle is the per-doc hit count: (doc_id, 1) pairs for
  matching grams only, partial-aggregated map-side.
- If the benchmark outgrows the broadcast budget the same pipeline
  degrades to a shuffled equi-join on the gram hash — still 8-byte
  keys, never text.
- ``decontaminate`` is a broadcast LEFT ANTI join of corpus against
  the flagged doc-id list (flagged set ≤ benchmark-adjacent size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60, tokens, word_shingles


def doc_gram_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    spread_input: bool = False,
) -> DataFrame:
    """(id, distinct 60-bit n-gram hash) pairs — one row per distinct
    gram per document; hashing happens before the explode so only
    8-byte values ever widen the plan.

    ``spread_input=True`` repartitions one-file inputs across cores
    before the tokenize+shingle+hash projection (``dedup.spread`` — a
    no-op once the input has ≥ cores splits). r13 A/B at sf0.1: the
    CORPUS gram pass is the query's dominant term and was serializing
    on the single-file input (1.4–2.1 s → 1.0–1.3 s with spread); the
    benchmark side stays un-spread (it is a small slice and the extra
    exchange costs more than the parallelism buys)."""
    grams: Column = F.array_distinct(
        F.transform(word_shingles(tokens(F.col(text_col)), n), hash60)
    )
    if spread_input:
        from fenix_spark.operators.dedup import spread

        df = spread(df)
    return df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram"))


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast: bool = True,
) -> DataFrame:
    """Per contaminated corpus doc: how many of its distinct n-grams
    collide with the benchmark (docs with zero hits are absent).

    Output: (doc_id, n_grams, n_hits, hit_frac) — ``hit_frac`` is the
    contaminated fraction of the doc's distinct grams, the usual
    threshold knob (1 hit of a 13-gram is already damning; shorter
    grams want a fraction cut)."""
    bench_grams = (
        doc_gram_hashes(benchmark, text_col, id_col, n)
        .select("gram")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast:
        bench_grams = F.broadcast(bench_grams)
    corpus_grams = doc_gram_hashes(corpus, text_col, id_col, n, spread_input=True)
    # LEFT broadcast join + ONE aggregation: n_grams = all rows,
    # n_hits = non-null marks. (Two separate aggs re-joined on doc_id
    # would cost three shuffles; this plan's only corpus-sized exchange
    # is the per-doc partial-aggregated count.)
    marked = corpus_grams.join(bench_grams, "gram", "left")
    return (
        marked.groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"), F.count("__hit").alias("n_hits"))
        .where(F.col("n_hits") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_grams"), 6).alias("hit_frac"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
    min_hit_frac: float = 0.0,
) -> DataFrame:
    """Corpus minus contaminated docs (LEFT ANTI on the flagged id
    list, which is broadcast — it is bounded by the benchmark's
    n-gram reach, not the corpus size)."""
    flagged = contamination_report(corpus, benchmark, text_col, id_col, n).where(
        (F.col("n_hits") >= min_hits) & (F.col("hit_frac") >= min_hit_frac)
    )
    return corpus.join(
        F.broadcast(flagged.select(F.col("doc_id").alias(id_col))), id_col, "left_anti"
    )
