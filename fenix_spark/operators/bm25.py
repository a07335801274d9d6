"""BM25 full-text ranking — the classic IR scoring the reference's
vector search family lacks, built fully relationally so Catalyst owns
the physical plan.

    score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1)
                             ─────────────────────────────────
                             tf(t,d) + k1·(1 − b + b·|d|/avgdl)

    idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )   (Lucene form,
    always positive)

Scale shape:

- The POSTINGS build is the one corpus-sized job: explode tokens →
  per-(doc, term) term frequency — (8-byte id, term, count) rows in
  the shuffle, never text. Build once, write through the catalog,
  reuse across queries (``build_postings`` output is a plain table).
- Document lengths and document frequencies are two small aggregations
  of the postings.
- A QUERY is: filter postings to the query's terms (broadcast semi-
  join against a literal-array explode — prunes to the tiny slice of
  matching postings), join document frequencies (vocab-sized,
  broadcast), score natively, one top-k. Per-query cost is
  |matching postings|, independent of corpus width.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import tokens
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy


@dataclass(frozen=True)
class BM25Index:
    postings: DataFrame  # (doc_id, term, tf, dl) — dl denormalized in
    doc_freq: DataFrame  # (term, df)
    n_docs: int
    avgdl: float


def build_postings(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, term, tf) — one row per distinct term per document."""
    from fenix_spark.operators.dedup import spread

    return (
        spread(df)
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def build_bm25_index(df: DataFrame, text_col: str, id_col: str) -> BM25Index:
    """Postings with the document length DENORMALIZED in (one window
    over doc_id at build time — Lucene stores per-doc norms the same
    way) so queries never join a corpus-sized lengths table. ``n_docs``
    counts every input document (empty docs too — they shape avgdl the
    same way Lucene's maxDoc does)."""
    from pyspark.sql import Window

    raw = build_postings(df, text_col, id_col)
    postings = raw.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
    ).transform(_ckpt_lazy)
    doc_freq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.count()
    total_len = (
        postings.groupBy("doc_id").agg(F.max("dl").alias("dl")).agg(F.sum("dl")).head()[0]
        or 0
    )
    avgdl = float(total_len) / n_docs if n_docs else 0.0
    return BM25Index(postings, doc_freq, int(n_docs), avgdl)


def bm25_search(
    spark: SparkSession,
    index: BM25Index,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k (doc_id, score) for a free-text query; deterministic
    (score rounded at 6dp, doc_id tiebreak). Documents match if they
    share ANY query term (disjunctive, the standard BM25 retrieval)."""
    q_terms = (
        spark.createDataFrame([(t,) for t in set(query.split())], "qt string")
        .select(tokens(F.col("qt")).alias("ts"))
        .select(F.explode("ts").alias("term"))
        .distinct()
    )
    hits = index.postings.join(F.broadcast(q_terms), "term")
    # prune doc_freq to the query's terms BEFORE broadcasting — the
    # broadcast is |query| rows, not |vocabulary|
    q_df = index.doc_freq.join(F.broadcast(q_terms), "term")
    scored = (
        hits.join(F.broadcast(q_df), "term")
        .withColumn(
            "idf",
            F.log(
                (F.lit(index.n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(index.avgdl))),
        )
        .groupBy("doc_id")
        .agg((F.round(F.sum("w"), 6) + F.lit(0.0)).alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(k)


# ----------------------------------------------------------- BM25F


@dataclass(frozen=True)
class BM25FIndex:
    postings: DataFrame  # (doc_id, field, term, tf, dl_f)
    doc_freq: DataFrame  # (term, df) — document-level, any field
    n_docs: int
    avgdl: dict  # field -> average field length


def build_bm25f_index(
    df: DataFrame, fields: "dict[str, tuple[float, float]]", id_col: str
) -> BM25FIndex:
    """Field-aware postings for BM25F (Robertson, Zaragoza, Taylor,
    CIKM 2004 — "Simple BM25 extension to multiple weighted fields").
    ``fields`` maps text column → (weight, b); the mapping is also
    what ``bm25f_search`` scores with, so it is stored nowhere — pass
    the same dict. Document frequency is DOCUMENT-level (a term in
    any field counts once), which is the paper's core correction over
    naive per-field BM25 mixing: a title hit must not get a second
    idf from the body."""
    from fenix_spark.operators.dedup import spread
    from pyspark.sql import Window

    parts = []
    for col in fields:
        parts.append(
            spread(df)
            .select(
                F.col(id_col).alias("doc_id"),
                F.lit(col).alias("field"),
                F.explode(tokens(F.col(col))).alias("term"),
            )
            .groupBy("doc_id", "field", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    raw = parts[0]
    for p in parts[1:]:
        raw = raw.unionByName(p)
    postings = raw.withColumn(
        "dl_f", F.sum("tf").over(Window.partitionBy("doc_id", "field"))
    ).transform(_ckpt_lazy)
    doc_freq = (
        postings.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = df.count()
    avgdl = {}
    for col in fields:
        total = (
            postings.where(F.col("field") == col)
            .groupBy("doc_id")
            .agg(F.max("dl_f").alias("dl"))
            .agg(F.sum("dl"))
            .head()[0]
            or 0
        )
        avgdl[col] = float(total) / n_docs if n_docs else 0.0
    return BM25FIndex(postings, doc_freq, int(n_docs), avgdl)


def bm25f_search(
    spark: SparkSession,
    index: BM25FIndex,
    fields: "dict[str, tuple[float, float]]",
    query: str,
    k: int = 10,
    k1: float = 1.2,
) -> DataFrame:
    """Top-k (doc_id, score) under BM25F: per (doc, term) the fields
    fold into one pseudo-frequency
    ``tf̃ = Σ_f weight_f · tf_f / (1 − b_f + b_f·dl_f/avgdl_f)``
    which then saturates ONCE through the usual k1 form
    ``idf · tf̃·(k1+1)/(tf̃ + k1)``. With a single field at weight 1
    this is exactly ``bm25_search`` (parity pinned in tests). Same
    pruned-broadcast query shape: per-query cost is the matching
    postings slice, never the corpus."""
    q_terms = (
        spark.createDataFrame([(t,) for t in set(query.split())], "qt string")
        .select(tokens(F.col("qt")).alias("ts"))
        .select(F.explode("ts").alias("term"))
        .distinct()
    )
    hits = index.postings.join(F.broadcast(q_terms), "term")
    norm = None
    for col, (w, b) in fields.items():
        avg = index.avgdl.get(col) or 1.0
        term = F.when(
            F.col("field") == col,
            F.lit(w)
            * F.col("tf")
            / (1 - b + b * F.col("dl_f") / F.lit(avg)),
        ).otherwise(F.lit(0.0))
        norm = term if norm is None else norm + term
    per_doc_term = hits.withColumn("tfw", norm).groupBy(
        "doc_id", "term"
    ).agg(F.sum("tfw").alias("tfw"))
    q_df = index.doc_freq.join(F.broadcast(q_terms), "term")
    scored = (
        per_doc_term.join(F.broadcast(q_df), "term")
        .withColumn(
            "idf",
            F.log(
                (F.lit(index.n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "w",
            F.col("idf") * (F.col("tfw") * (k1 + 1)) / (F.col("tfw") + k1),
        )
        .groupBy("doc_id")
        .agg((F.round(F.sum("w"), 6) + F.lit(0.0)).alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(k)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """(doc_id, term, tf, tfidf, rank) — each document's ``k`` highest
    scoring terms under smoothed TF-IDF (the sklearn convention:
    idf = ln((N+1)/(df+1)) + 1, never negative, never divides by
    zero), the standard corpus-statistical keyword extractor for
    datacards and topic drill-downs.

    Deterministic: ties broken by term ASC, so the output is oracle-
    checkable row-for-row.

    Scale shape: one postings build (explode → (doc, term, tf); ids +
    terms in the shuffle, never text), one vocab-sized document-
    frequency aggregate joined back ON TERM (vocab ≪ postings;
    partial-aggregable), one per-doc window top-k. N is taken from
    the postings (docs with no tokens contribute no terms and no df —
    consistent numerator/denominator).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be ≥ 1 (got {k})")
    postings = build_postings(df, text_col, id_col).transform(_ckpt_lazy)
    n_docs = postings.select("doc_id").distinct().count()
    doc_freq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1.0)) + 1.0
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        postings.join(doc_freq, "term")
        .withColumn("tfidf", F.col("tf") * idf)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


def group_distinctive_terms(
    df: DataFrame,
    text_col: str,
    group_col: str,
    k: int = 10,
    alpha: float = 0.01,
) -> DataFrame:
    """(group, term, count, zscore, rank) — the ``k`` terms most
    DISTINCTIVE of each group versus the rest of the corpus, by
    log-odds ratio with an informative Dirichlet prior (Monroe,
    Colaresi & Quinn, Political Analysis 2008 — the "fightin' words"
    statistic). Plain per-group TF-IDF surfaces common-but-frequent
    terms; the z-scored log-odds surfaces what a group says that the
    REST doesn't, shrinking rare-term noise through the corpus-wide
    prior (``alpha`` · corpus term count).

        δ_t = ln( (y_gt + α_t) / (n_g + α − y_gt − α_t) )
            − ln( (y_rt + α_t) / (n_r + α − y_rt − α_t) )
        σ²  ≈ 1/(y_gt + α_t) + 1/(y_rt + α_t),   z = δ/σ

    Scale shape: ONE (group, term) count aggregation of the exploded
    corpus (partial-aggregable; shuffle rows are (group, term, long)),
    a vocab-sized corpus-total frame joined back on term, group
    totals broadcast, one per-group window top-k. Nothing driver-side.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be ≥ 1 (got {k})")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (got {alpha})")
    gt = (
        df.select(
            F.col(group_col).alias("group"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("group", "term")
        .agg(F.count(F.lit(1)).alias("count"))
        .transform(_ckpt_lazy)
    )
    corpus = gt.groupBy("term").agg(F.sum("count").alias("y_all"))
    totals = gt.groupBy("group").agg(F.sum("count").alias("n_g"))
    n_all = gt.agg(F.sum("count")).head()[0] or 0
    a_t = F.col("y_all") * F.lit(alpha)
    a_tot = F.lit(float(n_all * alpha))
    y_g = F.col("count")
    y_r = F.col("y_all") - F.col("count")
    n_r = F.lit(float(n_all)) - F.col("n_g")
    delta = F.log((y_g + a_t) / (F.col("n_g") + a_tot - y_g - a_t)) - F.log(
        (y_r + a_t) / (n_r + a_tot - y_r - a_t)
    )
    var = 1.0 / (y_g + a_t) + 1.0 / (y_r + a_t)
    w = Window.partitionBy("group").orderBy(F.desc("zscore"), F.asc("term"))
    return (
        gt.join(corpus, "term")
        .join(F.broadcast(totals), "group")
        .withColumn("zscore", delta / F.sqrt(var))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("group", "term", "count", "zscore", "rank")
    )
