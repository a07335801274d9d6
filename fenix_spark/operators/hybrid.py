"""Hybrid retrieval — fuse lexical (BM25) and vector (KNN) rankings
with Reciprocal Rank Fusion (Cormack et al., SIGIR 2009): the
standard production combiner because it needs NO score calibration
(ranks only), is robust to one ranker failing, and is a one-line
formula: ``rrf(d) = Σ_rankers 1 / (rrf_k + rank_d)``.

Spark shape: each ranker returns its top-n as a small DataFrame
(both are TakeOrderedAndProject plans); the fusion is a full-outer
join of two ≤n-row frames + one ranking — driver-scale work by
construction, independent of corpus size. Missing ranks contribute
nothing (the 1/(k+rank) term is absent, per the original RRF paper).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    rrf_k: int = 60,
    ascending: list[bool] | None = None,
) -> DataFrame:
    """Fuse ranker outputs (each already best-first; row order is
    made explicit with a window rank per input) into top-k
    (id, rrf_score, n_rankers). Deterministic: 6dp-rounded score,
    id tiebreak.

    Rank direction per input: pass ``ascending`` explicitly (True =
    smaller-is-better, e.g. distances). When omitted, a NAME
    heuristic applies — columns ending in 'distance'/'dist' rank
    ascending, everything else descending — which is right for this
    repo's rankers but is a guess for arbitrary frames; passing the
    list is the contract-safe form."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked frame")
    if ascending is not None and len(ascending) != len(ranked):
        raise ValueError(
            f"ascending has {len(ascending)} entries for {len(ranked)} frames"
        )
    scored = None
    for i, df in enumerate(ranked):
        # re-rank from the frame's FIRST non-id column so fusion never
        # depends on physical row order
        others = [c for c in df.columns if c != id_col]
        if not others:
            raise ValueError(
                f"ranked frame {i} has only {id_col!r} — each input needs "
                "a ranking column (score or distance)"
            )
        order_col = others[0]
        asc = (
            ascending[i]
            if ascending is not None
            else order_col.lower().endswith(("distance", "dist"))
        )
        w = Window.orderBy(
            F.col(order_col).asc() if asc else F.col(order_col).desc(),
            F.col(id_col).asc(),
        )
        r = df.select(
            F.col(id_col).alias("id"),
            F.row_number().over(w).alias(f"rank_{i}"),
        )
        scored = r if scored is None else scored.join(r, "id", "full_outer")
    terms = [
        F.when(
            F.col(f"rank_{i}").isNotNull(),
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"rank_{i}")),
        ).otherwise(F.lit(0.0))
        for i in range(len(ranked))
    ]
    present = sum(
        F.col(f"rank_{i}").isNotNull().cast("int") for i in range(len(ranked))
    )
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return (
        scored.select(
            "id",
            (F.round(total, 6) + F.lit(0.0)).alias("rrf_score"),
            present.alias("n_rankers"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col("id").asc())
        .limit(k)
    )


def hybrid_search(
    spark: SparkSession,
    docs: DataFrame,
    bm25_index,
    query_text: str,
    query_vec,
    embedding_col: str = "embedding",
    id_col: str = "doc_id",
    k: int = 10,
    candidates_per_ranker: int = 50,
    metric: str = "cosine",
) -> DataFrame:
    """BM25 + brute-KNN top-``candidates_per_ranker`` each, RRF-fused
    to top-k. Swap the knn arm for ``probe_search``/``ivfpq_search``
    at index scale — fusion only sees the two small result frames."""
    from fenix_spark.operators.bm25 import bm25_search
    from fenix_spark.operators.search import knn

    # bm25_search returns a hard-coded (doc_id, score) — realias to
    # the caller's id_col so the fusion join lines up
    lex = bm25_search(spark, bm25_index, query_text, k=candidates_per_ranker)
    lex = lex.select(F.col("doc_id").alias(id_col), "score")
    vec = knn(
        docs, embedding_col, query_vec, metric=metric,
        k=candidates_per_ranker, id_col=id_col,
    ).select(F.col(id_col), F.col("__DISTANCE__").alias("distance"))
    return rrf_fuse(
        [lex, vec],
        id_col=id_col,
        k=k,
        ascending=[False, True],  # bm25 score desc, distance asc
    )


def mmr_rerank(
    candidates: DataFrame,
    keys: Sequence[str],
    id_col: str,
    vec_col: str,
    score_col: str,
    k: int = 10,
    lam: float = 0.5,
    max_candidates: int = 10_000,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein,
    SIGIR 1998): greedily pick argmax ``λ·relevance − (1−λ)·max
    cosine-similarity to already-picked`` — the standard redundancy
    cut for retrieval results (near-duplicate hits waste the result
    page; pure top-k returns them all).

    Runs per group over an ALREADY-BOUNDED candidate list (feed a
    ranker's top-n, e.g. `hybrid_search`/`knn` output — never a raw
    corpus; ``max_candidates`` enforces the contract loudly). Each
    group is one Arrow batch: the greedy loop is numpy GEMM against
    the picked set, O(n·k) per group, embarrassingly parallel across
    groups. λ=1 reduces to plain score order (pinned in tests).

    Deterministic: ties break by id ascending. Scores should be
    already comparable within a group (MMR mixes them with cosine
    sim, which lives in [-1, 1] — normalize upstream if needed).
    Output: input columns + ``mmr_rank`` (0-based pick order) and
    ``mmr_score`` (the marginal value at pick time)."""
    import pandas as pd  # noqa: F401

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key_list = list(keys)
    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in candidates.schema.fields
        )
        + ", mmr_rank int, mmr_score double"
    )

    def rerank(pdf):
        import numpy as np

        if len(pdf) > max_candidates:
            raise ValueError(
                f"mmr_rerank got a {len(pdf)}-row candidate group "
                f"(max_candidates={max_candidates}); rerank a bounded "
                "top-n, not a corpus"
            )
        pdf = pdf.sort_values(
            [score_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.stack(pdf[vec_col].to_numpy())
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        U = V / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype="float64")
        n = len(pdf)
        picked: list[int] = []
        max_sim = np.full(n, -np.inf)
        mmr_scores = []
        remaining = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            if picked:
                marg = lam * rel - (1.0 - lam) * max_sim
            else:
                marg = lam * rel
            marg_masked = np.where(remaining, marg, -np.inf)
            best = int(np.argmax(marg_masked))  # first index wins ties
            # ties broken by the (score desc, id asc) presort order
            picked.append(best)
            mmr_scores.append(float(marg_masked[best]))
            remaining[best] = False
            sims = U @ U[best]
            max_sim = np.maximum(max_sim, sims)
        out = pdf.iloc[picked].copy()
        out["mmr_rank"] = range(len(picked))
        out["mmr_score"] = mmr_scores
        return out

    if key_list:
        return candidates.groupBy(*key_list).applyInPandas(rerank, out_schema)
    return candidates.groupBy().applyInPandas(rerank, out_schema)
