"""First-order Markov analysis of per-key event sequences — the
transition structure of user journeys (what follows what), and
sequence scoring against a fitted chain (which sessions are unlike
the corpus). Complements the funnel/sessionize/retention family: those
count WHERE users get to; this models HOW they move.

Scale shape:

- ``transition_counts`` is one per-key ``lead`` window over (key, ts,
  state) rows — the shuffle carries ids and short state strings, never
  payloads — followed by a partial-aggregable (from, to) count. The
  result is |states|² rows at most: summary-sized, broadcastable.
- ``sequence_logprob`` re-derives the same transition pairs and joins
  the BROADCAST probability table, then one per-key sum. Unseen
  transitions get the Laplace floor when the chain was fit with one,
  else -inf (a loud "impossible under the model", not a silent skip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["transition_counts", "sequence_logprob", "top_paths"]


def _pairs(df: DataFrame, key_col: str, ts_col: str, state_col: str) -> DataFrame:
    """(key, from_state, to_state) for consecutive events per key;
    ties on ts break by state so the pairing is deterministic."""
    w = Window.partitionBy("key").orderBy(F.asc("ts"), F.asc("from_state"))
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(state_col).alias("from_state"),
        )
        .withColumn("to_state", F.lead("from_state").over(w))
        .where(F.col("to_state").isNotNull())
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    laplace: float = 0.0,
) -> DataFrame:
    """(from_state, to_state, n, prob) — the first-order transition
    matrix over every key's time-ordered event sequence. ``prob`` is
    row-normalized: P(to | from) = (n + laplace) / (Σ_to n + laplace ·
    |observed states|). With ``laplace`` > 0 every (observed-from,
    observed-state) pair gets a row — including never-seen transitions
    at the smoothed floor — so downstream scoring never hits a hole;
    with 0 only observed transitions appear and each row's prob is the
    exact empirical share.
    """
    if laplace < 0:
        raise ValueError(f"laplace must be ≥ 0 (got {laplace})")
    pairs = _pairs(df, key_col, ts_col, state_col)
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    if laplace > 0:
        # dense (from, state) grid over the states observed anywhere
        states = (
            df.select(F.col(state_col).alias("to_state")).distinct()
        )
        froms = counts.select("from_state").distinct()
        counts = (
            froms.join(F.broadcast(states))
            .join(counts, ["from_state", "to_state"], "left")
            .select(
                "from_state",
                "to_state",
                F.coalesce("n", F.lit(0)).alias("n"),
            )
        )
    w = Window.partitionBy("from_state")
    n_states = F.count(F.lit(1)).over(w)
    denom = F.sum("n").over(w) + F.lit(laplace) * n_states
    return counts.withColumn(
        "prob", (F.col("n") + F.lit(laplace)) / denom
    )


def sequence_logprob(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    transitions: DataFrame,
) -> DataFrame:
    """(key, n_transitions, logprob, avg_logprob) — each key's sequence
    log-likelihood under a fitted ``transitions`` frame (from
    :func:`transition_counts`, usually fit on a reference corpus with
    ``laplace`` > 0). ``avg_logprob`` (per transition) is the
    length-normalized anomaly score: unusually-navigating sessions
    score low regardless of length. Transitions absent from the model
    contribute -inf — visible, never skipped."""
    probs = transitions.select("from_state", "to_state", "prob")
    pairs = _pairs(df, key_col, ts_col, state_col)
    scored = pairs.join(
        F.broadcast(probs), ["from_state", "to_state"], "left"
    ).withColumn(
        "lp",
        F.when(F.col("prob").isNotNull(), F.log("prob")).otherwise(
            F.lit(float("-inf"))
        ),
    )
    return scored.groupBy(F.col("key")).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum("lp").alias("logprob"),
        (F.sum("lp") / F.count(F.lit(1))).alias("avg_logprob"),
    )


def top_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """(path, n_occurrences, n_keys, rank) — the ``k`` most common
    length-``n`` state paths (consecutive-event n-grams within a key),
    the "what do sessions actually do" drill-down behind the
    transition matrix. Deterministic: ties rank by path ASC.

    Native lead-chain: n−1 ``lead`` columns over one per-key window
    (no per-key list materialization), then a partial-aggregable
    count over the path string — shuffle rows are (path, key) pairs.
    """
    if n < 2:
        raise ValueError(f"n must be ≥ 2 (got {n})")
    if k < 1:
        raise ValueError(f"k must be ≥ 1 (got {k})")
    w = Window.partitionBy("key").orderBy(F.asc("ts"), F.asc("s0"))
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(state_col).alias("s0"),
    )
    for i in range(1, n):
        base = base.withColumn(f"s{i}", F.lead("s0", i).over(w))
    complete = base.where(F.col(f"s{n - 1}").isNotNull())
    path = F.concat_ws(" > ", *[F.col(f"s{i}") for i in range(n)])
    counted = (
        complete.select("key", path.alias("path"))
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("key").alias("n_keys"),
        )
    )
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, never a single-partition sort of all path rows); the rank
    # window then runs over ≤ k rows
    topk = counted.orderBy(F.desc("n_occurrences"), F.asc("path")).limit(k)
    wr = Window.orderBy(F.desc("n_occurrences"), F.asc("path"))
    return topk.withColumn("rank", F.row_number().over(wr)).orderBy("rank")
