"""Exact set-similarity join via prefix filtering — all pairs with
Jaccard ≥ τ, NO all-pairs comparison, NO approximation.

The MinHash path (operators/dedup.py) is probabilistic: band geometry
trades recall for cost. This is the EXACT counterpart (SSJoin,
Chaudhuri-Ganti-Kaushik ICDE'06; prefix filtering as in PPJoin, Xiao
et al. WWW'08): order every set's tokens by ascending global
frequency (rarest first) and keep only each set's PREFIX — the first
|s| − ⌈τ·|s|⌉ + 1 tokens. Theorem (completeness): two sets with
J(a,b) ≥ τ must share at least one prefix token, because missing all
of a's prefix leaves fewer than ⌈τ·|a|⌉ shared tokens, and
J ≥ τ ⇒ |a∩b| ≥ τ·|a∪b| ≥ τ·|a|. So an equi-join on prefix tokens
finds every qualifying pair; an exact native verify
(array_intersect/array_union) removes false candidates. Recall is
PROVEN, not tuned — pinned against brute-force all-pairs in tests.

Scale shape:

- The only data-sized shuffles carry (token, id) PREFIX rows — a
  τ-controlled fraction of set sizes (τ=0.8 ⇒ ~20% of tokens), and
  the rarest-first ordering makes the join buckets the SMALLEST
  buckets in the corpus by construction (a token appearing twice
  creates one candidate; stopwords never enter a prefix unless a set
  is nearly all stopwords).
- The frequency table is (token, count) — partial-aggregated; the
  rank join is keyed, never broadcast (vocabulary can exceed driver
  memory at 100 TB).
- Candidate pairs get a size cross-check (τ·|a| ≤ |b|) inside the
  join, then ONE exact verify join back to the deduplicated token
  arrays. Every join is equi-keyed; a plan contract pins no
  cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fp guard: tau*n computed in doubles can land a hair ABOVE the exact
# rational (0.8*5 = 4.000000000000000222…), which would inflate the
# ceil, SHRINK the prefix, and silently drop true pairs — the one
# failure mode an exact join must never have. Subtracting EPS before
# ceil / comparing with +EPS keeps every boundary case inside.
_EPS = 1e-9


def jaccard_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    tau: float,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) with Jaccard(tokens_a,
    tokens_b) ≥ tau, exactly. ``tokens_col`` is an array column (sets
    are formed with array_distinct; empty/null sets never pair).
    Output: (id_a, id_b, jaccard double, rounded 6dp)."""
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    sets = (
        df.select(
            F.col(id_col).cast("string").alias("sid"),
            F.array_sort(F.array_distinct(F.col(tokens_col))).alias("toks"),
        )
        .where(F.size("toks") > 0)
        .dropDuplicates(["sid"])
    )
    toks = sets.select(
        "sid", F.size("toks").alias("sz"), F.explode("toks").alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    # rarest-first global order; (freq, tok) is a total order so every
    # row of every set agrees on it (determinism)
    ranked = toks.join(freq, "tok").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("sid").orderBy("freq", "tok")
        ),
    )
    # prefix length: sz - ceil(tau*sz) + 1
    prefix = ranked.where(
        F.col("rn")
        <= F.col("sz")
        - F.ceil(F.lit(tau) * F.col("sz") - F.lit(_EPS))
        + 1
    ).select("tok", "sid", "sz")
    a = prefix.select(
        F.col("tok"),
        F.col("sid").alias("id_a"),
        F.col("sz").alias("sz_a"),
    )
    b = prefix.select(
        F.col("tok"),
        F.col("sid").alias("id_b"),
        F.col("sz").alias("sz_b"),
    )
    cands = (
        a.join(b, "tok")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # size filter: J >= tau forces tau*|a| <= |b| <= |a|/tau
            & (F.col("sz_b") * F.lit(tau) <= F.col("sz_a") + F.lit(_EPS))
            & (F.col("sz_a") * F.lit(tau) <= F.col("sz_b") + F.lit(_EPS))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(F.col("sid").alias("id_a"), F.col("toks").alias("ta"))
    sb = sets.select(F.col("sid").alias("id_b"), F.col("toks").alias("tb"))
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("ta", "tb"))
            / F.size(F.array_union("ta", "tb")),
        )
        .where(F.col("jaccard") >= tau)
    )
    return verified.select(
        "id_a", "id_b", (F.round("jaccard", 6) + F.lit(0.0)).alias("jaccard")
    )


def jaccard_join_brute(
    df: DataFrame, id_col: str, tokens_col: str, tau: float
) -> DataFrame:
    """The O(n²) reference implementation (testing/small data only):
    same contract, via a full self-join."""
    sets = (
        df.select(
            F.col(id_col).cast("string").alias("sid"),
            F.array_sort(F.array_distinct(F.col(tokens_col))).alias("toks"),
        )
        .where(F.size("toks") > 0)
        .dropDuplicates(["sid"])
    )
    a = sets.select(F.col("sid").alias("id_a"), F.col("toks").alias("ta"))
    b = sets.select(F.col("sid").alias("id_b"), F.col("toks").alias("tb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("ta", "tb"))
            / F.size(F.array_union("ta", "tb")),
        )
        .where(F.col("jaccard") >= F.lit(tau))
        .select(
            "id_a", "id_b", (F.round("jaccard", 6) + F.lit(0.0)).alias("jaccard")
        )
    )
