"""Fuzzy string matching via deletion neighborhoods (SymSpell family)
— approximate joins on names/codes/terms without a cartesian product.

Candidate rule: two strings within Damerau/Levenshtein distance ``d``
share at least one common variant obtainable by deleting ≤ d
characters from each (Garbe's SymSpell observation; for d=1 this is
exact — a substitution pair shares the variant with the differing
position deleted, an insert/delete pair satisfies b ∈ del¹(a)).
So the join is:

1. per row, generate the deletion neighborhood (≤ d deletions) as a
   NATIVE array expression — no Python;
2. equi-join the exploded (variant → id) postings of both sides — the
   ONLY shuffle, keyed by variant strings;
3. verify candidates exactly with the built-in ``levenshtein`` and
   drop false positives.

Recall is EXACT for d ≤ 2 relative to standard Levenshtein distance
(property-tested against the brute-force cross join on random vocab);
precision is exact by construction (step 3).

Scale notes: neighborhood size is C(len, ≤d) per string — ~L variants
at d=1, ~L²/2 at d=2; generated values are substrings (short), and
the explode is map-side. Variant-key skew (many short strings sharing
a variant) behaves like any hot equi-join key: AQE skew-split applies.
Cap input length (``max_len``) so d=2 neighborhoods stay bounded —
over-cap rows ERROR rather than silently degrade recall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(c: Column, max_deletes: int) -> Column:
    """All strings obtained from ``c`` by deleting 0..``max_deletes``
    characters, distinct, as a native array expression."""
    if max_deletes not in (0, 1, 2):
        raise ValueError("max_deletes must be 0, 1, or 2")
    n = F.length(c)
    one = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            F.substring(c, F.lit(1), (i - 1).cast("int")),
            c.substr(i + 1, n),
        ),
    )
    variants = F.array(c)
    if max_deletes >= 1:
        variants = F.when(n >= 1, F.concat(variants, one)).otherwise(variants)
    if max_deletes >= 2:
        # 2-deletions = all 1-deletions of every 1-deletion; distinct
        # below collapses the double-counted orderings
        two = F.flatten(
            F.transform(
                one,
                lambda s: F.transform(
                    F.sequence(F.lit(1), F.length(s)),
                    lambda j: F.concat(
                        F.substring(s, F.lit(1), (j - 1).cast("int")),
                        s.substr(j + 1, F.length(s)),
                    ),
                ),
            )
        )
        variants = F.when(n >= 2, F.concat(variants, two)).otherwise(variants)
    return F.array_distinct(variants)


def _postings(df: DataFrame, col: str, id_col: str, d: int, max_len: int) -> DataFrame:
    from fenix_spark.operators.dedup import spread

    over = df.where(F.length(F.col(col)) > max_len)
    if over.head(1):
        raise ValueError(
            f"fuzzy join input exceeds max_len={max_len}; raise max_len "
            "(neighborhood cost grows ~len^deletes) or pre-truncate"
        )
    # two-step projection: in Spark 4, a select() that defines an alias
    # ("s") while a SIBLING expression in the same select references a
    # column of the same lineage can resolve the sibling against the
    # lateral alias instead of the input (lateral column alias takes
    # precedence over the child's output), changing semantics — so
    # define the alias in one select and consume it in the next.
    base = spread(df).select(F.col(id_col).alias("id"), F.col(col).alias("s"))
    return base.select(
        "id", "s", F.explode(deletion_variants(F.col("s"), d)).alias("v")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    id_left: str,
    id_right: str,
    max_dist: int = 1,
    max_len: int = 64,
) -> DataFrame:
    """(id_l, s_l, id_r, s_r, dist) — all cross pairs with
    ``levenshtein(s_l, s_r) ≤ max_dist``, found via the deletion-
    neighborhood equi-join (module docstring), never a cartesian."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    l = _postings(left, on, id_left, max_dist, max_len).select(
        F.col("id").alias("id_l"), F.col("s").alias("s_l"), "v"
    )
    r = _postings(right, on, id_right, max_dist, max_len).select(
        F.col("id").alias("id_r"), F.col("s").alias("s_r"), "v"
    )
    return (
        l.join(r, "v")
        .select("id_l", "s_l", "id_r", "s_r")
        .distinct()
        .withColumn("dist", F.levenshtein("s_l", "s_r"))
        .where(F.col("dist") <= max_dist)
    )


def fuzzy_self_pairs(
    df: DataFrame, on: str, id_col: str, max_dist: int = 1, max_len: int = 64
) -> DataFrame:
    """Within-table near-identical strings (id_l < id_r) — the typo /
    variant-spelling dedup primitive."""
    out = fuzzy_join(df, df, on, id_col, id_col, max_dist, max_len)
    return out.where(F.col("id_l") < F.col("id_r"))
