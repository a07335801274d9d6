"""Fuzzy-join tests: exact recall/precision vs the brute-force cross
join (the ground truth the deletion-neighborhood join must reproduce),
variant-generation unit checks, and plan/contract invariants."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_join,
    fuzzy_self_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _vocab(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    base = ["spark", "sprk", "spork", "shark", "spa", "park", "a", "ab", ""]
    out = set(base)
    while len(out) < n:
        w = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 6)))
        out.add(w)
    return sorted(out)


def test_deletion_variants_unit(spark):
    df = spark.createDataFrame([("abc",), ("a",), ("",)], "s string")
    rows = {
        r.s: set(r.v)
        for r in df.select("s", deletion_variants(F.col("s"), 1).alias("v")).collect()
    }
    assert rows["abc"] == {"abc", "bc", "ac", "ab"}
    assert rows["a"] == {"a", ""}
    assert rows[""] == {""}
    rows2 = {
        r.s: set(r.v)
        for r in df.select("s", deletion_variants(F.col("s"), 2).alias("v")).collect()
    }
    assert rows2["abc"] == {"abc", "bc", "ac", "ab", "a", "b", "c"}


@pytest.mark.parametrize("d", [1, 2])
def test_matches_brute_force_exactly(spark, d):
    vocab = _vocab(7, 60)
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(vocab)], "id bigint, s string"
    ).repartition(4)
    got = {
        (r.id_l, r.id_r, r.dist)
        for r in fuzzy_self_pairs(df, "s", "id", max_dist=d).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(vocab), 2)
        if _lev(a, b) <= d
    }
    assert got == want  # exact recall AND precision


def test_two_sided_join(spark):
    left = spark.createDataFrame(
        [(1, "tables"), (2, "spark")], "lid bigint, name string"
    )
    right = spark.createDataFrame(
        [(10, "table"), (11, "sparc"), (12, "python")], "rid bigint, name string"
    )
    got = {
        (r.id_l, r.id_r): r.dist
        for r in fuzzy_join(left, right, "name", "lid", "rid", max_dist=1).collect()
    }
    assert got == {(1, 10): 1, (2, 11): 1}


def test_max_len_contract_is_loud(spark):
    df = spark.createDataFrame([(1, "x" * 100)], "id bigint, s string")
    with pytest.raises(ValueError, match="max_len"):
        fuzzy_self_pairs(df, "s", "id", max_dist=1, max_len=64).collect()


def test_plan_is_equi_join_not_cartesian(spark):
    df = spark.createDataFrame([(i, w) for i, w in enumerate(_vocab(3, 30))], "id bigint, s string")
    plan = (
        fuzzy_self_pairs(df, "s", "id")._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
