"""Entropy / mutual-information audits: numpy mirrors, the analytic
invariants (independence → 0, bijection → NMI 1, MI = H for a
deterministic function, constant column → 0), null-as-category
semantics, and a DuckDB mirror on the documents table."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from fenix_spark.operators.infotheory import (
    column_entropy,
    mi_matrix,
    mutual_information,
)


def _np_entropy(values):
    _, counts = np.unique(np.asarray(values, dtype=object), return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log(p)).sum())


def _np_mi(a, b):
    a, b = np.asarray(a, dtype=object), np.asarray(b, dtype=object)
    n = len(a)
    mi = 0.0
    for va in set(a.tolist()):
        for vb in set(b.tolist()):
            p_ab = ((a == va) & (b == vb)).sum() / n
            if p_ab == 0:
                continue
            p_a = (a == va).sum() / n
            p_b = (b == vb).sum() / n
            mi += p_ab * math.log(p_ab / (p_a * p_b))
    return mi


def test_column_entropy_matches_numpy(spark):
    rng = np.random.default_rng(3)
    rows = [
        (str(rng.integers(0, 5)), str(rng.integers(0, 2)), "const")
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = {r.column: r for r in column_entropy(df, ["a", "b", "c"]).collect()}
    va, vb = [r[0] for r in rows], [r[1] for r in rows]
    assert got["a"].entropy == pytest.approx(_np_entropy(va))
    assert got["b"].entropy == pytest.approx(_np_entropy(vb))
    assert got["c"].entropy == 0.0 and got["c"].n_distinct == 1
    assert got["a"].n == 500


def test_entropy_null_is_a_category(spark):
    df = spark.createDataFrame(
        [("x",), (None,), ("x",), (None,)], "a string"
    )
    [r] = column_entropy(df, ["a"]).collect()
    assert r.n_distinct == 2
    assert r.entropy == pytest.approx(math.log(2))


def test_mi_matches_numpy_mirror(spark):
    rng = np.random.default_rng(7)
    a = [str(v) for v in rng.integers(0, 4, size=400)]
    # b correlates with a but noisily
    b = [
        x if rng.random() < 0.6 else str(rng.integers(0, 4))
        for x in a
    ]
    df = spark.createDataFrame(list(zip(a, b)), "a string, b string")
    [r] = mutual_information(df, "a", "b").collect()
    assert r.mi == pytest.approx(_np_mi(a, b), abs=1e-9)
    assert r.h_a == pytest.approx(_np_entropy(a))
    assert r.h_b == pytest.approx(_np_entropy(b))
    assert 0 < r.nmi < 1


def test_mi_analytic_invariants(spark):
    # exact independence: every (a, b) combination equally often
    rows = [(str(i), str(j)) for i in range(3) for j in range(4)] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = mutual_information(df, "a", "b").collect()
    assert r.mi == pytest.approx(0.0, abs=1e-12)
    assert r.nmi == pytest.approx(0.0, abs=1e-12)

    # bijection: nmi exactly 1, mi == h_a == h_b
    rows = [(str(i), str(9 - i)) for i in range(8)] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = mutual_information(df, "a", "b").collect()
    assert r.nmi == pytest.approx(1.0)
    assert r.mi == pytest.approx(r.h_a) == pytest.approx(r.h_b)

    # b = f(a), a finer: MI == H(b) (knowing a determines b)
    rows = [(str(i), str(i % 2)) for i in range(6)] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = mutual_information(df, "a", "b").collect()
    assert r.mi == pytest.approx(r.h_b)

    # constant column: everything 0 by definition
    rows = [("k", str(i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = mutual_information(df, "a", "b").collect()
    assert r.mi == pytest.approx(0.0, abs=1e-12) and r.nmi == 0.0


def test_mi_matrix_all_pairs_one_pass(spark):
    rng = np.random.default_rng(1)
    rows = [
        (str(v := rng.integers(0, 3)), str(v), str(rng.integers(0, 3)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = {(r.col_a, r.col_b): r for r in mi_matrix(df, ["a", "b", "c"]).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert got[("a", "b")].nmi == pytest.approx(1.0)  # identical columns
    assert got[("a", "c")].nmi < 0.1  # independent


def test_mi_duckdb_mirror_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    [r] = mutual_information(docs, "lang", "source").collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    [want] = con.execute(
        """
        WITH joint AS (
          SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2
        ),
        t AS (
          SELECT c / sum(c) OVER () AS p_ab,
                 sum(c) OVER (PARTITION BY lang) / sum(c) OVER () AS p_a,
                 sum(c) OVER (PARTITION BY source) / sum(c) OVER () AS p_b
          FROM joint
        )
        SELECT sum(p_ab * ln(p_ab / (p_a * p_b))) FROM t
        """
    ).fetchall()
    assert r.mi == pytest.approx(max(want[0], 0.0), abs=1e-9)
