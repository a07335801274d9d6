"""Binary-quantization ANN tests: bit-exact numpy parity for packing
and Hamming distance, geometric invariants, recall floor of the
shortlist→rerank pipeline vs exact brute force, and the
candidate-pass column-pruning contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.binary_ann import (
    binarize,
    hamming_knn,
    hamming_knn_rerank,
    pack_bits,
)


def _np_pack(v: np.ndarray) -> list[int]:
    out = []
    for w in range(-(-len(v) // 64)):
        word = 0
        for i in range(min(64, len(v) - w * 64)):
            if v[w * 64 + i] > 0:
                word |= 1 << i
        if word >= 1 << 63:
            word -= 1 << 64
        out.append(word)
    return out


@pytest.mark.parametrize("dim", [7, 64, 100, 128])
def test_binarize_matches_numpy(spark, dim):
    rng = np.random.default_rng(dim)
    vecs = [(i, [float(x) for x in rng.normal(0, 1, dim)]) for i in range(20)]
    df = binarize(
        spark.createDataFrame(vecs, "id bigint, vec array<float>"), "vec", dim
    )
    got = {r.id: list(r.bits) for r in df.collect()}
    for i, v in vecs:
        # float32 storage: pack what Spark actually stored
        stored = np.asarray(v, dtype=np.float32).astype(np.float64)
        assert got[i] == _np_pack(stored) == pack_bits(stored), i


def test_hamming_identities(spark):
    dim = 96
    rng = np.random.default_rng(9)
    base = rng.normal(0, 1, dim)
    base[base == 0] = 0.5
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base]),       # identical → 0
        (2, [float(-x) for x in base]),      # sign-flipped → dim
    ]
    df = binarize(spark.createDataFrame(rows, "id bigint, vec array<float>"), "vec", dim)
    got = {
        r.id: r["__HAMMING__"]
        for r in hamming_knn(df, "bits", "id", [float(x) for x in base], k=3).collect()
    }
    assert got[0] == 0 and got[1] == 0 and got[2] == dim


def test_rerank_recall_floor_vs_exact(spark, embeddings):
    """On the real embeddings table: hamming top-100 → exact rerank
    top-10 must recover most of the exact brute-force top-10."""
    dim = len(embeddings.head().embedding)
    emb = binarize(embeddings.select("vec_id", "embedding"), "embedding", dim)
    target = [float(x) for x in embeddings.head().embedding]

    from fenix_spark.functions.metrics import distance, query_literal

    exact = [
        r.vec_id
        for r in embeddings.select(
            "vec_id",
            (F.round(
                distance("cosine", F.col("embedding").cast("array<double>"), query_literal(target)), 6
            ) + F.lit(0.0)).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    got = [
        r.vec_id
        for r in hamming_knn_rerank(
            emb, "bits", "embedding", "vec_id", target, k=10, shortlist=100
        ).collect()
    ]
    overlap = len(set(exact) & set(got))
    assert overlap >= 6, (overlap, exact, got)
    # the query's own vector must be rank 1 either way
    assert got[0] == exact[0]


def test_candidate_pass_reads_only_packed_column(spark, embeddings, tmp_path):
    """Write (id, bits, embedding) to parquet; the hamming scan must
    prune the float vector column entirely."""
    from fenix_spark.plans import read_schema_columns

    dim = len(embeddings.head().embedding)
    path = str(tmp_path / "bits")
    binarize(embeddings.select("vec_id", "embedding"), "embedding", dim).write.parquet(path)
    stored = spark.read.parquet(path)
    target = [0.1] * dim
    scan_cols = read_schema_columns(hamming_knn(stored, "bits", "vec_id", target, k=5))
    assert scan_cols and all(cols <= {"vec_id", "bits"} for cols in scan_cols)


def test_knn_deterministic_and_k_respected(spark, embeddings):
    dim = len(embeddings.head().embedding)
    emb = binarize(embeddings.select("vec_id", "embedding"), "embedding", dim)
    target = [0.05] * dim
    a = [(r.vec_id, r["__HAMMING__"]) for r in hamming_knn(emb, "bits", "vec_id", target, k=7).collect()]
    b = [(r.vec_id, r["__HAMMING__"]) for r in hamming_knn(emb.repartition(9), "bits", "vec_id", target, k=7).collect()]
    assert a == b and len(a) == 7
