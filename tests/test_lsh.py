"""SRP-LSH bucketed ANN (operators/lsh.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fenix_spark.operators.lsh import (
    lsh_ann_search,
    probe_buckets,
    srp_bucket_expr,
    srp_bucket_of,
    srp_planes,
)
from fenix_spark.operators.search import knn

NBITS = 8


def test_planes_deterministic():
    a, b = srp_planes(64, NBITS, seed=7), srp_planes(64, NBITS, seed=7)
    assert np.array_equal(a, b)
    assert a.shape == (NBITS, 64)


def test_bucket_expr_matches_driver_rule(spark, embeddings):
    planes = srp_planes(64, NBITS)
    got = {
        r["vec_id"]: r["b"]
        for r in embeddings.select(
            "vec_id", srp_bucket_expr("embedding", planes).alias("b")
        ).collect()
    }
    for r in embeddings.limit(50).collect():
        assert got[r["vec_id"]] == srp_bucket_of(r["embedding"], planes)


def test_probe_buckets_hamming():
    probes = probe_buckets(0b1010, NBITS, radius=2)
    assert len(probes) == 1 + 8 + 28  # C(8,0)+C(8,1)+C(8,2)
    assert len(set(probes)) == len(probes)
    for p in probes:
        assert bin(p ^ 0b1010).count("1") <= 2


def test_search_subset_of_brute_force_with_floor_recall(spark, embeddings):
    """LSH results are a subset of the candidate set; recall@10 must
    beat the random-scan baseline (scan fraction ~14% at radius 2)."""
    planes = srp_planes(64, NBITS)
    rows = embeddings.orderBy("vec_id").limit(10).collect()
    hits = 0
    for r in rows:
        t = r["embedding"]
        exact = {
            x["vec_id"]
            for x in knn(embeddings, "embedding", t, "cosine", k=10, id_col="vec_id").collect()
        }
        approx = {
            x["vec_id"]
            for x in lsh_ann_search(
                embeddings, "embedding", t, planes, k=10, radius=2, id_col="vec_id"
            ).collect()
        }
        assert len(approx) <= 10
        hits += len(exact & approx)
    assert hits / (10 * len(rows)) >= 0.2  # ≥1.4× the 14% random baseline


def test_radius_zero_scans_one_bucket(spark, embeddings):
    planes = srp_planes(64, NBITS)
    t = embeddings.where(F.col("vec_id") == 3).head()["embedding"]
    out = lsh_ann_search(embeddings, "embedding", t, planes, k=100, radius=0)
    b = srp_bucket_of(t, planes)
    cand = embeddings.where(srp_bucket_expr("embedding", planes) == b).count()
    assert out.count() == min(100, cand)


def test_materialized_bucket_column(spark, embeddings, tmp_path):
    """Ingest-time bucket column (the partition-pruning layout) must
    give identical results to scan-time bucketing."""
    planes = srp_planes(64, NBITS)
    path = str(tmp_path / "lsh_idx")
    embeddings.withColumn("__LSH_BUCKET__", srp_bucket_expr("embedding", planes)).write.partitionBy(
        "__LSH_BUCKET__"
    ).parquet(path)
    indexed = spark.read.parquet(path)
    t = embeddings.where(F.col("vec_id") == 5).head()["embedding"]
    a = lsh_ann_search(embeddings, "embedding", t, planes, k=10, radius=1, id_col="vec_id")
    b = lsh_ann_search(
        indexed, "embedding", t, planes, k=10, radius=1, id_col="vec_id",
        bucket_col="__LSH_BUCKET__",
    )
    assert [r["vec_id"] for r in a.collect()] == [r["vec_id"] for r in b.collect()]
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "__LSH_BUCKET__" in plan.split("PartitionFilters:")[1].split("]")[0]


def test_probe_all_buckets_equals_brute_force(spark, embeddings):
    """Exact-search degeneration (VERDICT r03 #6): probing every bucket
    (radius = nbits) must return EXACTLY the brute-force top-k — the
    LSH pruning is a candidate filter, never a scoring change. The
    IVF analog is test_index.py::test_probe_all_cells_equals_brute_force."""
    planes = srp_planes(64, NBITS)
    for qid in (0, 7):
        t = embeddings.where(F.col("vec_id") == qid).head()["embedding"]
        exact = [
            r["vec_id"]
            for r in knn(
                embeddings, "embedding", t, "cosine", k=10, id_col="vec_id"
            ).collect()
        ]
        full = [
            r["vec_id"]
            for r in lsh_ann_search(
                embeddings, "embedding", t, planes, k=10, radius=NBITS, id_col="vec_id"
            ).collect()
        ]
        assert full == exact
