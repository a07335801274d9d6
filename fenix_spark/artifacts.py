"""Idempotent per-SF index artifacts for the oracle-checked suite.

The coding (centroid table) and the indexed embeddings table are
materialized once per scale factor under ``<repo>/_artifacts/<sf>/``
using the catalog layout (catalog.py). Both are plain parquet so the
DuckDB oracle reads the exact same bytes Spark does — that makes code
assignment and probe search independently checkable queries instead of
trust-me internals.

Artifacts are committed for sf0.01 so correctness runs don't depend on
KMeans retraining determinism across environments; any missing SF is
(re)built on first use with fixed seeds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from fenix_spark import catalog
from fenix_spark.operators.coder import CodingConfig, train_coding
from fenix_spark.operators.index import build_index

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODING_NAME = "pq_l2_k8_n2"
DEFAULT_CONFIG = CodingConfig(metric="l2", codebook_size=8, num_codebooks=2, seed=42)


def artifact_root(sf_dir: str) -> str:
    return os.path.join(REPO_ROOT, "_artifacts", os.path.basename(os.path.normpath(sf_dir)))


def coding_path(sf_dir: str) -> str:
    return catalog.coding_path(artifact_root(sf_dir), CODING_NAME)


def index_dir(sf_dir: str) -> str:
    return catalog.index_path(artifact_root(sf_dir), "embeddings", "embedding", CODING_NAME)


def _complete(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "_SUCCESS"))


def ensure_artifacts(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Return (coding, indexed_embeddings), building them if absent."""
    cpath, ipath = coding_path(sf_dir), index_dir(sf_dir)
    if not _complete(cpath):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        coding = train_coding(emb, "embedding", DEFAULT_CONFIG)
        coding.coalesce(1).write.mode("overwrite").parquet(cpath)
    coding = spark.read.parquet(cpath)
    if not _complete(ipath):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        build_index(emb, "embedding", coding, ipath)
    return coding, spark.read.parquet(ipath)
