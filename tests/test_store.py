"""Store façade tests: the reference client's verb set end-to-end on
one store — tables, coder, index, probe search vs brute parity, and
listing/dropping."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.coder import CodingConfig
from fenix_spark.store import Store


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store"))
    s = Store(spark, root)
    rng = np.random.default_rng(5)
    rows = [
        (i, rng.normal(size=16).tolist(), int(i % 3)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")
    s.make_table("emb", df)
    return s


def test_table_verbs(store, spark):
    assert store.list_tables() == ["emb"]
    got = store.read_table("emb", filter=F.col("label") == 1, select=("vec_id",))
    assert got.columns == ["vec_id"]
    assert got.count() == sum(1 for i in range(400) if i % 3 == 1)
    # multi-name union-all, like the reference's list ticket
    store.make_table("emb2", store.read_table("emb"))
    assert store.read_table(["emb", "emb2"]).count() == 800
    store.drop_table("emb2")
    assert store.list_tables() == ["emb"]


def test_coder_index_search_lifecycle(store):
    store.make_coder(
        "pq", "emb", "embedding",
        CodingConfig(metric="l2", codebook_size=4, num_codebooks=2, seed=7),
    )
    assert store.list_coders() == ["pq"]
    store.make_index("emb", "embedding", "pq")
    assert store.list_indexes() == [("emb", "embedding", "pq")]

    indexed = store.read_table("emb", coding="pq", column="embedding")
    assert "__CODED_ID__" in indexed.columns
    assert indexed.count() == 400

    target = [0.1] * 16
    brute = [
        r.vec_id
        for r in store.search(
            "emb", "embedding", target, maxval=5, id_col="vec_id"
        ).collect()
    ]
    probed = [
        r.vec_id
        for r in store.search(
            "emb", "embedding", target, maxval=5,
            coding="pq", probes=16, id_col="vec_id",  # all 16 cells = exact
        ).collect()
    ]
    assert brute == probed  # probing every cell degenerates to brute

    store.drop_index("emb", "embedding", "pq")
    assert store.list_indexes() == []
    store.drop_coder("pq")
    assert store.list_coders() == []


def test_read_table_coding_needs_column(store):
    with pytest.raises(ValueError, match="column"):
        store.read_table("emb", coding="pq")


def test_remove(spark, tmp_path):
    import os

    s = Store(spark, str(tmp_path / "victim"))
    s.make_table("t", spark.range(5))
    assert s.list_tables() == ["t"]
    s.remove()
    assert not os.path.isdir(s.root)
