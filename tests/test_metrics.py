"""Metric semantics vs numpy ground truth — fenix conventions exactly
(0.5-0.5cos for cosine, negated dot; reference coder.py:38-50)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.functions.metrics import METRICS, distance, query_literal, vec_double

RNG = np.random.default_rng(7)
VECS = RNG.normal(size=(20, 8)).astype("float32")
Q = RNG.normal(size=8).astype("float32")


def numpy_distance(metric: str, u: np.ndarray, v: np.ndarray) -> float:
    u64, v64 = u.astype("float64"), v.astype("float64")
    if metric in ("l2", "euclidean"):
        return float(np.linalg.norm(u64 - v64))
    if metric == "cosine":
        return float(0.5 - 0.5 * (u64 @ v64) / (np.linalg.norm(u64) * np.linalg.norm(v64)))
    return float(-(u64 @ v64))


@pytest.mark.parametrize("metric", METRICS)
def test_distance_matches_numpy(spark, metric):
    df = spark.createDataFrame(
        [(i, [float(x) for x in VECS[i]]) for i in range(len(VECS))], "id int, vec array<float>"
    )
    got = {
        r["id"]: r["d"]
        for r in df.select(
            "id", distance(metric, vec_double("vec"), query_literal(Q)).alias("d")
        ).collect()
    }
    for i in range(len(VECS)):
        assert math.isclose(got[i], numpy_distance(metric, VECS[i], Q), rel_tol=1e-6, abs_tol=1e-9)


def test_identical_vector_distances(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "id int, vec array<float>")
    q = [1.0, 2.0, 3.0]
    row = df.select(
        distance("l2", vec_double("vec"), query_literal(q)).alias("l2"),
        distance("cosine", vec_double("vec"), query_literal(q)).alias("cos"),
        distance("dot", vec_double("vec"), query_literal(q)).alias("dot"),
    ).head()
    assert row["l2"] == 0.0
    assert abs(row["cos"]) < 1e-12  # fenix cosine: 0 = identical
    assert row["dot"] == -14.0  # negated dot product


def test_unknown_metric_raises():
    with pytest.raises(ValueError):
        distance("manhattan", F.col("a"), F.col("b"))


def test_lit_double_array_bit_identical(spark):
    """lit_double_array (r13: one F.expr instead of one py4j lit call
    per element) must produce bit-identical doubles to the per-element
    F.lit path — including denormals, -0.0, and full-precision reprs —
    and fall back cleanly for non-finite values."""
    import math
    import struct

    from pyspark.sql import functions as F

    from fenix_spark.functions.metrics import lit_double_array

    vals = [
        0.1, -0.0, 1.5e-307, 4.9e-324, 1e300, 123456789.123456789,
        2 / 3, -math.pi, 1.0, 0.36787944117144233, float(1 << 60),
    ]
    row = (
        spark.range(1)
        .select(
            lit_double_array(vals).alias("a"),
            F.array(*[F.lit(float(v)) for v in vals]).alias("b"),
        )
        .first()
    )
    bits = lambda xs: [struct.pack("<d", x) for x in xs]  # noqa: E731
    assert bits(row["a"]) == bits(row["b"]) == bits([float(v) for v in vals])

    nf = [1.0, float("nan"), float("inf")]
    got = spark.range(1).select(lit_double_array(nf).alias("a")).first()["a"]
    assert got[0] == 1.0 and math.isnan(got[1]) and math.isinf(got[2])


def test_lit_long_array_single_node_and_exact(spark):
    """lit_long_array (r14: one Catalyst Literal node built in O(1)
    py4j round trips for big LUTs — the Bloom-filter fix): values must
    round-trip exactly (including boundary int64s), the plan must NOT
    contain a per-element CreateArray tree, and the rendered fallback
    must agree with the fast path."""
    from pyspark.sql import functions as F

    from fenix_spark.functions.metrics import lit_long_array

    vals = [0, 1, -1, 2**63 - 1, -(2**63), 4294967291] + list(range(200))
    col = lit_long_array(vals)
    got = spark.range(1).select(col.alias("v")).head()["v"]
    assert got == vals
    # single Literal node: the analyzed plan string stays tiny (a
    # 206-element CreateArray tree would render every element)
    plan = spark.range(1).select(col.alias("v"))._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 2000
    # the rendered fallback agrees
    fb = F.expr("cast(array(" + ",".join(f"{v}L" for v in vals) + ") as array<bigint>)")
    assert spark.range(1).select(fb.alias("v")).head()["v"] == vals
