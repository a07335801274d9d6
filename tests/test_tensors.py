"""Tests for functions/tensors.py — the Spark re-expression of the
reference's Arrow extension types (src/fenix/ex/arrow/): shape
metadata, quint8 affine quantization, nested-tensor structs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fenix_spark.functions.tensors import (
    choose_qparams,
    dequantize,
    nested_field,
    nested_schema,
    nested_struct,
    qparams_of,
    quantize,
    shape_of,
    validate_fixed_size,
    with_qparams,
    with_shape,
)


def test_quantize_roundtrip_error_bounded_by_half_step(spark, embeddings):
    v = F.col("embedding").cast("array<double>")
    scale, shift = choose_qparams(v)
    df = embeddings.select(v.alias("v"), scale.alias("scale"), shift.alias("shift"))
    deq = dequantize(quantize(F.col("v"), F.col("scale"), F.col("shift")),
                     F.col("scale"), F.col("shift"))
    err = F.array_max(F.zip_with(F.col("v"), deq, lambda a, b: F.abs(a - b)))
    bad = df.where(err > F.col("scale") * 0.5 + 1e-12).count()
    assert bad == 0


def test_quantize_values_in_uint8_range(spark, embeddings):
    v = F.col("embedding").cast("array<double>")
    scale, shift = choose_qparams(v)
    q = quantize(v, scale, shift)
    row = embeddings.select(
        F.min(F.array_min(q)).alias("lo"), F.max(F.array_max(q)).alias("hi")
    ).head()
    assert 0 <= row.lo and row.hi <= 255


def test_constant_vector_stays_constant_within_half_step(spark):
    """Constant vectors degenerate to scale=1: every element maps to
    the same code, reconstruction error ≤ half a quantization step
    (affine uint8 can't represent arbitrary constants exactly — same
    bound as the reference's torch dynamic quantization)."""
    df = spark.createDataFrame([([3.25] * 8,)], "v array<double>")
    scale, shift = choose_qparams(F.col("v"))
    deq = dequantize(quantize(F.col("v"), scale, shift), scale, shift)
    out = df.select(deq.alias("d")).head().d
    assert len(set(out)) == 1
    assert abs(out[0] - 3.25) <= 0.5


def test_shape_and_qparams_metadata_survive_parquet(spark, tmp_path):
    df = spark.createDataFrame([([1.0, 2.0, 3.0, 4.0],)], "t array<double>")
    df = with_shape(df, "t", [2, 2])
    df = with_qparams(df, "t", 0.05, 12)
    path = str(tmp_path / "tensor.parquet")
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert shape_of(back, "t") == [2, 2]
    assert qparams_of(back, "t") == (0.05, 12)
    assert shape_of(back, "t") is not None


def test_dequantize_cold_reopen_from_footer_metadata_alone(spark, tmp_path):
    """The quint8 storage contract end-to-end (ref: ex/arrow/quint8/
    quint8.py:52-87 stores scale/shift in the extension type and
    reconstructs on read): write QUANTIZED codes + per-column qparams/
    shape metadata, reopen cold, and dequantize using ONLY what the
    parquet footer says — no state carried from the writing session."""
    vals = [([0.5, 1.0, -2.0, 3.75],), ([10.0, -10.0, 0.0, 0.25],)]
    df = spark.createDataFrame(vals, "v array<double>")
    # static per-column params (scale=0.1, shift=100 covers [-10, 15.5])
    q = df.select(quantize(F.col("v"), F.lit(0.1), F.lit(100)).alias("q"))
    q = with_qparams(q, "q", 0.1, 100)
    q = with_shape(q, "q", [4])
    path = str(tmp_path / "quant.parquet")
    q.write.mode("overwrite").parquet(path)

    back = spark.read.parquet(path)  # cold: only footer metadata
    scale, shift = qparams_of(back, "q")
    assert (scale, shift) == (0.1, 100)
    assert shape_of(back, "q") == [4]
    deq = back.select(
        dequantize(F.col("q"), F.lit(scale), F.lit(shift)).alias("d")
    ).collect()
    flat_in = [x for row in vals for x in row[0]]
    flat_out = [x for r in deq for x in r.d]
    assert len(flat_in) == len(flat_out)
    for a, b in zip(sorted(flat_in), sorted(flat_out)):
        assert abs(a - b) <= scale * 0.5 + 1e-12


def test_validate_fixed_size(spark):
    good = spark.createDataFrame([([1.0, 2.0],), ([3.0, 4.0],)], "v array<double>")
    validate_fixed_size(good, "v", 2)
    bad = spark.createDataFrame([([1.0, 2.0],), ([3.0],)], "v array<double>")
    with pytest.raises(ValueError, match="fixed_size_list"):
        validate_fixed_size(bad, "v", 2)


def test_nested_struct_path_access(spark):
    df = spark.createDataFrame([([1.0, 2.0], [3.0])], "a array<double>, b array<double>")
    nested = df.select(
        nested_struct(
            image=nested_struct(pixels=F.col("a")), audio=F.col("b")
        ).alias("t")
    )
    got = nested.select(nested_field("t", "image.pixels").alias("p")).head().p
    assert got == [1.0, 2.0]
    schema = nested_schema(T.DoubleType(), {"image": {"pixels": None}, "audio": None})
    assert schema["image"].dataType["pixels"].dataType == T.ArrayType(T.DoubleType())
    assert schema["audio"].dataType == T.ArrayType(T.DoubleType())


def test_metadata_survives_foreign_reader_roundtrip(spark, tmp_path):
    """VERDICT r03 note: the shape/qparams column metadata must survive
    a write → FOREIGN read/rewrite → read cycle. Spark stores field
    metadata in the parquet footer's Spark-schema key; a foreign tool
    (pyarrow here) that preserves schema metadata when rewriting must
    not strip it — and our helpers must still decode it afterwards."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fenix_spark.functions.tensors import (
        qparams_of,
        shape_of,
        with_qparams,
        with_shape,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "id bigint, t array<double>"
    )
    df = with_shape(df, "t", [2, 2])
    df = with_qparams(df, "t", 0.5, 3)
    p1 = str(tmp_path / "a")
    df.coalesce(1).write.parquet(p1)

    # Foreign read: the Spark schema (with field metadata) rides in
    # arrow schema metadata under org.apache.spark.sql.parquet.row.metadata
    tbl = pq.read_table(p1)
    keys = {k.decode(): v for k, v in (tbl.schema.metadata or {}).items()}
    spark_key = "org.apache.spark.sql.parquet.row.metadata"
    assert spark_key in keys
    assert b"tensor_shape" in keys[spark_key]

    # Foreign REWRITE preserving schema metadata, then Spark re-read
    p2 = str(tmp_path / "b" / "part-0.parquet")
    import os

    os.makedirs(os.path.dirname(p2))
    pq.write_table(tbl, p2)
    back = spark.read.parquet(os.path.dirname(p2))
    assert shape_of(back, "t") == [2, 2]
    assert qparams_of(back, "t") == (0.5, 3)
