"""Tensor-type extras: the Spark re-expression of the reference's three
Arrow extension types (src/fenix/ex/arrow/), per SURVEY.md §1.2.

- ``TensorType(dtype, shape)`` (ex/arrow/tensor/tensor.py:10-29) →
  ``array<T>`` column + shape recorded in StructField metadata.
- ``QUInt8TensorType(shape, scale, shift)`` (ex/arrow/quint8/
  quint8.py:23-87) → affine-quantized ``array<smallint>`` (holds the
  uint8 range without sign games) + {scale, shift} either in column
  metadata (per-column params) or as sibling columns (per-row dynamic
  params, the torch dynamic-quantization analog).
- ``NestedTensorType`` (ex/arrow/nested/nested.py) → ``struct`` of
  array columns; path access is native ``col("a.b.c")``.

Quantization math (mirrors quint8.py:23-53 semantics):

    q = clamp(round(x / scale) + shift, 0, 255)      # quantize
    x̂ = scale * (q - shift)                           # dequantize

Rounding uses ``floor(v + 0.5)`` explicitly — identical in Spark and
DuckDB (their ``round()`` builtins disagree on half-to-even vs
half-away), so quantized values are oracle-checkable bit-for-bit.

Scale story: quantization shrinks vector storage 4× (float32→uint8);
at 100 TB that's the difference between scanning 25 TB and 100 TB for
every index build. All expressions are native Catalyst — codegen'd,
zero Python.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def round_half_up(v: Column) -> Column:
    """floor(v + 0.5): the one rounding mode both engines share."""
    return F.floor(v + F.lit(0.5))


def choose_qparams(vec: Column) -> tuple[Column, Column]:
    """Per-row dynamic affine params over the value range (the torch
    dynamic-quantization analog, quint8.py:92-121): scale spans
    [min, max] across 255 steps; shift maps min → 0. Constant vectors
    degenerate to scale=1 (any scale reconstructs exactly)."""
    lo, hi = F.array_min(vec), F.array_max(vec)
    scale = F.when(hi > lo, (hi - lo) / F.lit(255.0)).otherwise(F.lit(1.0))
    shift = -round_half_up(lo / scale)
    return scale, shift


def quantize(vec: Column, scale: Column, shift: Column) -> Column:
    """array<double> → array<smallint> in [0, 255]."""
    q = F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(0),
            F.least(F.lit(255), (round_half_up(x / scale) + shift).cast("int")),
        ).cast("smallint"),
    )
    return q


def dequantize(q: Column, scale: Column, shift: Column) -> Column:
    """array<smallint> → array<double>: scale * (q - shift)."""
    return F.transform(q, lambda v: scale * (v.cast("double") - shift))


def with_shape(df: DataFrame, column: str, shape: list[int]) -> DataFrame:
    """Record a fixed tensor shape in the column's metadata — the Spark
    analog of TensorType's msgpack'd shape (tensor.py:10-29). Survives
    parquet round-trips via the Spark schema footer key."""
    field = df.schema[column]
    meta = dict(field.metadata or {})
    meta["tensor_shape"] = shape
    return df.withMetadata(column, meta)


def shape_of(df: DataFrame, column: str) -> list[int] | None:
    meta = df.schema[column].metadata or {}
    shape = meta.get("tensor_shape")
    return list(shape) if shape is not None else None


def with_qparams(df: DataFrame, column: str, scale: float, shift: int) -> DataFrame:
    """Per-COLUMN quantization params in metadata (the static variant,
    QUInt8TensorType(shape, scale, shift))."""
    field = df.schema[column]
    meta = dict(field.metadata or {})
    meta["quant"] = json.dumps({"scale": scale, "shift": shift})
    return df.withMetadata(column, meta)


def qparams_of(df: DataFrame, column: str) -> tuple[float, int] | None:
    meta = df.schema[column].metadata or {}
    if "quant" not in meta:
        return None
    q = json.loads(meta["quant"])
    return float(q["scale"]), int(q["shift"])


def validate_fixed_size(df: DataFrame, column: str, size: int) -> None:
    """Enforce the fixed_size_list contract Spark's array<T> lacks
    (SURVEY.md §7 risk 5): raises if any row deviates."""
    bad = df.where(
        F.col(column).isNull() | (F.size(F.col(column)) != F.lit(size))
    ).limit(1)
    if bad.count() > 0:
        raise ValueError(
            f"column {column!r} is not a fixed_size_list<{size}>: "
            f"offending row {bad.collect()[0].asDict()}"
        )


def nested_struct(**fields: Column) -> Column:
    """Build a nested-tensor struct column (NestedTensorType analog):
    ``nested_struct(a=..., b=nested_struct(c=...))``."""
    return F.struct(*[c.alias(name) for name, c in fields.items()])


def nested_field(column: str, path: str) -> Column:
    """Path access into a nested-tensor struct — the jmespath analog
    (nested.py:106-122) is just Spark's dotted column resolution."""
    return F.col(f"{column}.{path}")


def nested_schema(dtype: T.DataType, shape_tree: dict) -> T.DataType:
    """StructType mirroring a NestedTensorType shape tree: leaves are
    array<dtype>, interior nodes are structs."""
    if not isinstance(shape_tree, dict):
        return T.ArrayType(dtype)
    return T.StructType(
        [
            T.StructField(k, nested_schema(dtype, v), True)
            for k, v in shape_tree.items()
        ]
    )
