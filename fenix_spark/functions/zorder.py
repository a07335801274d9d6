"""Z-order (Morton) clustering keys — multi-column file pruning.

Sorting a table by ONE column makes parquet min/max stats selective
for that column only; predicates on any other column still scan every
file. Interleaving the bits of several columns' normalized buckets
into one Morton key and sorting by it gives every participating
column locality at once — each file's min/max range covers a small
hyper-rectangle, so a predicate on ANY of the z-ordered columns skips
most files. The standard lakehouse `OPTIMIZE ZORDER BY` mechanic,
built from native expressions.

Scale design: normalization needs only a per-column (min, max) — ONE
aggregate job collecting 2·n scalars — and the bucket + interleave is
a pure shift/or expression inside whole-stage codegen: adding the key
to 100 TB is scan-speed with zero extra shuffle (the rewrite's own
`repartitionByRange(__zkey)` is the sanctioned one). Equi-width
buckets are deliberate: they cost nothing at any scale and pruning
only degrades for pathological value skew — for that case pass
``bucket_exprs`` with your own quantile-based bucketing (e.g. from
``approxQuantile`` splits) and the interleave stays the same.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: Sequence[Column], bits: int = 10) -> Column:
    """Morton key from ``len(cols)`` non-negative int columns already
    bounded by 2^bits: bit j of column i lands at position
    j·n_cols + i. Pure expression; n_cols·bits must stay ≤ 63."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    key = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + i))
    return key


def zorder_key(
    df: DataFrame,
    columns: Sequence[str],
    bits: int = 10,
    out_col: str = "__zkey",
    bucket_exprs: Sequence[Column] | None = None,
) -> DataFrame:
    """Append a Morton key over numeric ``columns``: each value maps
    to an equi-width bucket in [0, 2^bits) from the column's (min,
    max) — one tiny aggregate job — then bucket ids interleave.
    Constant and null values land in bucket 0."""
    import math

    hi = (1 << bits) - 1
    if bucket_exprs is None:
        # NaN-safe stats: Spark's max() treats NaN as greatest, so one
        # NaN row would make top=NaN and silently collapse the whole
        # column to bucket 0 (no locality, no error). Filter non-finite
        # values out of the stats and send them to bucket 0 per-row.
        def _finite(c: str) -> Column:
            d = F.col(c).cast("double")
            return F.when(~F.isnan(d), d)

        stats = df.agg(
            *[F.min(_finite(c)).alias(f"lo_{c}") for c in columns],
            *[F.max(_finite(c)).alias(f"hi_{c}") for c in columns],
        ).first()
        bucket_exprs = []
        for c in columns:
            lo, top = stats[f"lo_{c}"], stats[f"hi_{c}"]
            if (
                lo is None
                or top is None
                or not math.isfinite(lo)
                or not math.isfinite(top)
                or top <= lo
            ):
                bucket_exprs.append(F.lit(0))
                continue
            scaled = F.nanvl(
                (F.col(c).cast("double") - F.lit(lo)) / F.lit(top - lo) * F.lit(hi),
                F.lit(0.0),
            )
            bucket_exprs.append(
                F.coalesce(
                    F.greatest(F.lit(0), F.least(F.lit(hi), F.floor(scaled))),
                    F.lit(0),
                )
            )
    return df.withColumn(out_col, interleave_bits(list(bucket_exprs), bits))
