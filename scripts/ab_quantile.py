"""A/B/C the quantile_normalize CDF evaluation forms at sf0.1.

VERDICT r13 item 4: the driver measured the r13 conditional fold at
0.76x of the r12 filter-then-sum form and no artifact exonerated it.
This script times the three candidate forms over the IDENTICAL packed
sketch frame, interleaved round-robin so ambient load hits all three
equally, min-of-N reported:

  A (r12): aggregate(filter(__kll, s -> s.item <= x), 0L, (acc,s) -> acc + s.weight)
  B (r13): aggregate(__kll, 0L, (acc,s) -> acc + if(s.item<=x, s.weight, 0L))
  C (new): group-side prefix-sum arrays (__items double[], __cumw bigint[]),
           per row: pos = size(filter(__items, i -> i <= x)); below =
           if(pos>0, __cumw[pos], 0L)  — one cheap double-compare pass per
           row, no struct access, no per-element add chain.

All three produce below = exact integer sum of weights of items <= x,
so rank = below / n is bit-identical across forms.

Usage: python scripts/ab_quantile.py [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fenix_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def build_variants(spark):
    from fenix_spark.operators.sketches import kll_rollup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    keys = ["lang"]

    def packed_structs():
        state = kll_rollup(docs, keys, "n_chars", 1024)
        return state.groupBy(*keys).agg(
            F.sort_array(F.collect_list(F.struct("item", "weight"))).alias("__kll"),
            F.sum("weight").alias("__kll_n"),
        )

    x = F.col("n_chars").cast("double")

    def variant_a():
        packed = packed_structs()
        joined = docs.join(F.broadcast(packed), keys, "left")
        below = F.aggregate(
            F.filter("__kll", lambda s: s["item"] <= x),
            F.lit(0).cast("bigint"),
            lambda acc, s: acc + s["weight"],
        )
        rank = F.when(x.isNotNull() & F.col("__kll_n").isNotNull(), below / F.col("__kll_n"))
        return joined.withColumn("pct_rank", rank).drop("__kll", "__kll_n")

    def variant_b():
        packed = packed_structs()
        joined = docs.join(F.broadcast(packed), keys, "left")
        below = F.aggregate(
            F.col("__kll"),
            F.lit(0).cast("bigint"),
            lambda acc, s: acc
            + F.when(s["item"] <= x, s["weight"]).otherwise(F.lit(0).cast("bigint")),
        )
        rank = F.when(x.isNotNull() & F.col("__kll_n").isNotNull(), below / F.col("__kll_n"))
        return joined.withColumn("pct_rank", rank).drop("__kll", "__kll_n")

    def variant_c():
        packed = packed_structs().select(
            *keys,
            F.transform("__kll", lambda s: s["item"]).alias("__items"),
            F.expr(
                "aggregate(__kll, struct(cast(array() as array<bigint>) as c, 0L as run),"
                " (acc, s) -> struct(concat(acc.c, array(acc.run + s.weight)) as c,"
                " acc.run + s.weight as run), acc -> acc.c)"
            ).alias("__cumw"),
            F.col("__kll_n"),
        )
        joined = docs.join(F.broadcast(packed), keys, "left")
        pos = F.size(F.filter("__items", lambda i: i <= x))
        below = F.when(pos > 0, F.element_at("__cumw", pos)).otherwise(
            F.lit(0).cast("bigint")
        )
        rank = F.when(x.isNotNull() & F.col("__kll_n").isNotNull(), below / F.col("__kll_n"))
        return joined.withColumn("pct_rank", rank).drop(
            "__items", "__cumw", "__kll_n"
        )

    return {"A_filter_sum": variant_a, "B_fold": variant_b, "C_cdf_lookup": variant_c}


def main() -> None:
    spark = get_session("ab_quantile")
    spark.sparkContext.setLogLevel("ERROR")
    variants = build_variants(spark)

    # value-equality check first: all three must agree row-for-row
    frames = {k: v().orderBy("doc_id") for k, v in variants.items()}
    rows = {k: f.collect() for k, f in frames.items()}
    base = rows["A_filter_sum"]
    for k, r in rows.items():
        assert r == base, f"variant {k} differs from A"
    print(f"value check: all variants identical on {len(base)} rows")

    # warm-up one run each, then interleave
    for v in variants.values():
        v().write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(ROUNDS):
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k}: min={min(ts):.3f}s runs={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
