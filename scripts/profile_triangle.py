"""Scratch profiler: where does triangle_counts' time go at sf0.1?

Times each barrier of the suite row separately (edge build, und, deg,
oriented, wedge+closing+counts) plus the end-to-end row, so the r14
optimization targets the real cost, not a guess.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fenix_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_session("profile_triangle")
    spark.sparkContext.setLogLevel("ERROR")

    from fenix_spark.operators.graph import _undirected_simple
    from fenix_spark.suite import SPARK_QUERIES, table

    # warm-up: full row once
    SPARK_QUERIES["triangle_counts"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    t0 = time.perf_counter()
    li = (
        table(spark, SF_DIR, "lineitem")
        .where(F.col("l_quantity") <= 15)
        .select("l_orderkey", "l_partkey")
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = a.join(b, "k").where(F.col("src") < F.col("dst")).select("src", "dst")

    und = _undirected_simple(edges, "src", "dst").localCheckpoint(eager=False)
    n_und = und.count()
    t1 = time.perf_counter()
    print(f"und (edge build + distinct + ckpt): {n_und} edges, {t1 - t0:.2f}s")

    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    n_deg = deg.count()
    t2 = time.perf_counter()
    print(f"deg (union + groupBy + ckpt): {n_deg} nodes, {t2 - t1:.2f}s")

    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    lower_is_a = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("hi"),
            F.when(lower_is_a, F.col("deg_b")).otherwise(F.col("deg_a")).alias("hi_deg"),
        )
        .localCheckpoint(eager=False)
    )
    n_or = oriented.count()
    t3 = time.perf_counter()
    print(f"oriented (2 joins + ckpt): {n_or} edges, {t3 - t2:.2f}s")

    e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("hi_deg").alias("v_deg"))
    e2 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("hi_deg").alias("w_deg"))
    v_below_w = (F.col("v_deg") < F.col("w_deg")) | (
        (F.col("v_deg") == F.col("w_deg")) & (F.col("v") < F.col("w"))
    )
    wedges = e1.join(e2, "u").where(v_below_w).select("u", "v", "w")
    n_wedge = wedges.count()
    t4 = time.perf_counter()
    print(f"wedges (self-join on u): {n_wedge} rows, {t4 - t3:.2f}s")

    closing = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tri = wedges.join(closing, ["v", "w"])
    corner_counts = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    out = (
        deg.select("node")
        .join(corner_counts, "node", "left")
        .select("node", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )
    out.write.format("noop").mode("overwrite").save()
    t5 = time.perf_counter()
    print(f"closing join + counts + final: {t5 - t4:.2f}s")
    print(f"sum of barriers: {t5 - t0:.2f}s")

    for _ in range(2):
        t0 = time.perf_counter()
        SPARK_QUERIES["triangle_counts"](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"end-to-end row: {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
