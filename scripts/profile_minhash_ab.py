"""A/B steady-state timing of minhash_neardup variants at sf0.1.

Variants:
  A: current minhash_neardup_pairs
  B: length filter pushed BEFORE the candidate distinct (lossless)
  C: B + signature-estimate pre-filter (n_match >= 20 of 24) before
     distinct (lossy by design; oracle would mirror)
"""
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import minhash_signature_hashed
from fenix_spark.operators.dedup import (
    hashed_token_sets,
    jaccard,
    minhash_neardup_pairs,
)

SF_DIR = "/root/testdata/sf0.1"
THRESHOLD = 0.95

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")


def variant_a():
    return minhash_neardup_pairs(docs, "text", "doc_id", threshold=THRESHOLD)


def _pairs_custom(prefilter_nmatch=None):
    """Rebuild of minhash_neardup_pairs with the length filter (and
    optionally a sig-estimate filter) applied BEFORE the distinct."""
    sets = hashed_token_sets(docs, "text", "doc_id", 1)
    groups = sets.groupBy("s").agg(F.sort_array(F.collect_list("id")).alias("ids"))
    groups = groups.localCheckpoint(eager=False)
    reps = groups.select(F.element_at("ids", 1).alias("id"), "s")
    signed = reps.select(
        "id", "s", F.size("s").alias("sz"),
        minhash_signature_hashed(F.col("s"), 24).alias("sig"),
    )
    carry = ("sz", "sig") if prefilter_nmatch else ("sz",)
    band_rows = signed.select(
        "id", *carry,
        F.posexplode(
            F.array(*[
                F.concat_ws("|", *[F.element_at("sig", b * 8 + r + 1) for r in range(8)])
                for b in range(3)
            ])
        ).alias("band", "key"),
    )
    l = band_rows.select(
        F.col("id").alias("id_l"), *[F.col(c).alias(f"{c}_l") for c in carry], "band", "key"
    )
    r = band_rows.select(
        F.col("id").alias("id_r"), *[F.col(c).alias(f"{c}_r") for c in carry], "band", "key"
    )
    joined = (
        l.join(r, ["band", "key"])
        .where(F.col("id_l") < F.col("id_r"))
        .where(
            F.least("sz_l", "sz_r") >= (THRESHOLD - 1e-6) * F.greatest("sz_l", "sz_r")
        )
    )
    if prefilter_nmatch:
        joined = joined.where(
            F.size(
                F.filter(F.zip_with("sig_l", "sig_r", lambda a, b: a == b), lambda x: x)
            )
            >= prefilter_nmatch
        )
    cand = joined.select("id_l", "id_r").distinct()
    lv = reps.select(F.col("id").alias("id_l"), F.col("s").alias("s_l"))
    rv = reps.select(F.col("id").alias("id_r"), F.col("s").alias("s_r"))
    rep_pairs = (
        cand.join(lv, "id_l").join(rv, "id_r")
        .withColumn("jaccard", F.round(jaccard(F.col("s_l"), F.col("s_r")), 6))
        .where(F.col("jaccard") >= THRESHOLD)
        .select("id_l", "id_r", "jaccard")
    )
    members = groups.select(F.element_at("ids", 1).alias("rid"), "ids")
    cross = (
        rep_pairs.join(members.withColumnRenamed("ids", "ids_l"), rep_pairs.id_l == members.rid)
        .drop("rid")
        .join(members.withColumnRenamed("ids", "ids_r"), rep_pairs.id_r == members.rid)
        .select("jaccard", F.explode("ids_l").alias("a"), "ids_r")
        .select("jaccard", "a", F.explode("ids_r").alias("b"))
        .select(F.least("a", "b").alias("id_l"), F.greatest("a", "b").alias("id_r"), "jaccard")
    )
    intra = (
        groups.where(F.size("ids") > 1)
        .select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .where(F.col("a") < F.col("b"))
        .select(
            F.col("a").alias("id_l"), F.col("b").alias("id_r"),
            F.round(F.lit(1.0), 6).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


def timed(name, fn, runs=3):
    counts = []
    times = []
    for i in range(runs):
        t0 = time.time()
        n = fn().count()
        times.append(time.time() - t0)
        counts.append(n)
    print(f"{name}: rows={counts} times={[round(t, 2) for t in times]} best={min(times):.2f}s")


timed("A current", variant_a)
timed("B filter-before-distinct", lambda: _pairs_custom(None))
timed("C B+sig-est>=20", lambda: _pairs_custom(20))
timed("C21 B+sig-est>=21", lambda: _pairs_custom(21))
spark.stop()
