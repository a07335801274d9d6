"""sf1 scale-evidence pass (VERDICT r08 #4): derive a 10× slice of the
driver testdata, run the most expensive suite queries at sf0.1 and the
derived sf1, and record wall-clock + plan shape (shuffle / broadcast
counts) side by side. The claim under test: plans are shape-stable
under 10× data (same exchanges — AQE only re-coalesces) and wall scales
near-linearly for the linear-work queries.

The slice is DERIVED, not synthetic: each table is 10 replicas of the
sf0.1 parquet with ids offset by a stride (keys stay joinable —
lineitem and orders shift orderkey together). Document text gets a
per-replica suffix token so the near-dup workload scales linearly
(unperturbed replicas would add quadratic intra-group pairs — a
different workload, not a bigger one). Embedding vectors are kept
bit-identical (distinct vec_ids); ANN work is driven by corpus size,
not vector novelty.

Usage: python scripts/scale_evidence.py [--rebuild]
Writes the ledger to stdout; paste/refresh the SCALE.md section.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fenix_spark.session import get_session

SF01 = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "_artifacts", "sf1_data")
REPLICAS = 10

QUERIES = [
    "ivfpq_search",
    "ivf_batch_search",
    "minhash_neardup",
    "similarity_join_topk",
    "embedding_neardup",
    "tpch_q5",
    # r10 (VERDICT r09 #2): the dedup/text rows a 100 TB pipeline
    # leans on hardest — all scan the replicated documents table.
    "substring_dedup",
    "decontamination",
    "heavy_hitters",
    "drift_psi",
    "tfidf_top_terms",
    # r11 (VERDICT r10 #6): the r10/r11 oracle-rotation rows — all
    # one-scan + summary-shuffle designs whose shape must hold at 10×.
    "bootstrap_ci",
    "quantile_normalize",
    "readability_scores",
    # r12 rotation row: zero shuffles at both SFs by construction
    # (row-local explode + md5-bucket filter) — the ledger pins it.
    "epoch_sample",
    # r13 rotation row: degree-ordered wedge enumeration — shape-stable
    # id-keyed equi-joins; wall superlinearity is bounded by the
    # thinned graph's wedge growth, not raw row count.
    "triangle_counts",
    # r13 rotation #10 row: one lead window over (user, ts, state) into
    # a partial-aggregable (from, to) count — 10× users shuffle 10× the
    # id/state rows but the OUTPUT is the same ≤|states|² matrix (n
    # scales 10×, probs identical because replicas repeat sequences).
    "markov_transitions",
]


def _build_sf1(spark) -> None:
    os.makedirs(SF1, exist_ok=True)
    done = os.path.join(SF1, "_DERIVED_OK")
    if os.path.isfile(done) and "--rebuild" not in sys.argv:
        return

    import glob
    import shutil

    def _single_file(df, dest: str) -> None:
        # the testdata layout (and artifacts._source_stamp) is one
        # parquet FILE per table — write to a staging dir, move the
        # single part out
        tmp = dest + ".stage"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        if os.path.exists(dest):
            os.remove(dest)
        shutil.move(part, dest)
        shutil.rmtree(tmp)

    def replicate(name: str, id_cols: list[str], stride_col: str, text_col: str | None = None):
        src = spark.read.parquet(f"{SF01}/{name}.parquet")
        stride = src.agg(F.max(stride_col)).first()[0] + 1
        parts = []
        for i in range(REPLICAS):
            p = src
            for c in id_cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * stride))
            if text_col is not None and i > 0:
                p = p.withColumn(
                    text_col, F.concat(F.col(text_col), F.lit(f" replica{i}tok"))
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        _single_file(out, f"{SF1}/{name}.parquet")

    # joint keys shift together so join selectivity is preserved
    replicate("documents", ["doc_id"], "doc_id", text_col="text")
    replicate("embeddings", ["vec_id"], "vec_id")
    replicate("lineitem", ["l_orderkey"], "l_orderkey")
    replicate("orders", ["o_orderkey"], "o_orderkey")
    # events: 10× users, each replica repeating the same sequences
    # (event_id stride keeps both ids unique; ts untouched) — the
    # markov row's transition matrix must come back identical with
    # every n exactly 10×
    replicate("events", ["event_id", "user_id"], "event_id")
    # dims referenced by tpch_q5 pass through unchanged
    for name in ("customer", "supplier", "nation", "region", "part"):
        src = f"{SF01}/{name}.parquet"
        if os.path.exists(src):
            shutil.copyfile(src, f"{SF1}/{name}.parquet")
    with open(done, "w") as fh:
        fh.write("ok")


def main() -> None:
    spark = get_session("scale_evidence")
    spark.sparkContext.setLogLevel("ERROR")
    _build_sf1(spark)

    queries = list(QUERIES)
    for i, a in enumerate(sys.argv):
        if a == "--only" and i + 1 < len(sys.argv):
            wanted = sys.argv[i + 1].split(",")
            queries = [q for q in queries if q in wanted]

    from fenix_spark.artifacts import ensure_artifacts
    from fenix_spark.plans.inspect import broadcast_join_count, shuffle_count
    from fenix_spark.suite import SPARK_QUERIES

    for sf in (SF01, SF1):
        ensure_artifacts(spark, sf)

    print(f"| query | sf0.1 wall | sf1 wall | ratio | shuffles 0.1→1 | bcast 0.1→1 | rows 0.1→1 |")
    print("|---|---|---|---|---|---|---|")
    for name in queries:
        fn = SPARK_QUERIES[name]
        rec = {}
        for label, sf in (("a", SF01), ("b", SF1)):
            df = fn(spark, sf)
            sh, bc = shuffle_count(df), broadcast_join_count(df)
            walls = []
            for _ in range(2):
                t0 = time.time()
                n = fn(spark, sf).count()
                walls.append(time.time() - t0)
            rec[label] = (min(walls), sh, bc, n)
        (wa, sa, ba, na), (wb, sb, bb, nb) = rec["a"], rec["b"]
        print(
            f"| {name} | {wa:.2f}s | {wb:.2f}s | {wb / wa:.1f}× "
            f"| {sa}→{sb} | {ba}→{bb} | {na:,}→{nb:,} |"
        )
    la = os.getloadavg()
    print(f"load_1m={la[0]:.1f}")


if __name__ == "__main__":
    main()
