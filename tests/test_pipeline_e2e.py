"""End-to-end training-data pipeline: the round-4 operators composed
the way a real corpus build would run them —

    documents → PII scrub → repetition filter → exact+near dedup →
    benchmark decontamination → chunk → token-count → sequence pack

One test, one flow: proves the operators' schemas and contracts
actually compose (every stage consumes the previous stage's output,
not a fixture tailored to it) and that the end state satisfies the
global invariants a trainer cares about.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fenix_spark.functions.chunking import chunk_docs
from fenix_spark.functions.scrub import pii_counts, redact_pii, repetition_flags
from fenix_spark.functions.textstats import ws_token_count
from fenix_spark.operators.decontaminate import decontaminate
from fenix_spark.operators.dedup import exact_dedup_by_hash
from fenix_spark.operators.packing import pack_sequences, packing_efficiency


def test_corpus_build_pipeline(spark, documents):
    corpus = documents.select("doc_id", "text")
    n0 = corpus.count()

    # 1. scrub: redact PII, drop docs that were PII-dense
    scrubbed = (
        corpus.withColumn("pii", pii_counts(F.col("text")))
        .withColumn("text", redact_pii(F.col("text")))
        .where(
            sum(F.col(f"pii.{k}") for k in ("email", "phone", "ipv4", "ssn", "card"))
            <= F.lit(5)
        )
        .drop("pii")
    )

    # 2. repetition quality gate
    quality = repetition_flags(scrubbed).where("repetition_keep").select("doc_id", "text")

    # 3. exact dedup (keep lowest id per content hash)
    kept = exact_dedup_by_hash(quality, "text", "doc_id").select(
        F.col("kept_id").alias("doc_id")
    )
    deduped = quality.join(F.broadcast(kept), "doc_id", "left_semi")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n0

    # 4. decontaminate against a held-out "benchmark" slice
    bench = corpus.where(F.col("doc_id") % 83 == 0)
    clean = decontaminate(deduped, bench, n=4)
    n_clean = clean.count()
    assert n_clean < n_dedup  # the bench slice itself is in-corpus → removed

    # 5. chunk for embedding/packing
    chunks = chunk_docs(clean, size=256, overlap=32)
    assert chunks.where(F.length("chunk") > 256).count() == 0
    # every surviving doc contributes at least one chunk
    assert chunks.select("doc_id").distinct().count() == n_clean

    # 6. token counts + packing into fixed budgets
    counted = chunks.select(
        F.concat_ws("#", F.col("doc_id"), F.col("chunk_no")).alias("chunk_key"),
        ws_token_count(F.col("chunk")).alias("n_tokens"),
    ).withColumn("chunk_id", F.xxhash64("chunk_key"))
    packed = pack_sequences(counted, "n_tokens", id_col="chunk_id", budget=128)
    assert packed.count() == counted.count()  # every chunk packed exactly once
    eff = packing_efficiency(packed, budget=128).first()
    assert eff["n_docs"] == counted.count()
    assert eff["fill_frac"] > 0.5  # budget mostly used, not one-chunk-per-pack
    over = packed.where((F.col("pack_docs") > 1) & (F.col("pack_len") > 128))
    assert over.count() == 0  # only oversize own-packs may exceed budget
