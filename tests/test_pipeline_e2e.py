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


def test_curation_pipeline_v2(spark, documents, embeddings):
    """The session-3 operators composed: semantic dedup → LM-perplexity
    quality gate → BPE token counts → leakage-safe split → BM25 over
    the train split. Again: every stage consumes the previous stage's
    real output."""
    from fenix_spark.functions.bpe import bpe_encode, train_bpe
    from fenix_spark.functions.ngram_lm import perplexity, train_bigram_lm
    from fenix_spark.operators.bm25 import bm25_search, build_bm25_index
    from fenix_spark.operators.coder import CodingConfig, train_coding
    from fenix_spark.operators.dedup import minhash_neardup_pairs
    from fenix_spark.operators.leakage import (
        leakage_safe_split,
        split_leakage_report,
    )
    from fenix_spark.operators.semdedup import semantic_dedup

    corpus = documents.select("doc_id", "text")
    n0 = corpus.count()

    # 1. semantic dedup over the doc embeddings (vec_id aligns doc_id)
    emb = embeddings.limit(400).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    )
    coding = train_coding(
        emb, "embedding", CodingConfig(metric="l2", codebook_size=4, num_codebooks=1)
    )
    decisions = semantic_dedup(emb, "embedding", "doc_id", coding, threshold=0.999)
    survivors = corpus.join(
        decisions.where("keep").select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    n1 = survivors.count()
    assert 0 < n1 <= n0

    # 2. LM perplexity gate: train on survivors, drop the worst 10%
    lm = train_bigram_lm(survivors, "text", "doc_id")
    scored = perplexity(survivors, "text", "doc_id", lm)
    cut = scored.where(F.col("ppl").isNotNull()).approxQuantile("ppl", [0.9], 0.01)[0]
    good_ids = scored.where(F.col("ppl").isNotNull() & (F.col("ppl") <= cut))
    filtered = survivors.join(good_ids.select(F.col("id").alias("doc_id")), "doc_id", "left_semi")
    n2 = filtered.count()
    assert 0 < n2 < n1

    # 3. BPE token counts from a corpus-trained tokenizer
    merges = train_bpe(filtered, "text", num_merges=50)
    counted = bpe_encode(filtered, "text", merges).select(
        "doc_id", "text", F.size("bpe_tokens").alias("n_tokens")
    )
    assert counted.where(F.col("n_tokens") <= 0).count() == 0

    # 4. leakage-safe split on lexical near-dup pairs
    pairs = minhash_neardup_pairs(filtered, "text", "doc_id", threshold=0.8).select(
        "id_l", "id_r"
    )
    split = leakage_safe_split(counted, pairs, "doc_id", (0.8, 0.2), ("train", "test"))
    rep = split_leakage_report(split, pairs, "doc_id").collect()
    assert all(r.split_l == r.split_r for r in rep)

    # 5. BM25 searchable index over the train split only
    train = split.where("split = 'train'")
    idx = build_bm25_index(train, "text", "doc_id")
    probe_doc = train.head()
    probe_terms = " ".join(probe_doc.text.split()[:5])
    n_train = train.count()
    hits = bm25_search(spark, idx, probe_terms, k=n_train).collect()
    # the probe's own doc matches (it contains every query term) and
    # the ranking is descending on (score, doc_id)
    assert probe_doc.doc_id in {h.doc_id for h in hits}
    ordered = [(h.score, h.doc_id) for h in hits]
    assert ordered == sorted(ordered, key=lambda p: (-p[0], p[1]))

    # 6. terminal export: the train split ships as TFRecord training
    # shards (executor-parallel writer) and reads back whole — the
    # pipeline's last mile is the reference-free training format
    import tempfile

    from fenix_spark.sources.tfrecord import register_tfrecord

    register_tfrecord(spark)
    out = tempfile.mkdtemp(prefix="e2e_tfr_")
    (
        train.select("doc_id", "text", "n_tokens")
        .repartition(2)
        .write.format("tfrecord")
        .mode("overwrite")
        .save(out)
    )
    back = (
        spark.read.format("tfrecord")
        .schema("doc_id long, text string, n_tokens long")
        .load(out)
    )
    assert back.count() == n_train
    joined = back.join(train, "doc_id", "inner")
    assert joined.count() == n_train  # every id round-tripped
