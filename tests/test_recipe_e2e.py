"""End-to-end LLM training-data recipe over the REAL sf0.001 corpus:

    documents → heuristic quality gate → minhash near-dup keep-list →
    per-language EPOCH MIXTURE (temperature mixing with upsampling) →
    token counting → sequence packing → webdataset shard export

Every stage is an existing first-class operator; this test proves they
COMPOSE — counts conserve or shrink where they must, upsampled epochs
land where the temperature law says, packs respect the token budget,
and the exported shards round-trip byte-identically. The whole plan
keeps the pipeline's scale contract: the only full-data shuffle is the
terminal shard write (packing buckets are summary-keyed, mixing is a
pure scan, dedup shuffles fingerprints)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.functions.textstats import quality_score, ws_token_count
from fenix_spark.operators.components import dedup_keep_list
from fenix_spark.operators.dedup import minhash_neardup_pairs
from fenix_spark.operators.packing import pack_sequences
from fenix_spark.operators.sampling import epoch_mixture, temperature_rates
from fenix_spark.operators.webdataset import write_webdataset

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )


def test_recipe_end_to_end(spark, docs, tmp_path):
    n0 = docs.count()
    assert n0 > 0

    # 1. heuristic quality gate (scan-only): drop the bottom tail
    gated = docs.withColumn("q", quality_score(F.col("text"))).where(
        F.col("q") >= 0.3
    )
    n1 = gated.count()
    assert 0 < n1 <= n0

    # 2. near-dup keep-list (the only fingerprint shuffle)
    pairs = minhash_neardup_pairs(gated, "text", "doc_id", threshold=0.8)
    kept = dedup_keep_list(gated, pairs, "doc_id", left="id_l", right="id_r")
    n2 = kept.count()
    n_pairs = pairs.count()
    assert n2 <= n1
    assert n2 >= n1 - n_pairs  # each pair removes at most one doc

    # 3. per-language epoch mixture: T→0 wants equal token shares per
    # lang; low-resource langs upsample instead of under-delivering
    kept = kept.localCheckpoint(eager=True)  # one stable input for 2 passes
    langs = [r["lang"] for r in kept.select("lang").distinct().collect()]
    counts = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    sources = [kept.where(F.col("lang") == lg) for lg in langs]
    budget = int(sum(counts.values()) * 0.8)
    mixed = epoch_mixture(
        sources, "doc_id", 1e-9, budget,
        counts=[counts[lg] for lg in langs], max_epochs=3.0, salt="recipe",
    )
    rows = mixed.groupBy("__source").agg(F.count("*").alias("n")).collect()
    realized = {langs[r["__source"]]: r["n"] for r in rows}
    want = temperature_rates(
        [counts[lg] for lg in langs], 1e-9, budget, cap=3.0
    )
    for i, lg in enumerate(langs):
        # realized per-lang rows track the water-filled law; the only
        # slack is the fractional epoch's hash assignment — binomial
        # over that epoch's population (full epochs are EXACT)
        frac = want[i] - int(want[i])
        sigma = (counts[lg] * frac * (1 - frac)) ** 0.5
        assert abs(realized.get(lg, 0) - want[i] * counts[lg]) <= 4 * sigma + 2, (
            lg, realized.get(lg), want[i] * counts[lg]
        )
    assert any(w > 1.0 for w in want), "corpus should force upsampling"

    # 4. token counting + packing: every pack within budget (oversize
    # docs become their own flagged pack)
    tokens = mixed.select(
        F.concat_ws("#", "doc_id", "__source", "__epoch").alias("uid"),
        ws_token_count(F.col("text")).alias("n_tok"),
        "text",
    ).localCheckpoint(eager=True)  # packing + export read it twice
    packed = pack_sequences(tokens, "n_tok", id_col="uid", budget=512)
    over = packed.where(
        (F.col("pack_len") > 512) & (F.col("pack_docs") > 1)
    ).count()
    assert over == 0  # only single-doc packs may exceed the budget
    assert packed.count() == tokens.count()  # every sequence assigned

    # 5. shard export + byte-exact round trip
    out = str(tmp_path / "shards")
    payload = tokens.select(
        "uid", F.encode("text", "UTF-8").alias("data"), F.lit("txt").alias("ext")
    )
    write_webdataset(payload, out, "uid", "data", "ext", shard_rows=500)
    import glob
    import io
    import tarfile

    back = {}
    for shard in glob.glob(f"{out}/*.tar"):
        with tarfile.open(shard) as tf:
            for m in tf.getmembers():
                if m.name.endswith(".txt"):  # skip per-doc .json meta
                    back[m.name.rsplit(".", 1)[0]] = tf.extractfile(m).read()
    want_rows = {
        r["uid"]: bytes(r["data"]) for r in payload.collect()
    }
    assert back == want_rows  # byte-identical, nothing lost or doubled


def test_recipe_is_scan_shaped_until_the_terminal_write(spark, docs):
    """Scale contract of the composition: quality gate + mixture add
    ZERO exchanges on top of the input scan."""
    from fenix_spark.plans import shuffle_count

    gated = docs.withColumn("q", quality_score(F.col("text"))).where(
        F.col("q") >= 0.3
    )
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    sources = [gated.where(F.col("lang") == lg) for lg in langs]
    mixed = epoch_mixture(
        sources, "doc_id", 0.5, 1000, counts=[100] * len(langs), max_epochs=2.0
    )
    assert shuffle_count(mixed) == 0
