"""BPE trainer/encoder tests: the Sennrich worked example, histogram
equivalence between the distributed and in-memory paths, retraining
determinism under repartitioning, and encode invariants."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from fenix_spark.functions.bpe import (
    END,
    bpe_encode,
    encode_word,
    train_bpe,
    train_bpe_on_histogram,
)

SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_sennrich_example_merge_order():
    merges = train_bpe_on_histogram(SENNRICH, 6)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
    ]


def test_encode_word_uses_rank_order():
    merges = train_bpe_on_histogram(SENNRICH, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est" + END]
    assert encode_word("low", ranks) == ["low", END]
    # unseen word degrades to characters + sentinel, never crashes
    assert encode_word("zzz", ranks) == ["z", "z", "z", END]


def test_merge_loop_stops_when_no_pair_repeats():
    merges = train_bpe_on_histogram([("ab", 1), ("cd", 1)], 50)
    assert merges == []  # every pair occurs once — nothing to merge


def test_distributed_training_matches_inmemory(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest",
        "widest widest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = train_bpe(df, "text", num_merges=6)
    hist = Counter(w for t in texts for w in t.split())
    want = train_bpe_on_histogram(sorted(hist.items()), 6)
    assert got == want == train_bpe_on_histogram(SENNRICH, 6)


def test_training_deterministic_under_repartition(spark, documents):
    docs = documents.limit(200)
    a = train_bpe(docs.repartition(1), "text", num_merges=40)
    b = train_bpe(docs.repartition(13), "text", num_merges=40)
    assert a == b and len(a) == 40


def test_bpe_encode_concat_invariant(spark, documents):
    """Concatenating a word's BPE tokens (minus the sentinel) must give
    back the word — for every word of every document."""
    import re

    from fenix_spark.functions.bpe import BPE_TOKEN_RE, pre_tokens

    docs = documents.limit(50)
    merges = train_bpe(docs, "text", num_merges=60)
    out = bpe_encode(docs, "text", merges).select(
        "doc_id", "bpe_tokens", pre_tokens(F.col("text")).alias("words")
    )
    lexer = re.compile(BPE_TOKEN_RE)
    for r in out.collect():
        rebuilt = "".join(r.bpe_tokens).replace(END, "")
        assert rebuilt == "".join(r.words)
        # token stream has exactly one sentinel per word
        assert sum(t.endswith(END) for t in r.bpe_tokens) == len(r.words)


def test_bpe_token_count_decreases_with_merges(spark, documents):
    """More merges → no more tokens (merges only ever join symbols)."""
    docs = documents.limit(50)
    merges = train_bpe(docs, "text", num_merges=80)
    n_few = (
        bpe_encode(docs, "text", merges[:5])
        .select(F.sum(F.size("bpe_tokens")).alias("n"))
        .head()["n"]
    )
    n_many = (
        bpe_encode(docs, "text", merges)
        .select(F.sum(F.size("bpe_tokens")).alias("n"))
        .head()["n"]
    )
    assert n_many < n_few


def test_max_words_cap_is_loud(spark, documents):
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(documents.limit(100), "text", num_merges=5, max_words=3)


def test_merge_table_catalog_roundtrip(spark, tmp_path):
    from fenix_spark import catalog
    from fenix_spark.functions.bpe import merges_from_df, merges_to_df

    merges = train_bpe_on_histogram(SENNRICH, 6)
    root = str(tmp_path / "store")
    catalog.make(root, "bpe_merges", merges_to_df(spark, merges))
    back = merges_from_df(catalog.load(spark, root, "bpe_merges"))
    assert back == merges
