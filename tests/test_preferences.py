"""Preference-pair tests: rule matrix, length stats + bias
diagnostic, deterministic debias sampling, and the SFT end-to-end
(conversations → render → BPE → pack) integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.preferences import (
    length_debias_sample,
    preference_checks,
    preference_stats,
)

SCHEMA = (
    "id bigint, prompt array<struct<role string, content string>>, "
    "chosen string, rejected string"
)


def _p(*turns):
    return [{"role": r, "content": c} for r, c in turns]


@pytest.fixture(scope="module")
def prefs(spark):
    rows = [
        (0, _p(("system", "be good"), ("user", "explain joins")),
         "a join matches rows by key", "joins are a thing"),
        (1, _p(("user", "hi")), "hello there", "hello there"),  # identical
        (2, _p(("user", "hm"), ("assistant", "mid"),), "yes", "no"),  # ends w/ assistant
        (3, _p(("user", "ok")), "   ", "fine"),  # empty chosen
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_preference_rule_matrix(spark, prefs):
    from fenix_spark.operators.expectations import quarantine

    clean, bad = quarantine(prefs, preference_checks())
    assert [r.id for r in clean.collect()] == [0]
    failures = {r.id: set(r["__failed"]) for r in bad.collect()}
    assert failures[1] == {"responses_differ"}
    assert "prompt_ends_with_user" in failures[2]
    assert failures[3] == {"chosen_nonempty"}


def test_preference_stats_and_bias_diag(spark, prefs):
    stats = preference_stats(prefs, "id")
    got = {r.id: r for r in stats.collect()}
    assert got[0].prompt_tokens == 2 + 2
    assert got[0].chosen_tokens == 6 and got[0].rejected_tokens == 4
    assert got[0].length_delta == 2
    # corpus-level bias diagnostic is just an aggregate over the frame
    mean_delta = stats.agg(F.avg("length_delta")).first()[0]
    assert mean_delta is not None


def test_length_debias_deterministic(spark):
    rows = [
        (i, _p(("user", "q")), "word " * (10 + (i % 3)), "word " * 10)
        for i in range(300)
    ] + [
        (1000 + i, _p(("user", "q")), "word " * 200, "word " * 10)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = length_debias_sample(df, "id", max_abs_delta=5, keep_fraction=0.2, salt="s")
    ids = sorted(r.id for r in out.collect())
    # all small-delta rows kept
    assert all(i in ids for i in range(300))
    n_biased = sum(1 for i in ids if i >= 1000)
    assert 5 <= n_biased <= 40  # ~20 of 100, hash-binomial spread
    ids2 = sorted(
        r.id
        for r in length_debias_sample(
            df.repartition(9), "id", max_abs_delta=5, keep_fraction=0.2, salt="s"
        ).collect()
    )
    assert ids == ids2


def test_sft_end_to_end_render_bpe_pack(spark):
    """conversations → render → BPE encode → pack: every stage
    consumes the previous stage's real output."""
    from fenix_spark.functions.bpe import bpe_encode, train_bpe
    from fenix_spark.operators.conversations import (
        render_training_text,
        truncate_to_budget,
    )
    from fenix_spark.operators.packing import pack_sequences

    convs = spark.createDataFrame(
        [
            (i, [
                {"role": "user", "content": f"question number {i} about spark"},
                {"role": "assistant", "content": f"answer {i} with details " * (1 + i % 4)},
            ])
            for i in range(40)
        ],
        "id bigint, messages array<struct<role string, content string>>",
    )
    fitted = truncate_to_budget(convs, "messages", budget=64)
    # materialize the rendered text: the truncate+render expression
    # tree is large, and feeding it INLINE into a pandas_udf trips
    # Catalyst's unevaluable-expression path — a checkpoint boundary
    # between expression-heavy prep and UDF stages is the pattern
    rendered = (
        render_training_text(fitted, "messages")
        .select("id", "text")
        .localCheckpoint(eager=False)
    )
    merges = train_bpe(rendered, "text", num_merges=50)
    encoded = bpe_encode(rendered, "text", merges)
    with_len = encoded.select("id", F.size("bpe_tokens").alias("n_tok"))
    packed = pack_sequences(with_len, "n_tok", id_col="id", budget=128)
    rows = packed.collect()
    assert len(rows) == 40  # every example assigned exactly once
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, 0)
        by_pack[r.pack_id] += r.length
    for pack_id, tot in by_pack.items():
        assert tot <= 128 or len([r for r in rows if r.pack_id == pack_id]) == 1
