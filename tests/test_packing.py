"""Sequence packing (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.packing import pack_sequences, packing_efficiency

BUDGET = 100


def _docs(spark, lengths):
    return spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lengths)], "doc_id bigint, n_tokens bigint"
    )


def test_every_doc_packed_once_within_budget(spark):
    lengths = [60, 50, 40, 30, 30, 20, 10, 5, 99, 1]
    out = pack_sequences(
        _docs(spark, lengths), "n_tokens", budget=BUDGET, num_buckets=4
    ).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(lengths)))
    by_pack = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, rows in by_pack.items():
        total = sum(r["length"] for r in rows)
        assert total <= BUDGET
        assert all(r["pack_len"] == total for r in rows)
        assert all(r["pack_docs"] == len(rows) for r in rows)


def test_deterministic_across_runs_and_layout(spark):
    lengths = [37, 12, 88, 5, 61, 44, 23, 71, 9, 50] * 20
    df = _docs(spark, lengths)
    a = {(r["doc_id"], r["pack_id"]) for r in pack_sequences(df, "n_tokens", budget=BUDGET).collect()}
    b = {
        (r["doc_id"], r["pack_id"])
        for r in pack_sequences(df.repartition(13), "n_tokens", budget=BUDGET).collect()
    }
    assert a == b


def test_oversize_own_pack_and_error_modes(spark):
    df = _docs(spark, [150, 10])
    out = pack_sequences(df, "n_tokens", budget=BUDGET, num_buckets=1).collect()
    big = next(r for r in out if r["doc_id"] == 0)
    assert big["pack_docs"] == 1 and big["pack_len"] == 150  # flagged by > budget
    with pytest.raises(Exception, match="budget"):
        pack_sequences(df, "n_tokens", budget=BUDGET, oversize="error", num_buckets=1).collect()


def test_ffd_efficiency_floor(spark):
    """200 uniform-ish docs: FFD must fill packs well past the naive
    one-doc-per-pack baseline. (FFD guarantees 11/9·OPT+1 bins; with
    mean length 30 vs budget 100 the fill fraction is ≥ 0.7 even with
    bucket fragmentation.)"""
    lengths = [(i * 7919) % 50 + 5 for i in range(200)]
    packed = pack_sequences(_docs(spark, lengths), "n_tokens", budget=BUDGET, num_buckets=4)
    eff = packing_efficiency(packed, BUDGET).first()
    assert eff["n_docs"] == 200
    assert eff["fill_frac"] >= 0.7


def test_only_ids_and_lengths_shuffle(spark):
    """The packing plan must not move document text: the exchange's
    input schema is (id, length, bucket) — text stays in place until
    the caller joins the assignment back."""
    df = _docs(spark, [10, 20, 30]).withColumn("text", F.repeat(F.lit("x"), 1000))
    plan = (
        pack_sequences(df, "n_tokens", budget=BUDGET)
        ._jdf.queryExecution().executedPlan().toString()
    )
    ex = plan.split("Exchange")[1]
    assert "text" not in ex.split("\n")[0]


def test_pack_sequences_keeps_string_id_type(spark):
    """Document ids are as often strings (URLs, UUIDs, composite
    provenance keys) as integers — the pack output keeps the caller's
    id type and the deterministic tie-break works on strings."""
    from fenix_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(f"doc-{i:03d}#{i % 3}", 100 + i) for i in range(40)],
        "uid string, n_tok long",
    )
    out = pack_sequences(df, "n_tok", id_col="uid", budget=256)
    assert dict(out.dtypes)["uid"] == "string"
    rows = out.collect()
    assert len(rows) == 40
    assert {r["uid"] for r in rows} == {f"doc-{i:03d}#{i % 3}" for i in range(40)}
    assert all(
        r["pack_len"] <= 256 or r["pack_docs"] == 1 for r in rows
    )
    # determinism across runs
    again = {(r["uid"], r["pack_id"]) for r in pack_sequences(
        df, "n_tok", id_col="uid", budget=256
    ).collect()}
    assert again == {(r["uid"], r["pack_id"]) for r in rows}
