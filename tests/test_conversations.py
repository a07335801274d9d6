"""Conversation-ops tests: stats accounting, every structural rule's
pass and fail case, budget truncation semantics (system survives,
turn-boundary cuts, over-budget degeneracy), render format."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.conversations import (
    conversation_checks,
    conversation_stats,
    render_training_text,
    truncate_to_budget,
)

SCHEMA = "id bigint, messages array<struct<role string, content string>>"


def _conv(*turns):
    return [{"role": r, "content": c} for r, c in turns]


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        (0, _conv(("system", "be helpful always"), ("user", "hi there"),
                  ("assistant", "hello friend"))),
        (1, _conv(("user", "question one"), ("assistant", "answer one"),
                  ("user", "question two"), ("assistant", "answer two"))),
        (2, _conv(("assistant", "i speak first"), ("user", "odd"))),  # bad start/end
        (3, _conv(("user", "hi"), ("user", "hi again"), ("assistant", "ok"))),  # no alternation
        (4, _conv(("user", "  "), ("assistant", "fine"))),  # empty content
        (5, []),  # empty conversation
        (6, _conv(("user", "x"), ("system", "late system"), ("assistant", "y"))),  # system mid-stream
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_stats(spark, convs):
    got = {r.id: r for r in conversation_stats(convs, "messages", "id").collect()}
    assert got[0].n_turns == 3 and got[0].has_system
    assert got[0].total_tokens == 3 + 2 + 2
    assert got[0].assistant_tokens == 2
    assert got[1].n_user == 2 and got[1].n_assistant == 2
    assert got[5].n_turns == 0 and got[5].total_tokens == 0


def test_checks_matrix(spark, convs):
    from fenix_spark.operators.expectations import quarantine

    clean, bad = quarantine(convs, conversation_checks("messages"))
    assert sorted(r.id for r in clean.collect()) == [0, 1]
    failures = {r.id: set(r["__failed"]) for r in bad.collect()}
    assert "starts_with_user" in failures[2] and "ends_with_assistant" in failures[2]
    assert failures[3] == {"roles_alternate"}
    assert failures[4] == {"no_empty_content"}
    assert "nonempty_conversation" in failures[5]
    assert "system_only_leads" in failures[6]


def test_truncate_keeps_system_drops_oldest(spark):
    df = spark.createDataFrame(
        [
            (0, _conv(
                ("system", "sys prompt"),        # 2 tokens
                ("user", "one two three"),       # 3
                ("assistant", "four five six"),  # 3
                ("user", "seven eight"),         # 2
                ("assistant", "nine ten"),       # 2
            ))
        ],
        SCHEMA,
    )
    out = truncate_to_budget(df, "messages", budget=7).first().messages
    # system (2) + last two turns (2+2=4) = 6 ≤ 7; adding the
    # assistant turn before them (3) would make 9 > 7
    assert [m.role for m in out] == ["system", "user", "assistant"]
    assert out[1].content == "seven eight"

    # budget smaller than any turn → system only
    tiny = truncate_to_budget(df, "messages", budget=2).first().messages
    assert [m.role for m in tiny] == ["system"]


def test_truncate_without_system(spark):
    df = spark.createDataFrame(
        [(0, _conv(("user", "a b c"), ("assistant", "d e"), ("user", "f")))],
        SCHEMA,
    )
    out = truncate_to_budget(df, "messages", budget=3).first().messages
    assert [m.role for m in out] == ["assistant", "user"]
    # untruncated when already within budget
    full = truncate_to_budget(df, "messages", budget=100).first().messages
    assert len(full) == 3


def test_render_format(spark):
    df = spark.createDataFrame(
        [(0, _conv(("user", "hi"), ("assistant", "yo")))], SCHEMA
    )
    txt = render_training_text(df, "messages").first().text
    assert txt == "<|user|>\nhi\n<|assistant|>\nyo"


def test_truncate_oversized_system_turn(spark):
    # the hypothesis-found crash: system turn alone exceeds the budget
    df = spark.createDataFrame(
        [(0, _conv(("system", "s y s"), ("user", "w")))], SCHEMA
    )
    out = truncate_to_budget(df, "messages", budget=1).first().messages
    assert [m.role for m in out] == ["system"]  # null cut → empty history
