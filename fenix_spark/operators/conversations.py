"""Conversation (SFT / chat) data operators — the post-pretraining
half of a training-data pipeline: multi-turn examples as an
``array<struct<role string, content string>>`` column, processed with
native expressions (conversations are rows, never exploded across the
cluster — a 50-turn chat is one cell, and every check below is
scan-local).

- ``conversation_stats``: turn/role/token accounting per example.
- ``conversation_checks``: the standard structural rules (alternating
  user/assistant after an optional leading system turn, starts with
  user, ends with assistant, no empty contents, known roles only) as
  boolean columns — compose them with ``operators/expectations``
  (`validate` / `quarantine` / `require`) for ledgers and gates.
- ``truncate_to_budget``: fit a token budget by dropping OLDEST
  non-system turns at TURN boundaries (the standard context-window
  prep: system prompt survives, history truncates from the front),
  never splitting a message.
- ``render_training_text``: flatten to a tagged training string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import let
from fenix_spark.functions.textstats import ws_token_count

KNOWN_ROLES = ("system", "user", "assistant", "tool")


def _msg_tokens(msgs: Column) -> Column:
    """array<bigint> of per-message whitespace token counts."""
    return F.transform(msgs, lambda m: ws_token_count(m["content"]))


def conversation_stats(
    df: DataFrame, messages_col: str, id_col: str
) -> DataFrame:
    """(id, n_turns, n_user, n_assistant, has_system, total_tokens,
    assistant_tokens) — one scan, all native."""
    m = F.col(messages_col)

    def count_role(role: str) -> Column:
        return F.size(F.filter(m, lambda x: x["role"] == F.lit(role)))

    toks = _msg_tokens(m)
    assistant_toks = F.aggregate(
        F.zip_with(
            m,
            toks,
            lambda x, t: F.when(x["role"] == "assistant", t).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(m).alias("n_turns"),
        count_role("user").alias("n_user"),
        count_role("assistant").alias("n_assistant"),
        (count_role("system") > 0).alias("has_system"),
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + t).alias(
            "total_tokens"
        ),
        assistant_toks.alias("assistant_tokens"),
    )


def conversation_checks(messages_col: str) -> list[tuple[str, Column]]:
    """Expectation rules over the messages column — feed straight into
    ``expectations.validate(df, conversation_checks("messages"))``."""
    m = F.col(messages_col)
    # the turn sequence with any leading system turn removed
    body = F.when(
        (F.size(m) > 0) & (F.element_at(m, 1)["role"] == "system"),
        F.slice(m, 2, F.greatest(F.size(m) - 1, F.lit(0))),
    ).otherwise(m)

    def alternates(seq: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(seq) - 1)
        return F.when(F.size(seq) <= 1, F.lit(True)).otherwise(
            F.forall(
                idx,
                lambda i: F.element_at(seq, i.cast("int"))["role"]
                != F.element_at(seq, (i + 1).cast("int"))["role"],
            )
        )

    return [
        ("nonempty_conversation", F.size(m) > 0),
        (
            "known_roles_only",
            F.forall(m, lambda x: x["role"].isin(*KNOWN_ROLES)),
        ),
        (
            "no_empty_content",
            F.forall(m, lambda x: F.length(F.trim(x["content"])) > 0),
        ),
        (
            "system_only_leads",
            let(
                body,
                lambda b: F.forall(b, lambda x: x["role"] != F.lit("system")),
            ),
        ),
        ("starts_with_user", let(body, lambda b: F.when(F.size(b) > 0, F.element_at(b, 1)["role"] == "user").otherwise(F.lit(False)))),
        (
            "ends_with_assistant",
            F.when(F.size(m) > 0, F.element_at(m, -1)["role"] == "assistant").otherwise(
                F.lit(False)
            ),
        ),
        ("roles_alternate", let(body, alternates)),
    ]


def truncate_to_budget(
    df: DataFrame, messages_col: str, budget: int
) -> DataFrame:
    """Replace ``messages_col`` with the longest suffix of non-system
    turns (plus any leading system turn) whose total whitespace-token
    count fits ``budget``. Turn boundaries only; a single over-budget
    turn yields just the system turn (empty history) rather than a
    split message — callers gate those with ``conversation_checks``."""
    m = F.col(messages_col)
    toks = let(m, _msg_tokens)
    has_sys = (F.size(m) > 0) & (F.element_at(m, 1)["role"] == "system")
    sys_tokens = F.when(has_sys, F.element_at(toks, 1)).otherwise(F.lit(0))
    body_start = F.when(has_sys, F.lit(2)).otherwise(F.lit(1))
    n = F.size(m)

    # cut = smallest start index s (body_start ≤ s ≤ n+1) such that
    # sys_tokens + Σ toks[s..n] ≤ budget — computed as a fold over
    # candidate starts (conversation lengths are tiny; O(n²) per ROW
    # is constant-bounded work inside the scan)
    def pick_cut(tk: Column) -> Column:
        starts = F.sequence(body_start, n + 1)
        fits = F.filter(
            starts,
            lambda s: (
                sys_tokens
                + F.aggregate(
                    F.slice(tk, s.cast("int"), (n - s + 1).cast("int")),
                    F.lit(0).cast("bigint"),
                    lambda a, t: a + t,
                )
            )
            <= F.lit(budget),
        )
        # try_element_at: when even the bare system turn exceeds the
        # budget, fits is EMPTY — element_at would raise
        # ArrayIndexOutOfBounds; null cut → empty history below
        return F.try_element_at(fits, F.lit(1))

    cut = let(toks, pick_cut)
    sys_arr = F.when(has_sys, F.slice(m, 1, 1)).otherwise(
        F.slice(m, 1, 0)
    )
    kept = F.concat(
        sys_arr,
        F.when(
            cut <= n, F.slice(m, cut.cast("int"), (n - cut + 1).cast("int"))
        ).otherwise(F.slice(m, 1, 0)),
    )
    return df.withColumn(messages_col, kept)


def render_training_text(
    df: DataFrame, messages_col: str, out_col: str = "text"
) -> DataFrame:
    """Flatten to ``<|role|>\\ncontent`` blocks — the hand-off format
    for the tokenize/pack stages (operators/packing.py)."""
    # coalesce role/content: concat null-propagates and array_join
    # then DROPS the whole turn — a malformed message must surface as
    # an empty-content block, not silently vanish from training text
    rendered = F.array_join(
        F.transform(
            F.col(messages_col),
            lambda x: F.concat(
                F.lit("<|"),
                F.coalesce(x["role"], F.lit("unknown")),
                F.lit("|>\n"),
                F.coalesce(x["content"], F.lit("")),
            ),
        ),
        "\n",
    )
    return df.withColumn(out_col, rendered)
