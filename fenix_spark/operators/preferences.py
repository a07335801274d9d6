"""Preference-pair (RLHF / DPO) data operators — the reward-modeling
sibling of ``operators/conversations.py``: each example is a prompt
conversation plus a chosen and a rejected response, all processed as
scan-local native expressions.

- ``preference_checks``: structural rules (prompt valid per the
  conversation rules, chosen ≠ rejected, both responses non-empty) as
  expectation rules — compose with ``expectations.validate`` /
  ``quarantine`` / ``require``.
- ``preference_stats``: per-example length accounting + the
  length-bias diagnostic (chosen−rejected token delta, whose CORPUS
  mean should hover near 0 — a strongly positive mean means the
  reward data teaches 'longer is better', the classic dataset bug).
- ``length_debias_sample``: deterministic down-sampling of examples
  whose |delta| exceeds a cap, the standard mitigation — a pure
  (hash, delta) row filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.textstats import ws_token_count
from fenix_spark.operators.sampling import _BUCKETS, hash_bucket


def preference_checks(
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> list[tuple[str, Column]]:
    """Expectation rules for a (prompt: array<struct<role,content>>,
    chosen: string, rejected: string) preference row."""
    from fenix_spark.operators.conversations import conversation_checks

    prompt_rules = [
        (f"prompt_{name}", pred)
        for name, pred in conversation_checks(prompt_col)
        # the prompt legitimately ends with the USER turn the
        # responses answer — drop the assistant-final rule
        if name != "ends_with_assistant"
    ]
    c, r = F.col(chosen_col), F.col(rejected_col)
    return prompt_rules + [
        ("prompt_ends_with_user", F.when(F.size(F.col(prompt_col)) > 0, F.element_at(F.col(prompt_col), -1)["role"] == "user").otherwise(F.lit(False))),
        ("chosen_nonempty", F.length(F.trim(c)) > 0),
        ("rejected_nonempty", F.length(F.trim(r)) > 0),
        ("responses_differ", F.trim(c) != F.trim(r)),
    ]


def preference_stats(
    df: DataFrame,
    id_col: str,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """(id, prompt_tokens, chosen_tokens, rejected_tokens,
    length_delta) — one scan; aggregate length_delta over the corpus
    for the length-bias diagnostic."""
    prompt_tokens = F.aggregate(
        F.transform(F.col(prompt_col), lambda m: ws_token_count(m["content"])),
        F.lit(0).cast("bigint"),
        lambda a, t: a + t,
    )
    ct = ws_token_count(F.col(chosen_col))
    rt = ws_token_count(F.col(rejected_col))
    return df.select(
        F.col(id_col).alias("id"),
        prompt_tokens.alias("prompt_tokens"),
        ct.alias("chosen_tokens"),
        rt.alias("rejected_tokens"),
        (ct - rt).alias("length_delta"),
    )


def length_debias_sample(
    df: DataFrame,
    id_col: str,
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    max_abs_delta: int = 50,
    keep_fraction: float = 0.2,
    salt: str = "",
) -> DataFrame:
    """Keep all examples with |chosen−rejected| token delta ≤ cap;
    keep only ``keep_fraction`` (hash-deterministic) of the rest.
    Pure row decision: retry/repartition/engine stable like every
    sampling op in this repo."""
    delta = F.abs(
        ws_token_count(F.col(chosen_col)) - ws_token_count(F.col(rejected_col))
    )
    # the shared sampling bucket (operators/sampling.hash_bucket), not
    # a private copy — one hash scheme to maintain
    return df.where(
        (delta <= max_abs_delta)
        | (hash_bucket(id_col, salt) < int(round(keep_fraction * _BUCKETS)))
    )
