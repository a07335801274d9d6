"""Parse Spark's formatted explain output into checkable facts.

Works on the static physical plan (pre-AQE): shuffle/broadcast/scan
properties asserted here are what Catalyst *planned*; AQE may further
improve (coalesce partitions, demote/promote joins) but never adds
scans or un-pushes filters, so static assertions are conservative.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text (same content ``df.explain`` prints),
    returned instead of printed."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _scan_blocks(plan: str) -> list[str]:
    """Each '(n) Scan parquet …' detail block of the formatted plan."""
    blocks = re.split(r"\n\(\d+\) ", plan)
    return [b for b in blocks if b.startswith("Scan parquet") or b.startswith("Scan ")]


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (empty strings dropped)."""
    out: list[str] = []
    for block in _scan_blocks(formatted_plan(df)):
        m = re.search(r"PushedFilters: \[(.*?)\]", block)
        if m and m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters entries — physical partition pruning (the IVF
    probe path's `__CODED_ID__ IN (...)` must land here, not in a
    post-scan filter)."""
    out: list[str] = []
    for block in _scan_blocks(formatted_plan(df)):
        m = re.search(r"PartitionFilters: \[(.*?)\]", block)
        if m and m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan sets of column names actually read from parquet —
    the column-pruning ground truth."""
    out: list[set[str]] = []
    for block in _scan_blocks(formatted_plan(df)):
        # greedy to the line's last '>' — nested types (array<float>)
        # contain '>' and a lazy match would truncate the column list
        m = re.search(r"ReadSchema: struct<(.*)>", block)
        if m:
            cols = re.findall(r"(?:^|,)(\w+):", m.group(1))
            out.append(set(cols))
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the plan. Reused
    exchanges count once (ReusedExchange is free at runtime)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join", formatted_plan(df)))


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen spans (formatted explain
    tags member operators with '[codegen id : N]')."""
    ids = set(re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df)))
    return len(ids)


def assert_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    min_broadcast_joins: int | None = None,
    pushed_contains: tuple[str, ...] = (),
    partition_filter_contains: tuple[str, ...] = (),
    scan_columns_subset_of: set[str] | None = None,
) -> None:
    """One-call plan contract. Raises AssertionError with the full plan
    text on violation (so CI failures show WHAT Catalyst planned)."""
    plan = formatted_plan(df)
    problems: list[str] = []
    if max_shuffles is not None and shuffle_count(df) > max_shuffles:
        problems.append(f"shuffles {shuffle_count(df)} > {max_shuffles}")
    if min_broadcast_joins is not None and broadcast_join_count(df) < min_broadcast_joins:
        problems.append(
            f"broadcast joins {broadcast_join_count(df)} < {min_broadcast_joins}"
        )
    pushed = " ; ".join(pushed_filters(df))
    for frag in pushed_contains:
        if frag not in pushed:
            problems.append(f"{frag!r} not in PushedFilters [{pushed}]")
    parts = " ; ".join(partition_filters(df))
    for frag in partition_filter_contains:
        if frag not in parts:
            problems.append(f"{frag!r} not in PartitionFilters [{parts}]")
    if scan_columns_subset_of is not None:
        for cols in read_schema_columns(df):
            extra = cols - scan_columns_subset_of
            if extra:
                problems.append(f"scan reads unexpected columns {sorted(extra)}")
    if problems:
        raise AssertionError("plan contract violated: " + "; ".join(problems) + "\n" + plan)
