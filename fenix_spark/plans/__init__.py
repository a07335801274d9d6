"""Physical-plan inspection and assertion helpers.

The reference has no optimizer to inspect (SURVEY.md §4 — every plan
is a hard-coded function body); in the Spark rebuild the *physical
design* is the optimizer work, so this package makes plan properties
testable: filters reached the parquet scan, projections pruned the
read schema, small sides broadcast, shuffles stay at the intended
count, codegen spans cover the hot path. tests/test_plans.py pins
these for every headline query — a regression that de-optimizes a plan
fails CI even though results stay correct.
"""

from fenix_spark.plans.inspect import (
    assert_plan,
    broadcast_join_count,
    formatted_plan,
    partition_filters,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_count,
)

__all__ = [
    "assert_plan",
    "broadcast_join_count",
    "formatted_plan",
    "partition_filters",
    "pushed_filters",
    "read_schema_columns",
    "shuffle_count",
    "wholestage_codegen_count",
]
