"""Scale-antipattern linter over Spark's formatted physical plan.

The repo's plan CONTRACTS (``plans/inspect.assert_plan``) pin known
queries to the exact plans we designed. This module is the other
direction: given ANY DataFrame — a user's ad-hoc pipeline, a new suite
query under development — report the patterns that stop working at
100 TB before the job is submitted:

- ``cartesian-product`` / ``nested-loop-join``: a join with no usable
  equi-condition. O(|L|·|R|) row visits; the single most common way a
  working sf0.01 query dies at sf100.
- ``row-python-udf`` (``BatchEvalPython``): row-at-a-time Python in
  the executor loop — 10-100× slower than Arrow-batched, breaks
  whole-stage codegen. ``ArrowEvalPython``/``MapInPandas`` are the
  sanctioned slow path and report as info.
- ``single-partition-exchange``: every row funneled to ONE task. The
  legitimate case (final reduce of an already-partial aggregate) is
  recognized and ignored; the red-flag case — a global window/sort
  over raw rows, e.g. ``row_number()`` with no ``partitionBy`` — is
  exactly the one Spark itself only warns about at RUNTIME, when the
  damage is done.
- ``filter-not-pushed``: a Filter sitting directly on a parquet scan
  that pushed NOTHING down — either a pushable predicate Catalyst
  missed (casts around the column are the usual cause) or an
  expression worth rewriting into a pushable form.
- ``rdd-scan``: the input is driver-materialized (``createDataFrame``
  / RDD) rather than a columnar source — no pushdown, no pruning, no
  stats. Info-level (ubiquitous and fine in tests; wrong at scale).

All detection is static (pre-AQE), conservative, and text-based over
``EXPLAIN FORMATTED`` — the same surface the contracts use, so the
linter needs no Spark internals and survives version drift in the
operators it does not name.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from fenix_spark.plans.inspect import formatted_plan

__all__ = ["Finding", "lint_plan", "assert_clean_plan"]

_SEVERITIES = ("info", "warn", "error")

# final-reduce parents whose SinglePartition exchange moves summary
# rows, not data
_PARTIAL_AGGS = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}


@dataclass(frozen=True)
class Finding:
    code: str
    severity: str  # info | warn | error
    node: str  # "(6) BroadcastNestedLoopJoin" — the plan node flagged
    message: str


def _tree_nodes(plan: str) -> list[tuple[int, int, str, str]]:
    """(plan_id, depth, name, full_line) for every node of the tree
    section, in top-down order."""
    tree = plan.split("\n\n", 1)[0]
    nodes: list[tuple[int, int, str, str]] = []
    # "   :  +- * HashAggregate (5)" → indent "   :  " (3 chars per
    # level), marker "+- " (one more level), optional codegen "* "
    pat = re.compile(
        r"^((?:[ :])*)((?:[+:]- )?)\*?\s?([A-Za-z]\w*)(.*)\((\d+)\)\s*$"
    )
    for line in tree.splitlines():
        m = pat.match(line)
        if not m:
            continue
        indent, marker, name, _mid, pid = m.groups()
        depth = (len(indent) + len(marker)) // 3
        nodes.append((int(pid), depth, name, line.strip()))
    return nodes


def _detail_block(plan: str, plan_id: int) -> str:
    m = re.search(
        rf"\n\({plan_id}\) .*?(?=\n\(\d+\) |\Z)", plan, flags=re.DOTALL
    )
    return m.group(0) if m else ""


def _first_child(nodes, idx):
    pid, depth, _, _ = nodes[idx]
    for j in range(idx + 1, len(nodes)):
        _, d, name, _ = nodes[j]
        if d == depth + 1:
            return name
        if d <= depth:
            break
    return None


# pure row-format adapters a Filter may sit on without changing what
# it filters
_TRANSPARENT = {"ColumnarToRow", "InputAdapter", "WholeStageCodegen"}


def _scan_below(nodes, idx):
    """plan_id of the Scan reached from ``idx`` through transparent
    single-child adapters only, else None."""
    depth = nodes[idx][1]
    for j in range(idx + 1, len(nodes)):
        pid, d, name, _ = nodes[j]
        if d <= depth:
            break
        if d == depth + 1:
            if name == "Scan":
                return pid
            if name in _TRANSPARENT:
                depth, idx = d, j
                continue
            break
    return None


def lint_plan(df: DataFrame, ignore: tuple[str, ...] = ()) -> list[Finding]:
    """All findings for ``df``'s physical plan, worst severity first.
    ``ignore`` drops finding codes the caller has judged acceptable
    for this query (e.g. a deliberate broadcast cross join against a
    one-row frame)."""
    plan = formatted_plan(df)
    nodes = _tree_nodes(plan)
    out: list[Finding] = []

    def add(code, severity, pid, name, message):
        if code not in ignore:
            out.append(Finding(code, severity, f"({pid}) {name}", message))

    for idx, (pid, _depth, name, line) in enumerate(nodes):
        if name == "CartesianProduct":
            add(
                "cartesian-product", "error", pid, name,
                "O(|L|·|R|) cartesian product — no equi-condition and "
                "neither side broadcastable; this does not finish at scale",
            )
        elif name == "BroadcastNestedLoopJoin":
            kind = "Cross" if " Cross " in f" {line} " else "non-equi"
            add(
                "nested-loop-join", "warn", pid, name,
                f"{kind} nested-loop join: every stream row is checked "
                "against the whole broadcast side. Fine against a "
                "provably tiny frame; rewrite to an equi-join (bucketed "
                "range/interval forms) otherwise",
            )
        elif name == "BatchEvalPython":
            add(
                "row-python-udf", "error", pid, name,
                "row-at-a-time Python UDF in the executor loop — use "
                "native expressions, or an Arrow pandas UDF if Python "
                "is genuinely required",
            )
        elif name in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            add(
                "arrow-python", "info", pid, name,
                "Arrow-batched Python stage (the sanctioned slow path): "
                "correct, but excluded from whole-stage codegen — keep "
                "it off the per-row hot path",
            )
        elif name == "Exchange" and "SinglePartition" in _detail_block(plan, pid):
            child = _first_child(nodes, idx)
            if child not in _PARTIAL_AGGS:
                add(
                    "single-partition-exchange", "warn", pid, name,
                    f"all rows of a non-aggregated input ({child}) move "
                    "to ONE task — usually a window/sort with no "
                    "partitionBy; add a partition key or bound the "
                    "input first",
                )
        elif name == "Filter":
            scan_pid = _scan_below(nodes, idx)
            if scan_pid is not None:
                block = _detail_block(plan, scan_pid)
                m = re.search(r"PushedFilters: \[(.*?)\]", block)
                pushed = [
                    p.strip() for p in (m.group(1).split(",") if m else []) if p.strip()
                ]
                real_pushed = [p for p in pushed if not p.startswith("IsNotNull")]
                cond_m = re.search(r"Condition : (.*)", _detail_block(plan, pid))
                residual = re.sub(
                    r"isnotnull\([^)]*\)", "", cond_m.group(1) if cond_m else ""
                )
                nontrivial = bool(re.search(r"[<>=]|[A-Za-z]\w*\(", residual))
                if "Scan parquet" in block and not real_pushed and nontrivial:
                    add(
                        "filter-not-pushed", "warn", pid, name,
                        "a Filter sits directly on a parquet scan that "
                        "pushed no real predicate down (IsNotNull only) — "
                        "the scan reads every row group; rewrite the "
                        "predicate into a pushable form if possible",
                    )
        elif name == "Scan" and "ExistingRDD" in line:
            add(
                "rdd-scan", "info", pid, name,
                "driver-materialized input (createDataFrame/RDD): no "
                "pushdown, pruning, or stats — fine for literals and "
                "tests, wrong for data at scale",
            )
    out.sort(key=lambda f: -_SEVERITIES.index(f.severity))
    return out


def assert_clean_plan(
    df: DataFrame,
    allow: tuple[str, ...] = (),
    fail_at: str = "warn",
) -> list[Finding]:
    """Raise AssertionError (listing every finding plus the plan) if
    any finding at or above ``fail_at`` severity remains after
    ``allow``; return the sub-threshold findings otherwise."""
    if fail_at not in _SEVERITIES:
        raise ValueError(f"fail_at must be one of {_SEVERITIES}")
    findings = lint_plan(df, ignore=allow)
    floor = _SEVERITIES.index(fail_at)
    bad = [f for f in findings if _SEVERITIES.index(f.severity) >= floor]
    if bad:
        lines = "\n".join(f"  [{f.severity}] {f.code} at {f.node}: {f.message}" for f in bad)
        raise AssertionError(
            f"plan lint failed ({len(bad)} finding(s)):\n{lines}\n"
            + formatted_plan(df)
        )
    return findings
