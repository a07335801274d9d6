"""robots.txt compliance for crawl curation — parse per-host robots
bodies into a RULES TABLE, then filter a URL corpus with the
longest-match semantics of the robots exclusion spec (RFC 9309 /
Google's reference implementation):

- groups are runs of ``User-agent`` lines followed by Allow/Disallow
  rules; the group with the LONGEST user-agent token matching our
  agent applies, else the ``*`` group;
- among matching rules the LONGEST pattern wins; on a tie, Allow
  wins; no matching rule (or no robots for the host) = allowed;
- patterns support ``*`` (any run) and a trailing ``$`` end anchor.

Spark shape: parsing is one Arrow-batched pass over (host, body)
rows → a small (host, allow, pattern, pattern_len, regex) table.
Filtering is an equi-join on host + per-row ``rlike`` against the
translated regex + one window picking the longest match per URL —
hosts without robots take the default-allow branch of a left join,
and URL text never shuffles beyond the host join.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_rules", "robots_filter", "rule_regex"]


def _agent_token(line_value: str) -> str:
    return line_value.strip().split()[0].lower() if line_value.strip() else ""


def parse_robots(body: str, agent: str = "*") -> list:
    """``[(allow: bool, pattern: str), ...]`` — the rule group that
    applies to ``agent`` per the longest-agent-match rule. Pure
    function (the python reference for the Spark pass)."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    rules_started = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if rules_started:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, rules_started = [], [], False
            cur_agents.append(_agent_token(val))
        elif key in ("allow", "disallow"):
            rules_started = True
            if val:
                cur_rules.append((key == "allow", val))
            elif key == "disallow":
                pass  # empty Disallow: allow-all, i.e. no rule
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    # per-group best agent-match length, then MERGE every group tied
    # at the overall best (RFC 9309: multiple groups for the same
    # agent combine — two "User-agent: *" blocks act as one)
    scored: list[tuple[int, list[tuple[bool, str]]]] = []
    for agents, rules in groups:
        match_len = -1
        for a in agents:
            if a == "*":
                match_len = max(match_len, 0)
            elif a and a in agent:
                match_len = max(match_len, len(a))
        if match_len >= 0:
            scored.append((match_len, rules))
    if not scored:
        return []
    best_len = max(s for s, _ in scored)
    out: list[tuple[bool, str]] = []
    for s, rules in scored:
        if s == best_len:
            out.extend(rules)
    return out


def rule_regex(pattern: str) -> str:
    """Translate a robots pattern to an anchored Java/RE2-safe regex:
    ``*`` → ``.*``, trailing ``$`` → end anchor, rest literal."""
    anchor_end = pattern.endswith("$")
    if anchor_end:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchor_end else "")


def robots_rules(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots",
    agent: str = "*",
) -> DataFrame:
    """(host, allow, pattern, pattern_len, regex) — one row per rule
    of the agent-applicable group of each host's robots body."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            hosts, allows, pats, lens, regexes = [], [], [], [], []
            for host, body in zip(pdf["__h"], pdf["__b"]):
                if body is None:
                    continue
                for allow, pat in parse_robots(str(body), agent):
                    hosts.append(host)
                    allows.append(bool(allow))
                    pats.append(pat)
                    lens.append(len(pat))
                    regexes.append(rule_regex(pat))
            yield pd.DataFrame(
                {"host": hosts, "allow": allows, "pattern": pats,
                 "pattern_len": lens, "regex": regexes}
            )

    src = df.select(F.col(host_col).alias("__h"), F.col(body_col).alias("__b"))
    return src.mapInPandas(
        gen, "host string, allow boolean, pattern string, pattern_len int, regex string"
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """``urls`` + a ``robots_allowed`` column. Matching is host
    equi-join → per-rule ``rlike`` on the URL's path(+query) → longest
    match wins, allow beats disallow on ties; unmatched URLs and
    hosts without rules are allowed (the spec default)."""
    path = F.coalesce(
        F.concat(
            F.parse_url(F.col(url_col), F.lit("PATH")),
            F.coalesce(
                F.concat(F.lit("?"), F.parse_url(F.col(url_col), F.lit("QUERY"))),
                F.lit(""),
            ),
        ),
        F.lit("/"),
    )
    u = (
        urls.withColumn("__uid", F.monotonically_increasing_id())
        .withColumn("__host", F.lower(F.parse_url(F.col(url_col), F.lit("HOST"))))
        .withColumn("__path", F.when(path == "", "/").otherwise(path))
    )
    r = rules.select(
        F.lower(F.col("host")).alias("__host"), "allow", "pattern_len", "regex"
    )
    joined = u.join(r, "__host", "left").withColumn(
        "__hit", F.col("regex").isNotNull() & F.expr("__path rlike regex")
    )
    # per-ROW winner (a synthetic uid, not the url columns — duplicate
    # input rows must stay duplicated in the output)
    w = Window.partitionBy("__uid").orderBy(
        F.col("__hit").desc(),
        F.col("pattern_len").desc(),
        F.col("allow").desc(),
    )
    ranked = joined.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.where(F.col("__rn") == 1)
        .withColumn(
            "robots_allowed",
            F.when(F.col("__hit").isNull() | ~F.col("__hit"), F.lit(True)).otherwise(
                F.col("allow")
            ),
        )
        .select(*urls.columns, "robots_allowed")
    )
