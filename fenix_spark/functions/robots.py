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

from pyspark.sql import DataFrame
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

    # RFC 9309 product-token matching: the crawler identifies by its
    # PRODUCT TOKEN (leading [a-z0-9_-] run of its name), and a group's
    # User-agent value matches when it is a case-insensitive PREFIX of
    # that token ("googlebot" matches crawler "googlebot-news", but
    # "bot" does NOT match "googlebot" — substring containment would
    # select wrong groups and flip allow/disallow for named agents)
    m = re.match(r"[a-z0-9_-]+", agent)
    product_token = m.group(0) if m else ""

    # per-group best agent-match length, then MERGE every group tied
    # at the overall best (RFC 9309: multiple groups for the same
    # agent combine — two "User-agent: *" blocks act as one)
    scored: list[tuple[int, list[tuple[bool, str]]]] = []
    for agents, rules in groups:
        match_len = -1
        for a in agents:
            if a == "*":
                match_len = max(match_len, 0)
            elif a and product_token.startswith(a):
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
    id_col: str | None = None,
) -> DataFrame:
    """``urls`` + a ``robots_allowed`` column. Matching is host
    equi-join → per-rule ``rlike`` on the URL's path(+query) → longest
    match wins, allow beats disallow on ties; unmatched URLs and
    hosts without rules are allowed (the spec default).

    ``id_col`` names a UNIQUE row id in ``urls`` to key the per-row
    winner on (crawl pipelines always have one). When None, a
    ``monotonically_increasing_id`` fallback is used — consistent
    within one plan, but under task retry with a non-deterministic
    upstream (this frame fed by a shuffle) recomputed MIDs can differ
    and the winner grouping silently degrades; pass the real id for
    anything durable. Duplicate input rows stay duplicated only under
    the MID fallback or a genuinely unique id."""
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
    uid = F.col(id_col) if id_col else F.monotonically_increasing_id()
    u = (
        urls.withColumn("__uid", uid)
        .withColumn("__host", F.lower(F.parse_url(F.col(url_col), F.lit("HOST"))))
        .withColumn("__path", F.when(path == "", "/").otherwise(path))
    )
    r = rules.select(
        F.lower(F.col("host")).alias("__host"), "allow", "pattern_len", "regex"
    )
    joined = u.join(r, "__host", "left").withColumn(
        "__hit", F.col("regex").isNotNull() & F.expr("__path rlike regex")
    )
    # per-row winner via max_by on a (hit, pattern_len, allow) sort key
    # — a hash aggregate, NOT a row_number window (no per-group sort,
    # and partial aggregation runs map-side before the shuffle)
    key = F.struct(
        F.coalesce(F.col("__hit"), F.lit(False)).alias("h"),
        F.coalesce(F.col("pattern_len"), F.lit(-1)).alias("l"),
        F.coalesce(F.col("allow"), F.lit(False)).alias("a"),
    )
    payload = F.struct(
        *[F.col(c) for c in urls.columns],
        F.coalesce(F.col("__hit"), F.lit(False)).alias("__hit_w"),
        F.coalesce(F.col("allow"), F.lit(False)).alias("__allow_w"),
    )
    best = joined.groupBy("__uid").agg(F.max_by(payload, key).alias("__w"))
    return best.select(
        *[F.col(f"__w.{c}").alias(c) for c in urls.columns],
        F.when(~F.col("__w.__hit_w"), F.lit(True))
        .otherwise(F.col("__w.__allow_w"))
        .alias("robots_allowed"),
    )
