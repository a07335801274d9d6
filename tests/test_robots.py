"""robots.txt: the spec's own matching examples as oracles (RFC 9309
§2.2.2 / Google's published table), group selection, and the Spark
rules+filter surface."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from fenix_spark.functions.robots import (
    parse_robots,
    robots_filter,
    robots_rules,
    rule_regex,
)

BODY = """
# crawler policy
User-agent: *
Disallow: /private/
Allow: /private/ok.html
Disallow: /*.php
Disallow: /fish*.sh$

User-agent: fenixbot
Disallow: /fenix-only/
"""


def test_group_selection():
    star = parse_robots(BODY, agent="someone-else")
    assert (False, "/private/") in star and (True, "/private/ok.html") in star
    fenix = parse_robots(BODY, agent="fenixbot/1.0")
    assert fenix == [(False, "/fenix-only/")]


def test_empty_disallow_means_no_rule():
    assert parse_robots("User-agent: *\nDisallow:", agent="x") == []


def test_rule_regex_translation():
    assert rule_regex("/fish") == "^/fish"
    assert rule_regex("/*.php") == "^/.*\\.php"
    assert rule_regex("/fish*.sh$") == "^/fish.*\\.sh$"


@pytest.mark.parametrize(
    "pattern,path,matches",
    [
        ("/fish", "/fish", True),
        ("/fish", "/fishing", True),          # prefix semantics
        ("/fish", "/Fish", False),            # case-sensitive
        ("/fish*", "/fish/salmon.html", True),
        ("/fish/", "/fish", False),
        ("/*.php", "/index.php", True),
        ("/*.php", "/index.php?x=1", True),
        ("/*.php$", "/index.php", True),
        ("/*.php$", "/index.php?x=1", False),  # end anchor
        ("/fish*.php", "/fishheads/catfish.php?p=1", True),
    ],
)
def test_spec_matching_table(pattern, path, matches):
    assert bool(re.search(rule_regex(pattern), path)) == matches


def test_robots_filter_end_to_end(spark):
    robots = spark.createDataFrame(
        [
            ("a.example", BODY),
            ("b.example", "User-agent: *\nDisallow: /"),
            ("broken.example", None),
        ],
        "host string, robots string",
    )
    rules = robots_rules(robots, agent="genericbot")
    urls = spark.createDataFrame(
        [
            ("https://a.example/public/page.html",),
            ("https://a.example/private/secret.html",),
            ("https://a.example/private/ok.html",),   # allow beats disallow: longer
            ("https://a.example/app/index.php",),
            ("https://b.example/anything",),
            ("https://c.example/no-robots-here",),    # host without rules
            ("https://broken.example/x",),            # null robots body
        ],
        "url string",
    )
    got = {r["url"]: r["robots_allowed"] for r in robots_filter(urls, rules).collect()}
    assert got["https://a.example/public/page.html"] is True
    assert got["https://a.example/private/secret.html"] is False
    assert got["https://a.example/private/ok.html"] is True
    assert got["https://a.example/app/index.php"] is False
    assert got["https://b.example/anything"] is False
    assert got["https://c.example/no-robots-here"] is True
    assert got["https://broken.example/x"] is True


def test_duplicate_urls_stay_duplicated(spark):
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /x")], "host string, robots string"
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [("https://a.example/x",)] * 3, "url string"
    )
    out = robots_filter(urls, rules).collect()
    assert len(out) == 3 and all(r["robots_allowed"] is False for r in out)


def test_agent_specific_group_via_filter(spark):
    robots = spark.createDataFrame([("a.example", BODY)], "host string, robots string")
    rules = robots_rules(robots, agent="fenixbot")
    urls = spark.createDataFrame(
        [("https://a.example/fenix-only/x",), ("https://a.example/private/x",)],
        "url string",
    )
    got = {r["url"]: r["robots_allowed"] for r in robots_filter(urls, rules).collect()}
    # the fenixbot group REPLACES *, so /private/ is fair game
    assert got["https://a.example/fenix-only/x"] is False
    assert got["https://a.example/private/x"] is True


def test_groups_for_same_agent_merge():
    body = (
        "User-agent: *\nDisallow: /a/\n\n"
        "User-agent: *\nDisallow: /b/\n"
    )
    rules = parse_robots(body, agent="x")
    assert (False, "/a/") in rules and (False, "/b/") in rules


def test_gzip_member_magic_straddles_chunks(tmp_path):
    """Streaming member reads must survive a member boundary landing
    exactly on (or one byte past) a read-chunk boundary."""
    from fenix_spark.sources.warc_source import _gzip_members, write_warc

    path = str(tmp_path / "m.warc.gz")
    write_warc(path, [
        {"type": "response", "url": f"https://e.x/{i}", "http": True,
         "payload": b"x" * (37 + i), "content_type": "text/plain"}
        for i in range(5)
    ])
    want = list(_gzip_members(path))
    assert len(want) == 5
    # tiny chunks force every straddle alignment to occur
    for chunk in (1, 2, 3, 7):
        assert list(_gzip_members(path, chunk=chunk)) == want


def test_robots_filter_plan_no_cartesian(spark):
    robots = spark.createDataFrame([("a.example", BODY)], "host string, robots string")
    rules = robots_rules(robots)
    urls = spark.createDataFrame([("https://a.example/x",)], "url string")
    plan = robots_filter(urls, rules)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_agent_product_token_prefix_matching():
    """RFC 9309: a group's User-agent value matches when it is a
    case-insensitive PREFIX of the crawler's product token — substring
    containment ("bot" matching anything containing "bot") selects
    wrong groups and flips allow/disallow."""
    body = (
        "User-agent: bot\nDisallow: /bot-only/\n\n"
        "User-agent: *\nDisallow: /star/\n"
    )
    # "bot" is NOT a prefix of "googlebot" — the * group applies
    assert parse_robots(body, agent="googlebot") == [(False, "/star/")]
    # but it IS a prefix of "bot-fancy/2.0"'s product token "bot-fancy"?
    # no: "bot" is a prefix of "bot-fancy", so the named group applies
    assert parse_robots(body, agent="BoT-Fancy/2.0".lower()) == [(False, "/bot-only/")]
    # longer prefix wins over shorter
    body2 = (
        "User-agent: googlebot\nDisallow: /g/\n\n"
        "User-agent: googlebot-news\nDisallow: /gn/\n\n"
        "User-agent: *\nDisallow: /all/\n"
    )
    assert parse_robots(body2, agent="googlebot-news") == [(False, "/gn/")]
    assert parse_robots(body2, agent="googlebot") == [(False, "/g/")]
    assert parse_robots(body2, agent="otherbot") == [(False, "/all/")]


def test_robots_filter_real_id_col_shuffled_upstream(spark):
    """Winner grouping keyed on the caller's real id — deterministic
    under task retry even when the upstream is a shuffle (MIDs are
    only consistent within one plan; the fallback is documented)."""
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n")],
        "host string, robots string",
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [(i, f"https://a.example/private/{'ok' if i % 2 else 'x'}{i}")
         for i in range(64)],
        "doc_id long, url string",
    ).repartition(8, "url")  # shuffle upstream of the filter
    out = robots_filter(urls, rules, id_col="doc_id").collect()
    assert len(out) == 64
    for r in out:
        assert r["robots_allowed"] is (r["doc_id"] % 2 == 1)


def test_robots_filter_plan_uses_aggregate_not_window(spark):
    """The per-row winner is a max_by hash aggregate (map-side partial
    agg), not a row_number window sort."""
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /x")], "host string, robots string"
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame([(1, "https://a.example/x")], "doc_id long, url string")
    plan = robots_filter(urls, rules, id_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
