"""HTML extraction tests: exact expected text on crafted pages,
entity handling order, boilerplate density signals, link/url parsing,
and the python-stdlib cross-check on generated pages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fenix_spark.functions.html import (
    boilerplate_features,
    entity_residue,
    extract_links,
    extract_title,
    html_to_text,
    url_parts,
)


def _one(spark, html, expr):
    return (
        spark.createDataFrame([(html,)], "html string")
        .select(expr(F.col("html")).alias("out"))
        .first()
        .out
    )


def test_basic_page_text(spark):
    page = (
        "<!DOCTYPE html><html><head><title>T</title>"
        "<style>body { color: red }</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Head</h1><p>First para.</p><p>Second <b>bold</b> para.</p>"
        "<!-- a comment --></body></html>"
    )
    got = _one(spark, page, html_to_text)
    # adjacent block boundaries (</h1><p>, </p><p>) are paragraph breaks
    assert got == "Head\n\nFirst para.\n\nSecond bold para."


def test_entities_decode_in_safe_order(spark):
    # &amp;lt; must become literal "&lt;", NOT "<"
    got = _one(spark, "<p>a &amp;lt; b &lt; c &quot;q&quot; &nbsp;&mdash;</p>", html_to_text)
    assert got == 'a &lt; b < c "q" —'


def test_entity_residue_counts_leftovers(spark):
    txt = _one(spark, "<p>&copy; 2024 &#x1F600; plain</p>", html_to_text)
    n = (
        spark.createDataFrame([(txt,)], "t string")
        .select(entity_residue(F.col("t")).alias("n"))
        .first()
        .n
    )
    assert n == 2  # &copy; and &#x1F600; are not in the common set


def test_title_and_links(spark):
    page = (
        "<html><head><title> My&nbsp;Site </title></head>"
        '<body><a href="https://a.example/x">A</a>'
        "<a href='https://b.example/y'>B</a><a name=anchor>no href</a></body>"
    )
    assert _one(spark, page, extract_title) == "My Site"
    assert sorted(_one(spark, page, extract_links)) == [
        "https://a.example/x",
        "https://b.example/y",
    ]


def test_boilerplate_densities_rank_nav_over_article(spark):
    nav = "<div>" + "".join(f'<a href="/{i}">item {i}</a>' for i in range(20)) + "</div>"
    article = "<article><p>" + ("Sentence of real content. " * 40) + "</p></article>"
    df = spark.createDataFrame([(0, nav), (1, article)], "id int, html string")
    rows = {
        r.id: r.f
        for r in df.select("id", boilerplate_features(F.col("html")).alias("f")).collect()
    }
    assert rows[0].link_density > 0.8 and rows[1].link_density == 0.0
    assert rows[0].tag_density > rows[1].tag_density
    assert rows[1].text_ratio > rows[0].text_ratio


def test_url_parts(spark):
    df = spark.createDataFrame(
        [("https://news.example.co/path/a?q=1",), ("http://localhost/x",)],
        "url string",
    )
    rows = [r.u for r in df.select(url_parts(F.col("url")).alias("u")).collect()]
    assert rows[0].host == "news.example.co"
    assert rows[0].registered_domain == "example.co"
    assert rows[0].path == "/path/a" and rows[0].query == "q=1"
    assert rows[1].registered_domain == "localhost"


def test_stdlib_crosscheck_on_generated_pages(spark):
    """html.parser-based reference extraction agrees on pages built
    from a token alphabet (modulo whitespace normalization)."""
    from html.parser import HTMLParser

    class Ref(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.out = []
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style"):
                self.skip = max(0, self.skip - 1)

        def handle_data(self, data):
            if not self.skip:
                self.out.append(data)

    pages = [
        f"<html><body><p>alpha {i}</p><div>beta &amp; gamma</div>"
        f"<script>skip me {i}</script><span>delta</span></body></html>"
        for i in range(25)
    ]
    df = spark.createDataFrame([(p,) for p in pages], "html string")
    got = [r.t for r in df.select(html_to_text(F.col("html")).alias("t")).collect()]
    for page, g in zip(pages, got):
        ref = Ref()
        ref.feed(page)
        want = " ".join(" ".join(ref.out).split())
        assert " ".join(g.split()) == want
