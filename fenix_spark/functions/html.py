"""HTML → text extraction and boilerplate signals — the first step of
every web-crawl training pipeline (WET-style text extraction), as pure
scan-local Catalyst expressions. No parser library, no Python in the
loop: at 100 TB the extraction IS the scan, so it must stay inside
whole-stage codegen.

Fidelity contract: this is the regex tier of extraction (what
CommonCrawl's WET files are), not a DOM parser — malformed nesting is
handled by the tag-stripping regexes' locality, CDATA is treated as
text, and the numeric-entity long tail beyond the common named set is
left intact (counted by ``entity_residue`` so callers can route pages
needing the heavy decoder — a `mapInPandas` + html.unescape fallback —
without paying Python for the 99% case).

Boilerplate signals follow the classic density heuristics
(Kohlschütter et al., WSDM 2010): link density, tag density, and
text-to-markup ratio, all computable from the same scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Block-level elements whose boundaries become newlines so paragraph
# structure survives tag stripping.
_BLOCK_TAGS = (
    "p|div|br|hr|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|td|th|table|thead|tbody|"
    "section|article|header|footer|nav|aside|blockquote|pre|form"
)

_NAMED_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    # &amp; LAST: decoding it earlier would double-decode "&amp;lt;"
    ("&amp;", "&"),
]


def strip_invisible(html: Column) -> Column:
    """Drop content that renders as nothing: script/style/noscript/
    template blocks (with their text), comments, doctype, CDATA
    wrappers."""
    c = F.regexp_replace(html, r"(?is)<head\b[^>]*>.*?</head\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?i)<!doctype[^>]*>", " ")
    c = F.regexp_replace(c, r"(?s)<!\[CDATA\[(.*?)\]\]>", r"$1")
    return c


def html_to_text(html: Column) -> Column:
    """Visible text with paragraph structure: invisible content
    dropped, block-tag boundaries → newlines, remaining tags → spaces,
    common entities decoded, whitespace normalized (runs of spaces/tabs
    collapse; 3+ newlines collapse to a paragraph break)."""
    c = strip_invisible(html)
    c = F.regexp_replace(c, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*/?>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _NAMED_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    # numeric entities (&#66; / &#x44;) are NOT decoded here — they
    # stay literal and show up in entity_residue, which is the routing
    # signal for the heavy (html.unescape) decoder
    c = F.regexp_replace(c, r"[ \t\x0b\f\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n\n")
    # trim() strips spaces only — newlines at the edges need the regex
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def extract_title(html: Column) -> Column:
    """<title> text, entity-decoded, whitespace-collapsed; empty
    string when absent."""
    t = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, rep in _NAMED_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_links(html: Column) -> Column:
    """array<string> of href targets (double- or single-quoted)."""
    dq = F.regexp_extract_all(html, F.lit(r'(?i)<a\b[^>]*\bhref\s*=\s*"([^"]*)"'), F.lit(1))
    sq = F.regexp_extract_all(html, F.lit(r"(?i)<a\b[^>]*\bhref\s*=\s*'([^']*)'"), F.lit(1))
    return F.concat(dq, sq)


def entity_residue(text: Column) -> Column:
    """Count of entity-looking sequences REMAINING after
    html_to_text's common-entity pass — route pages with residue > 0
    to the heavyweight decoder if exact fidelity matters."""
    return F.size(F.regexp_extract_all(text, F.lit(r"&#?\w{1,10};"), F.lit(0)))


def boilerplate_features(html: Column) -> Column:
    """struct(link_density, tag_density, text_ratio) — the
    density signals boilerplate classifiers threshold on:

    - link_density: anchor-text chars / visible-text chars
    - tag_density: tag count / visible-text chars
    - text_ratio: visible-text chars / raw HTML chars

    Navigation/boilerplate pages score high on the first two and low
    on the last; content pages the reverse."""

    def _nz(c: Column) -> Column:
        return F.greatest(c, F.lit(1)).cast("double")

    text = html_to_text(html)
    anchor_text = html_to_text(
        F.array_join(
            F.regexp_extract_all(
                html, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), F.lit(1)
            ),
            " ",
        )
    )
    n_tags = F.size(F.regexp_extract_all(html, F.lit(r"(?s)<[^>]+>"), F.lit(0)))
    return F.struct(
        (F.length(anchor_text) / _nz(F.length(text))).alias("link_density"),
        (n_tags / _nz(F.length(text))).alias("tag_density"),
        (F.length(text) / _nz(F.length(html))).alias("text_ratio"),
    )


def url_parts(url: Column) -> Column:
    """struct(host, registered_domain, path, query) via Spark's
    native parse_url — registered_domain is the last two host labels
    (heuristic; a public-suffix list lookup is a broadcast join the
    caller can add for ccTLD exactness)."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    labels = F.split(host, r"\.")
    reg = F.when(
        F.size(labels) >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host)
    return F.struct(
        host.alias("host"),
        reg.alias("registered_domain"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
    )
