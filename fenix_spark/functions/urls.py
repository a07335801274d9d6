"""URL curation expressions — the web-crawl half of the curation
toolkit (canonicalization, registrable-domain extraction, tracking
hygiene, URL-keyed dedup and domain blocklists).

Everything here is NATIVE Catalyst expressions (``parse_url``, array
ops, regexes) inside whole-stage codegen — canonicalizing 100 TB of
crawl URLs is a pure scan pass with zero shuffles and no Python.

Design notes:

- Canonicalization follows the common crawl-dedup convention:
  lowercase scheme/host, strip the fragment, strip default ports,
  drop tracking parameters (utm_*, gclid/fbclid/msclkid, ref…),
  SORT the surviving query parameters (param order is transport
  noise), and trim a bare trailing slash. Two URLs that differ only
  in those dimensions are the same fetch target for dedup purposes.
- ``registrable_domain`` is a HEURISTIC eTLD+1: exact behavior needs
  the full Public Suffix List (thousands of rules, updated monthly);
  this ships the high-traffic two-label public suffixes (co.uk,
  com.au, …) as a literal set and takes 3 labels there, 2 otherwise.
  The PSL itself is data, not code — pass ``extra_suffixes`` to
  extend the set from a current PSL snapshot at deploy time.
- Domain blocklists compose with the Bloom family: for a list too
  big to broadcast comfortably, build ``bloom_build`` over it once
  and pre-filter with ``bloom_contains_expr`` (one-sided, so no
  blocked domain escapes); the exact semi-join then touches only the
  tiny maybe-set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# high-traffic two-label public suffixes (PSL subset, heuristic — see
# module docstring); keep sorted for readability
_TWO_LABEL_SUFFIXES = (
    "ac.jp", "ac.uk", "co.il", "co.in", "co.jp", "co.kr", "co.nz",
    "co.uk", "co.za", "com.ar", "com.au", "com.br", "com.cn",
    "com.hk", "com.mx", "com.sg", "com.tr", "com.tw", "edu.au",
    "gov.uk", "ne.jp", "net.au", "or.jp", "org.au", "org.uk",
)

# tracking/query noise stripped by canonicalize_url (utm_* handled by
# prefix); everything else must survive — over-stripping merges URLs
# that serve different content
_TRACKING_PARAMS = (
    "gclid", "fbclid", "msclkid", "dclid", "yclid", "igshid",
    "mc_cid", "mc_eid", "ref", "ref_src", "spm", "_ga",
)


def _url_port(url: Column) -> Column:
    """Explicit ``:port`` digits from the authority ('' when absent).
    Spark's ``parse_url(url,'HOST')`` drops EVERY port, so the port
    must be recovered from the raw string: skip scheme, optional
    userinfo (``user:pass@``), a bracketed IPv6 literal or a regular
    host, then the digits after the host's colon. The trailing
    lookahead pins the port to the END of the authority — without it
    the optional userinfo group backtracks and a numeric password
    (``user:1234@host``) reads as a phantom port."""
    return F.regexp_extract(
        url,
        r"^[^:/?#]+://(?:[^/?#@]*@)?(?:\[[^\]/?#]*\]|[^/?#:]*):([0-9]+)(?=[/?#]|$)",
        1,
    )


def url_host(url: Column) -> Column:
    """Lowercased host with any explicit ``:port`` and leading
    ``www.`` retained (strip www in canonicalize, not here — the raw
    host is what DNS-level analyses want). parse_url alone drops the
    port, so it is re-appended from the raw authority."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    port = _url_port(url)
    return F.when(
        host.isNotNull() & (port != ""), F.concat(host, F.lit(":"), port)
    ).otherwise(host)


def registrable_domain(
    url_or_host: Column, extra_suffixes: Sequence[str] = ()
) -> Column:
    """Heuristic eTLD+1 of a URL or bare host: 3 labels when the last
    two form a known public suffix (example.co.uk), else 2
    (sub.example.com → example.com). IP-literal hosts and hosts with
    <2 labels pass through unchanged; null URL → null."""
    host = F.when(
        url_or_host.contains(F.lit("://")), url_host(url_or_host)
    ).otherwise(F.lower(url_or_host))
    # ports never participate in domain identity (example.com:8080 and
    # example.com are the same registrable domain)
    host = F.regexp_replace(host, r":\d+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: a single-label host (localhost) has no -2 index
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    suffixes = F.lit(list(_TWO_LABEL_SUFFIXES) + [s.lower() for s in extra_suffixes])
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    take = F.when(F.array_contains(suffixes, last2), F.lit(3)).otherwise(F.lit(2))
    return (
        F.when(host.isNull() | is_ip | (n <= take), host)
        .otherwise(F.concat_ws(".", F.slice(labels, n - take + 1, take)))
    )


def _clean_query(url: Column) -> Column:
    """Surviving query params, sorted: split on &, drop empties and
    tracking params (utm_* by prefix, the literal list by name)."""
    raw = F.parse_url(url, F.lit("QUERY"))
    parts = F.filter(
        F.split(F.coalesce(raw, F.lit("")), "&"),
        lambda p: (p != F.lit(""))
        & ~F.lower(p).startswith("utm_")
        & ~F.array_contains(
            F.lit(list(_TRACKING_PARAMS)),
            F.lower(F.element_at(F.split(p, "=", 2), 1)),
        ),
    )
    return F.array_join(F.array_sort(parts), "&")


def canonicalize_url(url: Column, strip_www: bool = True) -> Column:
    """Crawl-dedup canonical form (module docstring lists the exact
    normalizations). Pure expression — run it in the scan."""
    scheme = F.lower(F.coalesce(F.parse_url(url, F.lit("PROTOCOL")), F.lit("http")))
    host = F.lower(F.parse_url(url, F.lit("HOST")))  # parse_url drops ports
    # keep an explicit port UNLESS it is the scheme default (:80 for
    # http, :443 for https) — non-default ports are distinct fetch
    # targets and must not merge under dedup
    port = _url_port(url)
    is_default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    host = F.when(
        (port != "") & ~is_default, F.concat(host, F.lit(":"), port)
    ).otherwise(host)
    if strip_www:
        # only when labels remain after the strip (www.com stays)
        host = F.when(
            host.startswith("www.") & (F.size(F.split(host, r"\.")) > 2),
            F.substring(host, 5, 2_000_000),
        ).otherwise(host)
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path == "/", F.lit("")).otherwise(path)
    query = _clean_query(url)
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
        )
    )


def url_dedup_keep_list(
    df: DataFrame, url_col: str, id_col: str, strip_www: bool = True
) -> DataFrame:
    """(id, canonical_url, keep) — one survivor (min id) per canonical
    URL. The shuffle carries (canonical string, id); for very long
    URLs swap the key for ``hash60(canonical)`` upstream — same
    pattern as text exact-dedup.

    An uncanonicalizable URL (no parseable host — canonicalize yields
    null) falls back to its RAW string as the dedup key: grouping
    every null-canonical row together would silently merge all
    malformed URLs into one "duplicate" cluster."""
    canon = F.coalesce(
        canonicalize_url(F.col(url_col), strip_www=strip_www), F.col(url_col)
    )
    with_canon = df.select(
        F.col(id_col).alias("id"), canon.alias("canonical_url")
    )
    w_min = with_canon.groupBy("canonical_url").agg(F.min("id").alias("__keep_id"))
    return (
        with_canon.join(w_min, "canonical_url")
        .select(
            "id",
            "canonical_url",
            (F.col("id") == F.col("__keep_id")).alias("keep"),
        )
    )


def domain_block_filter(
    df: DataFrame,
    url_col: str,
    blocked: DataFrame,
    blocked_col: str = "domain",
    extra_suffixes: Sequence[str] = (),
) -> DataFrame:
    """Rows whose REGISTRABLE domain is not in the blocklist — a
    blocked domain blocks every subdomain (the standard blocklist
    semantics; matching raw hosts instead would let evil.example.com
    slip a block on example.com). One broadcast anti-join on the
    normalized domain; for blocklists beyond broadcast size,
    pre-filter with the Bloom family first (module docstring)."""
    dom = registrable_domain(F.col(url_col), extra_suffixes)
    keys = blocked.select(
        registrable_domain(F.col(blocked_col), extra_suffixes).alias("__bdom")
    ).distinct()
    return (
        df.withColumn("__dom", dom)
        .join(F.broadcast(keys), F.col("__dom") == F.col("__bdom"), "left_anti")
        .drop("__dom")
    )
