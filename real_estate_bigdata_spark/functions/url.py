"""URL / host normalization — the crawl-pipeline scalar family.

The reference ingests crawled listings keyed by page URL (its crawler
builds page links by string concatenation and re-crawls mutated URLs
as new rows — `crawler/alonhadat_crawler.py` semantics), so a corpus
built from many crawls needs ONE canonical identity per page before
any dedup or per-domain capping can work: `http://WWW.Example.com:80/
p/1?utm_source=feed&id=1#top` and `http://example.com/p/1?id=1` are
the same page.

Two pure-Column scalars (zero Python, zero shuffles — map-only
expressions that inline into whatever scan uses them):

* :func:`canonicalize_url` — lowercase scheme+host, strip the
  fragment, strip default ports (``:80`` for http, ``:443`` for
  https — a non-default port like ``:8080``, or ``:80`` under https,
  is KEPT), drop tracking query params (``utm_*``, ``fbclid``,
  ``gclid``) preserving the order of the rest, strip a leading
  ``www.``, and drop the ``?`` when nothing survives. Built on
  ``F.parse_url`` (Hive/Java URL part extraction, JVM-side) plus
  array algebra over the query string.
* :func:`registered_domain` — the capping/mixture key: lowered host,
  ``www.`` stripped, reduced to its registrable suffix — last two
  labels, or last three when the last two are a multi-part public
  suffix (``co.uk``-class; the built-in list covers the common
  two-level suffixes and is overridable — a full public-suffix-list
  integration is a data file, not a code change).

Feeding :func:`~real_estate_bigdata_spark.operators.sampling.cap_per_group`
with ``registered_domain`` is the standard per-domain crawl cap; both
scalars are ANSI-expressible (regex + list ops), so the driver query
``q_url_canonical`` carries a full DuckDB oracle.

Scale shape: pure expressions — predicate pushdown, column pruning and
whole-stage codegen all apply unchanged; nothing here adds an exchange.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: params dropped by canonicalization: utm_* prefix family + the two
#: common click-id params. A param is its full "name=value" token.
TRACKING_PARAM_PATTERN = r"^(utm_|fbclid(=|$)|gclid(=|$))"

#: common two-level public suffixes under which the registrable domain
#: is three labels (site.co.uk), not two (co.uk). Deliberately small:
#: the long tail belongs in a broadcast-joined suffix table, not code.
DEFAULT_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.vn", "com.mx", "co.in", "co.kr",
)


def _lower_host(url: Column) -> Column:
    """Lowered hostname (no port) of ``url`` — NULL when unparseable."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def canonicalize_url(
    url: Column,
    strip_www: bool = True,
    tracking_pattern: str = TRACKING_PARAM_PATTERN,
) -> Column:
    """Canonical form of ``url`` (see module doc for the rule set).

    NULL in -> NULL out; a URL ``F.parse_url`` cannot parse a host
    from also yields NULL (crawl inputs are messy — an unparseable
    URL has no canonical identity and should be quarantined, not
    guessed at).
    """
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = _lower_host(url)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    # parse_url has no PORT part — take it from AUTHORITY's tail
    port = F.regexp_extract(
        F.parse_url(url, F.lit("AUTHORITY")), r":(\d+)$", 1
    )
    keep_port = (
        (port != "")
        & ~((proto == "http") & (port == "80"))
        & ~((proto == "https") & (port == "443"))
    )
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(tracking_pattern),
        ),
        "&",
    )
    return F.when(
        proto.isNotNull() & host.isNotNull() & (host != ""),
        F.concat(
            proto,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
        ),
    )


def registered_domain(
    url: Column,
    multi_suffixes: tuple[str, ...] = DEFAULT_MULTI_SUFFIXES,
) -> Column:
    """Registrable domain of ``url``'s host — the per-domain cap /
    mixture / overlap key. ``site3.example.co.uk`` -> ``example.co.uk``;
    ``WWW.Site0.example.com`` -> ``example.com``; a bare two-label (or
    one-label) host passes through lowered. NULL/unparseable -> NULL.
    """
    host = F.regexp_replace(_lower_host(url), r"^www\.", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_multi = (
        last2.isin(*multi_suffixes) if multi_suffixes else F.lit(False)
    )
    return F.when(host.isNull() | (host == ""), F.lit(None).cast("string")) \
        .when(n <= 2, host) \
        .when(is_multi & (n >= 3), last3) \
        .otherwise(last2)
