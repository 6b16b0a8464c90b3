"""URL canonicalization + registered-domain scalars (r12): rule-set
edge cases on crafted URLs, and the map-only plan pin (the scalars are
pure Column expressions — adding them to a scan must not add an
exchange or a Python crossing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.functions.url import (
    canonicalize_url,
    registered_domain,
)


def _one(spark, url, expr):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(expr(F.col("url")).alias("v")).collect()[0].v


CANON_CASES = [
    # lowercase scheme+host, strip www./fragment/default port/utm
    (
        "HTTP://WWW.Site0.Example.COM:80/p/1?utm_source=f&id=1&utm_campaign=x#top",
        "http://site0.example.com/p/1?id=1",
    ),
    # :443 is default only for https
    ("https://a.example.com:443/x", "https://a.example.com/x"),
    ("http://a.example.com:443/x", "http://a.example.com:443/x"),
    # :80 is default only for http
    ("https://a.example.com:80/x", "https://a.example.com:80/x"),
    # real port survives
    ("http://a.example.com:8080/x?z=1", "http://a.example.com:8080/x?z=1"),
    # tracking-only query drops the '?' entirely
    ("https://a.example.com/x?utm_medium=a", "https://a.example.com/x"),
    # non-tracking param order is preserved; gclid/fbclid dropped
    (
        "http://a.example.com/x?z=1&gclid=abc&y=2&fbclid=q",
        "http://a.example.com/x?z=1&y=2",
    ),
    # param NAMED like a prefix of utm_ stays; exact-name rule for clids
    ("http://a.example.com/x?utmost=1", "http://a.example.com/x?utmost=1"),
    ("http://a.example.com/x?gclid2=1", "http://a.example.com/x?gclid2=1"),
    # empty path/query/fragment
    ("https://A.Example.com", "https://a.example.com"),
    # www only stripped as a LEADING label
    ("http://wwwx.example.com/p", "http://wwwx.example.com/p"),
]


DOMAIN_CASES = [
    ("http://WWW.Site0.Example.COM/p", "example.com"),
    ("https://a.b.site.example.co.uk/x", "example.co.uk"),
    ("https://deep.sub.example.org/x", "example.org"),
    ("http://example.net/x", "example.net"),
    ("http://localhost/x", "localhost"),
    # two-label host that IS a multi-part suffix passes through
    ("http://co.uk/x", "co.uk"),
]


class TestCanonicalizeUrl:
    @pytest.mark.parametrize("url,want", CANON_CASES)
    def test_rules(self, spark, url, want):
        assert _one(spark, url, canonicalize_url) == want

    def test_null_and_unparseable(self, spark):
        assert _one(spark, None, canonicalize_url) is None
        assert _one(spark, "not a url", canonicalize_url) is None

    def test_keep_www_opt_out(self, spark):
        got = _one(
            spark,
            "http://WWW.a.example.com/p",
            lambda c: canonicalize_url(c, strip_www=False),
        )
        assert got == "http://www.a.example.com/p"

    def test_idempotent(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "url string")
        out = df.select(
            canonicalize_url(F.col("url")).alias("c1"),
            canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
        ).collect()
        assert all(r.c1 == r.c2 for r in out)


class TestRegisteredDomain:
    @pytest.mark.parametrize("url,want", DOMAIN_CASES)
    def test_rules(self, spark, url, want):
        assert _one(spark, url, registered_domain) == want

    def test_null_and_unparseable(self, spark):
        assert _one(spark, None, registered_domain) is None
        assert _one(spark, "%%%", registered_domain) is None

    def test_custom_suffix_list(self, spark):
        got = _one(
            spark,
            "http://a.example.co.uk/x",
            lambda c: registered_domain(c, multi_suffixes=()),
        )
        assert got == "co.uk"  # without the list, naive last-two


class TestPlan:
    def test_map_only_no_python(self, spark):
        """Both scalars inline into the scan: no exchange, no
        Arrow/Python eval node in the physical plan."""
        df = spark.range(100).select(
            F.concat(F.lit("https://s"), F.col("id"), F.lit(".example.com/p"))
            .alias("url")
        )
        out = df.select(
            canonicalize_url(F.col("url")).alias("c"),
            registered_domain(F.col("url")).alias("d"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "Arrow" not in plan
