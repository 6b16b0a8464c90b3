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


class TestSuffixTable:
    """r13 (VERDICT r12 task #6): the public-suffix set as DATA — a
    broadcast-joined one-column table instead of the literal list."""

    URLS = [
        "http://WWW.Site0.Example.COM/p",
        "https://a.b.site.example.co.uk/x",
        "https://deep.sub.example.org/x",
        "http://example.net/x",
        "http://localhost/x",
        "http://co.uk/x",
        "https://shop.example.com.au/y",
        None,
        "%%%",
    ]

    def _frame(self, spark):
        return spark.createDataFrame(
            [(i, u) for i, u in enumerate(self.URLS)], "id long, url string"
        )

    def test_suffix_table_matches_literal_on_defaults(self, spark):
        """Table form == literal form when the table holds exactly the
        default 16 suffixes — row-identical, the consolidation-grade
        parity pin."""
        from real_estate_bigdata_spark.functions.url import (
            DEFAULT_MULTI_SUFFIXES,
            with_registered_domain,
        )

        df = self._frame(spark)
        sfx = spark.createDataFrame(
            [(s,) for s in DEFAULT_MULTI_SUFFIXES], "suffix string"
        )
        lit = {
            (r.id, r.domain)
            for r in with_registered_domain(df, "url").collect()
        }
        tab = {
            (r.id, r.domain)
            for r in with_registered_domain(
                df, "url", suffixes_df=sfx
            ).collect()
        }
        assert tab == lit

    def test_fuller_table_resolves_what_the_literal_misses(self, spark):
        """gov.au-class: absent from the deliberately small literal
        list (which therefore returns the bare public suffix — wrong),
        present in a fuller table (which returns the registrable
        three-label domain) — the exact case the data-not-code design
        exists for."""
        from real_estate_bigdata_spark.functions.url import (
            DEFAULT_MULTI_SUFFIXES,
            with_registered_domain,
        )

        df = spark.createDataFrame(
            [(0, "https://portal.agency.gov.au/x")], "id long, url string"
        )
        assert "gov.au" not in DEFAULT_MULTI_SUFFIXES
        lit = with_registered_domain(df, "url").collect()[0].domain
        assert lit == "gov.au"  # the literal list's documented miss
        sfx = spark.createDataFrame(
            [(s,) for s in DEFAULT_MULTI_SUFFIXES + ("gov.au",)],
            "suffix string",
        )
        tab = with_registered_domain(df, "url", suffixes_df=sfx).collect()[
            0
        ].domain
        assert tab == "agency.gov.au"

    def test_duplicate_and_cased_suffix_rows_do_not_fan_out(self, spark):
        """A messy suffix table (dup rows, mixed case, NULL/empty) must
        neither duplicate output rows nor miss the match."""
        from real_estate_bigdata_spark.functions.url import (
            with_registered_domain,
        )

        df = self._frame(spark)
        sfx = spark.createDataFrame(
            [("co.uk",), ("CO.UK",), ("co.uk",), (None,), ("",)],
            "suffix string",
        )
        out = with_registered_domain(df, "url", suffixes_df=sfx)
        rows = out.collect()
        assert len(rows) == len(self.URLS)
        got = {r.id: r.domain for r in rows}
        assert got[1] == "example.co.uk"

    def test_table_form_is_one_broadcast_join_no_python(self, spark):
        from real_estate_bigdata_spark.functions.url import (
            with_registered_domain,
        )
        from real_estate_bigdata_spark.plans import assert_plan

        sfx = spark.createDataFrame([("co.uk",)], "suffix string")
        out = with_registered_domain(
            self._frame(spark), "url", suffixes_df=sfx
        )
        # budget 0 (r14): rules are probed+collected driver-side and
        # re-emitted as broadcast LocalRelations, so the registered
        # plan is pure map-side broadcast joins — zero exchanges at
        # any corpus scale
        assert_plan(out, max_shuffles=0, forbid_python=True)


class TestSuffixTablePsl:
    """r14 (VERDICT r13 task #2): the suffix-table form carries FULL
    publicsuffix.org rule semantics — multi-label plain rules,
    ``*.`` wildcards, ``!`` exceptions — not just 2-label tails."""

    def _domains(self, spark, hosts, rules):
        from real_estate_bigdata_spark.functions.url import (
            with_registered_domain,
        )

        df = spark.createDataFrame(
            [(i, f"https://{h}/x") for i, h in enumerate(hosts)],
            "id long, url string",
        )
        sfx = spark.createDataFrame([(r,) for r in rules], "suffix string")
        rows = with_registered_domain(df, "url", suffixes_df=sfx).collect()
        return [r.domain for r in sorted(rows, key=lambda r: r.id)]

    def test_three_label_plain_rule(self, spark):
        """pvt.k12.ma.us-class: a 4-label plain rule promotes the
        registrable domain to five labels (the r13 form silently
        ignored anything past two labels)."""
        got = self._domains(
            spark,
            ["school.pvt.k12.ma.us", "deep.sub.school.pvt.k12.ma.us",
             "other.ma.us"],
            ["pvt.k12.ma.us", "co.uk"],
        )
        assert got == [
            "school.pvt.k12.ma.us", "school.pvt.k12.ma.us", "ma.us",
        ]

    def test_wildcard_rule(self, spark):
        """*.kawasaki.jp: one host label stands in for the wildcard,
        so the registrable domain is wildcard-suffix + one more."""
        got = self._domains(
            spark,
            ["foo.city.kawasaki.jp", "a.b.city.kawasaki.jp",
             "city.kawasaki.jp",      # IS the public suffix: pass-through
             "kawasaki.jp"],          # wildcard needs a label: default
            ["*.kawasaki.jp"],
        )
        assert got == [
            "foo.city.kawasaki.jp", "b.city.kawasaki.jp",
            "city.kawasaki.jp", "kawasaki.jp",
        ]

    def test_exception_rule_prevails_over_wildcard(self, spark):
        """!city.kawasaki.jp punches through *.kawasaki.jp: that exact
        tail is registrable, while sibling labels stay wildcarded."""
        rules = ["*.kawasaki.jp", "!city.kawasaki.jp"]
        got = self._domains(
            spark,
            ["foo.city.kawasaki.jp", "city.kawasaki.jp",
             "foo.other.kawasaki.jp"],
            rules,
        )
        assert got == [
            "city.kawasaki.jp", "city.kawasaki.jp", "foo.other.kawasaki.jp",
        ]

    def test_longest_match_wins(self, spark):
        """Prevailing-rule selection: the most-labeled match, per the
        PSL algorithm — a 3-label rule beats a 2-label one."""
        got = self._domains(
            spark,
            ["site.living.co.uk", "site.other.co.uk"],
            ["co.uk", "living.co.uk"],
        )
        # living.co.uk (3 labels) prevails for the first host, so its
        # registrable domain is FOUR labels; the second host only
        # matches co.uk and stays at the usual three
        assert got == ["site.living.co.uk", "other.co.uk"]

    def test_comment_and_blank_rows_skipped(self, spark):
        """A raw PSL file loaded line-per-row works as-is: comments,
        blanks, and the bare '*' default rule are ignored."""
        got = self._domains(
            spark,
            ["a.example.co.uk"],
            ["// comment line", "", "*", "co.uk"],
        )
        assert got == ["example.co.uk"]

    def test_plan_stays_map_only_with_all_rule_kinds(self, spark):
        from real_estate_bigdata_spark.functions.url import (
            with_registered_domain,
        )
        from real_estate_bigdata_spark.plans import assert_plan

        df = spark.createDataFrame(
            [(0, "https://foo.city.kawasaki.jp/x")], "id long, url string"
        )
        sfx = spark.createDataFrame(
            [(s,) for s in
             ("co.uk", "pvt.k12.ma.us", "*.kawasaki.jp",
              "!city.kawasaki.jp")],
            "suffix string",
        )
        out = with_registered_domain(df, "url", suffixes_df=sfx)
        assert_plan(out, max_shuffles=0, forbid_python=True)

    def test_oversized_table_raises_before_collect(self, spark):
        from real_estate_bigdata_spark.functions.url import (
            with_registered_domain,
        )

        df = spark.createDataFrame([(0, "https://a.b/x")], "id long, url string")
        sfx = spark.range(10).selectExpr("cast(id as string) as suffix")
        with pytest.raises(ValueError, match="max_rules"):
            with_registered_domain(df, "url", suffixes_df=sfx, max_rules=5)

    def test_internal_column_collision_raises(self, spark):
        """VERDICT r13 #3: a frame already carrying an internal working
        column must raise, not get it silently overwritten+dropped."""
        from real_estate_bigdata_spark.functions.url import (
            domain_blocklist,
            with_registered_domain,
        )

        sfx = spark.createDataFrame([("co.uk",)], "suffix string")
        df = spark.createDataFrame(
            [(0, "https://a.example.co.uk/x", "keep-me")],
            "id long, url string, __host string",
        )
        with pytest.raises(ValueError, match="__host"):
            with_registered_domain(df, "url", suffixes_df=sfx)
        bl = spark.createDataFrame(
            [("bad.com", "adult")], "domain string, category string"
        )
        df2 = spark.createDataFrame(
            [(0, "https://bad.com/x", "keep-me")],
            "id long, url string, __dom string",
        )
        with pytest.raises(ValueError, match="__dom"):
            domain_blocklist(df2, bl)


class TestDomainBlocklist:
    """r13: UT1-style domain blocklist — tag/drop by registered
    domain (subdomains match their listed registrable domain)."""

    ROWS = [
        (0, "https://sub.bad.com/x"),        # subdomain of a listed dom
        (1, "http://WWW.Bad.COM/y"),         # case/www still matches
        (2, "https://good.org/z"),           # clean
        (3, "http://worse.co.uk/w"),         # multi-part suffix listed
        (4, None),                           # no domain -> never blocked
        (5, "%%%"),                          # unparseable -> never blocked
    ]
    BL = [("bad.com", "adult"), ("BAD.com", "ads"), ("worse.co.uk", "gambling"),
          (None, "x"), ("", "y")]

    def _frames(self, spark):
        docs = spark.createDataFrame(self.ROWS, "id long, url string")
        bl = spark.createDataFrame(self.BL, "domain string, category string")
        return docs, bl

    def test_tag_mode(self, spark):
        from real_estate_bigdata_spark.functions.url import domain_blocklist

        docs, bl = self._frames(spark)
        got = {
            r.id: r.block_category
            for r in domain_blocklist(docs, bl).collect()
        }
        # bad.com listed twice -> lexicographically first category
        assert got == {0: "ads", 1: "ads", 2: None, 3: "gambling",
                       4: None, 5: None}

    def test_drop_mode(self, spark):
        from real_estate_bigdata_spark.functions.url import domain_blocklist

        docs, bl = self._frames(spark)
        out = domain_blocklist(docs, bl, mode="drop")
        assert "block_category" not in out.columns
        assert {r.id for r in out.collect()} == {2, 4, 5}

    def test_precomputed_domain_col(self, spark):
        from real_estate_bigdata_spark.functions.url import domain_blocklist

        docs = spark.createDataFrame(
            [(0, "BAD.com"), (1, "good.org")], "id long, dom string"
        )
        bl = spark.createDataFrame([("bad.com", "adult")],
                                   "domain string, category string")
        got = {
            r.id: r.block_category
            for r in domain_blocklist(docs, bl, domain_col="dom").collect()
        }
        assert got == {0: "adult", 1: None}

    def test_validation(self, spark):
        from real_estate_bigdata_spark.functions.url import domain_blocklist

        docs, bl = self._frames(spark)
        with pytest.raises(ValueError, match="mode must be"):
            domain_blocklist(docs, bl, mode="purge")
        with pytest.raises(ValueError, match="already exists"):
            domain_blocklist(docs.withColumn("block_category", F.lit("")), bl)

    def test_drop_equals_tag_filtered(self, spark):
        """Mode consistency: drop-mode output is exactly the tag-mode
        rows whose category is NULL — one definition, two readouts."""
        from real_estate_bigdata_spark.functions.url import domain_blocklist

        docs, bl = self._frames(spark)
        dropped = {r.id for r in domain_blocklist(docs, bl, mode="drop").collect()}
        tagged = {
            r.id
            for r in domain_blocklist(docs, bl).collect()
            if r.block_category is None
        }
        assert dropped == tagged

    def test_no_python_in_plan(self, spark):
        from real_estate_bigdata_spark.functions.url import domain_blocklist
        from real_estate_bigdata_spark.plans import assert_plan

        docs, bl = self._frames(spark)
        # budget 1 exchange: the blocklist-side category dedup
        # aggregate (bounded by the blocklist); the corpus side stays
        # map-only against the broadcast join
        assert_plan(domain_blocklist(docs, bl), max_shuffles=1,
                    forbid_python=True)

    def test_million_row_list_still_broadcasts(self, spark):
        """r14 (VERDICT r13 task #5): at UT1 magnitude — a 1M-row
        category list — the plan must STILL be a BroadcastHashJoin
        with the corpus map-only (the forced broadcast hint survives
        the stats-less 1M-row frame); the wall-clock/memory side is
        the scale battery's domain_blocklist_1m point."""
        from real_estate_bigdata_spark.functions.url import domain_blocklist
        from real_estate_bigdata_spark.plans import assert_plan

        docs, _ = self._frames(spark)
        bl = spark.range(1_000_000).select(
            F.concat(
                F.lit("dom"), F.col("id").cast("string"), F.lit(".com")
            ).alias("domain"),
            F.lit("adult").alias("category"),
        )
        out = domain_blocklist(docs, bl, mode="drop")
        stats = assert_plan(out, max_shuffles=1, forbid_python=True)
        assert stats.broadcast_joins >= 1, stats
        assert stats.sortmerge_joins == 0, stats


class TestProperties:
    """Hypothesis invariants over random well-formed URLs (r12): a
    mutation that canonicalization is DEFINED to erase — scheme/host
    case, a leading www., the scheme's default port, appended utm_*
    params, a fragment — must never change the canonical form or the
    registered domain; and canonicalization is idempotent."""

    def test_mutation_invariance_and_idempotence(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        label = st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1,
            max_size=8,
        ).filter(lambda s: s != "www")  # a literal www. subdomain is
        # stripped from the CLEAN form too — not a mutation invariance
        base = st.fixed_dictionaries(
            {
                "https": st.booleans(),
                "sub": st.lists(label, min_size=0, max_size=2),
                "dom": label,
                "tld": st.sampled_from(["com", "org", "net", "co.uk", "io"]),
                "path": st.lists(label, min_size=0, max_size=3),
                "params": st.lists(
                    st.tuples(label, label), min_size=0, max_size=3
                ),
                "case_mask": st.integers(min_value=0, max_value=7),
                "add_www": st.booleans(),
                "add_default_port": st.booleans(),
                "add_utm": st.booleans(),
                "add_frag": st.booleans(),
            }
        )

        def build(d, mutated):
            scheme = "https" if d["https"] else "http"
            host = ".".join(d["sub"] + [d["dom"]]) + "." + d["tld"]
            url = scheme + "://"
            if mutated:
                if d["case_mask"] & 1:
                    url = url.upper().replace("://", "://")
                if d["add_www"]:
                    host = "www." + host
                if d["case_mask"] & 2:
                    host = host.upper()
            url += host
            if mutated and d["add_default_port"]:
                url += ":443" if d["https"] else ":80"
            url += "/" + "/".join(d["path"]) if d["path"] else "/p"
            q = [f"{k}={v}" for k, v in d["params"]]
            if mutated and d["add_utm"]:
                q = ["utm_source=x"] + q + ["utm_campaign=y"]
            if q:
                url += "?" + "&".join(q)
            if mutated and d["add_frag"]:
                url += "#frag"
            return url

        @settings(
            max_examples=12,
            deadline=None,
            suppress_health_check=[
                HealthCheck.function_scoped_fixture,
                HealthCheck.too_slow,
            ],
        )
        @given(st.lists(base, min_size=1, max_size=10))
        def run(ds):
            rows = [(build(d, False), build(d, True)) for d in ds]
            df = spark.createDataFrame(rows, "clean string, mutated string")
            out = df.select(
                canonicalize_url(F.col("clean")).alias("c0"),
                canonicalize_url(F.col("mutated")).alias("c1"),
                canonicalize_url(canonicalize_url(F.col("mutated"))).alias(
                    "c2"
                ),
                registered_domain(F.col("clean")).alias("d0"),
                registered_domain(F.col("mutated")).alias("d1"),
            ).collect()
            for r in out:
                assert r.c0 is not None
                assert r.c1 == r.c0, (r.c0, r.c1)
                assert r.c2 == r.c1  # idempotent
                assert r.d1 == r.d0

        run()

    def test_suffix_table_parity_property(self, spark):
        """r13: on random well-formed URLs, the broadcast-join suffix
        form must agree with the literal-list form whenever the table
        holds exactly the default suffixes — the TestSuffixTable
        parity pin generalized beyond hand-picked hosts."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from real_estate_bigdata_spark.functions.url import (
            DEFAULT_MULTI_SUFFIXES,
            with_registered_domain,
        )

        label = st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
            min_size=1,
            max_size=8,
        )
        url_s = st.builds(
            lambda subs, dom, tld, www: "http://"
            + ("www." if www else "")
            + ".".join(subs + [dom])
            + "."
            + tld,
            st.lists(label, min_size=0, max_size=2),
            label,
            st.sampled_from(
                ["com", "io", "co.uk", "com.au", "gov.uk", "ne.jp", "uk"]
            ),
            st.booleans(),
        )
        sfx = spark.createDataFrame(
            [(s,) for s in DEFAULT_MULTI_SUFFIXES], "suffix string"
        )

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[
                HealthCheck.function_scoped_fixture,
                HealthCheck.too_slow,
            ],
        )
        @given(st.lists(url_s, min_size=1, max_size=12))
        def run(urls):
            df = spark.createDataFrame(
                [(i, u) for i, u in enumerate(urls)], "id long, url string"
            )
            lit = {
                (r.id, r.domain)
                for r in with_registered_domain(df, "url").collect()
            }
            tab = {
                (r.id, r.domain)
                for r in with_registered_domain(
                    df, "url", suffixes_df=sfx
                ).collect()
            }
            assert tab == lit

        run()


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
