"""URL / host normalization — the crawl-pipeline scalar family.

The reference ingests crawled listings keyed by page URL (its crawler
builds page links by string concatenation and re-crawls mutated URLs
as new rows — `crawler/alonhadat.py` semantics), so a corpus
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
  two-level suffixes). For the full public-suffix list use
  :func:`with_registered_domain` with a ``suffixes_df`` — the long
  tail is DATA loaded into a broadcast-joined one-column table
  (refresh the table, not the code); without one it falls back to
  the same literal list.

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

from real_estate_bigdata_spark.util import local_frame

#: params dropped by canonicalization: utm_* prefix family + the two
#: common click-id params. A param is its full "name=value" token.
TRACKING_PARAM_PATTERN = r"^(utm_|fbclid(=|$)|gclid(=|$))"

#: hard cap on suffix-table size: the published public-suffix list is
#: ~10k rules; the table is collected driver-side (count-probed first)
#: so the per-label-count rule frames join as broadcast LocalRelations
MAX_SUFFIX_RULES = 200_000

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


def _guard_internal_cols(df, names):
    """Raise when ``df`` already carries one of the internal working
    column names an operator is about to inject — a pre-existing column
    would be silently overwritten then dropped (the dbb8fae ``out_col``
    guard class, extended to the internal names per VERDICT r13 #3)."""
    clash = sorted(set(names) & set(df.columns))
    if clash:
        raise ValueError(
            f"frame already carries internal working column(s) {clash}; "
            "rename them before calling"
        )


def _parse_psl_rules(
    suffixes_df, suffix_col: str, max_rules: int
) -> dict[int, list[tuple[str, bool, bool, bool]]]:
    """Collect + parse a public-suffix table into per-label-count rule
    rows ``(tail, is_normal, is_wildcard, is_exception)``.

    PSL grammar (publicsuffix.org): a plain rule is its own suffix;
    ``*.example`` matches any single label in the wildcard position
    (stored under its FIXED tail ``example``); ``!city.example``
    exempts that exact tail from a covering wildcard. Comment (``//``)
    and blank lines are skipped so a raw list file loads as-is.

    The table is bounded by contract (the published list is ~10k
    rules) and by ``max_rules``, checked with a count-only probe
    BEFORE the collect commits.
    """
    n_rules = suffixes_df.count()
    if n_rules > max_rules:
        raise ValueError(
            f"suffix table has {n_rules} rows > max_rules={max_rules}; "
            "the public-suffix list is ~10k rules — this frame is "
            "probably not a suffix table (a category blocklist belongs "
            "in domain_blocklist's blocklist_df, which is never collected)"
        )
    parsed: dict[tuple[int, str], list[bool]] = {}
    for row in (
        suffixes_df.select(
            F.lower(F.trim(F.col(suffix_col))).alias("rule")
        ).collect()
    ):
        rule = row.rule
        if not rule or rule.startswith("//"):
            continue
        is_exc = rule.startswith("!")
        if is_exc:
            rule = rule[1:]
        is_wild = rule.startswith("*.")
        if is_wild:
            rule = rule[2:]
        if not rule or rule == "*":
            continue  # the implicit default rule — already the fallback
        k = rule.count(".") + 1
        flags = parsed.setdefault((k, rule), [False, False, False])
        if is_exc:
            flags[2] = True
        elif is_wild:
            flags[1] = True
        else:
            flags[0] = True
    by_k: dict[int, list[tuple[str, bool, bool, bool]]] = {}
    for (k, tail), (norm, wild, exc) in sorted(parsed.items()):
        by_k.setdefault(k, []).append((tail, norm, wild, exc))
    return by_k


def domain_blocklist(
    df,
    blocklist_df,
    url_col: str = "url",
    mode: str = "tag",
    domain_col: str | None = None,
    list_domain_col: str = "domain",
    category_col: str = "category",
    out_col: str = "block_category",
    suffixes_df=None,
):
    """Apply a UT1-style domain blocklist (the RefinedWeb/C4 web-
    curation stage the reference's single-portal crawl never needed —
    north-star ABSENT category): each row's REGISTRABLE domain is
    matched against ``blocklist_df`` (``list_domain_col`` +
    ``category_col`` rows, e.g. the Université Toulouse 1 category
    lists), and the row is either tagged (``mode="tag"``: ``out_col``
    carries the category, NULL when clean — the auditable form every
    accounting readout composes with) or dropped (``mode="drop"``:
    blocked rows removed; no new column).

    Matching is by :func:`registered_domain` (``sub.example.com``
    matches a listed ``example.com`` — public blocklists list
    registrable domains), with the blocklist side lowered and
    deduplicated; a domain listed under several categories resolves
    to the lexicographically FIRST (deterministic, engine-independent).
    ``domain_col`` skips the URL parse when the frame already carries
    the registered domain; ``suffixes_df`` threads through to
    :func:`with_registered_domain` for the public-suffix-as-data form.

    Scale shape: ONE BROADCAST left join keyed on the registered
    domain (forced — the join side is the blocklist, and even the
    full UT1 adult list is ~4M short strings, 10s of MB, inside the
    broadcast comfort zone; a stats-less list frame would otherwise
    sort-merge and shuffle the whole corpus). The corpus side stays
    map-only; the only exchange is the blocklist-side category dedup,
    bounded by the list. NULL /
    unparseable URLs have no domain and are never blocked (visible,
    not guessed — quarantine them upstream via canonicalize_url)."""
    if mode not in ("tag", "drop"):
        raise ValueError(f"mode must be 'tag' or 'drop', got {mode!r}")
    if mode == "tag" and out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    _guard_internal_cols(df, ["__dom", "__bl_dom", "__bl_cat"])
    bl = (
        blocklist_df.select(
            F.lower(F.col(list_domain_col)).alias("__bl_dom"),
            F.col(category_col).cast("string").alias("__bl_cat"),
        )
        .where(F.col("__bl_dom").isNotNull() & (F.col("__bl_dom") != ""))
        .groupBy("__bl_dom")
        .agg(F.min("__bl_cat").alias("__bl_cat"))  # deterministic pick
    )
    if domain_col is None:
        tagged = with_registered_domain(
            df, url_col, out_col="__dom", suffixes_df=suffixes_df
        )
    else:
        tagged = df.withColumn("__dom", F.lower(F.col(domain_col)))
    joined = tagged.join(
        F.broadcast(bl), tagged["__dom"] == bl["__bl_dom"], "left"
    ).drop("__dom", "__bl_dom")
    if mode == "drop":
        return joined.filter(F.col("__bl_cat").isNull()).drop("__bl_cat")
    return joined.withColumnRenamed("__bl_cat", out_col)


def with_registered_domain(
    df,
    url_col: str = "url",
    out_col: str = "domain",
    suffixes_df=None,
    suffix_col: str = "suffix",
    max_rules: int = MAX_SUFFIX_RULES,
):
    """``df`` plus an ``out_col`` registered-domain column — the
    DataFrame-level form of :func:`registered_domain`, with the
    public-suffix set AS DATA (r13, VERDICT r12 task #6: the full
    public-suffix list is ~10k entries and changes monthly — that's a
    table you refresh, not code you redeploy).

    * ``suffixes_df=None`` — map-only pure-Column path using the
      built-in :data:`DEFAULT_MULTI_SUFFIXES` literal (identical to
      ``registered_domain``; zero exchanges).
    * ``suffixes_df`` given — FULL PSL rule semantics (r14, VERDICT
      r13 task #2: the r13 form keyed on the last-two-label tail only,
      so 3+-label entries and wildcard/exception rules silently did
      nothing). Rules are parsed per the publicsuffix.org algorithm:
      plain rules of ANY label count (``pvt.k12.ma.us`` promotes to a
      five-label registrable domain), ``*.kawasaki.jp`` wildcards
      (one host label stands in for ``*``), and ``!city.kawasaki.jp``
      exceptions (which prevail over the covering wildcard and make
      that exact tail registrable). Prevailing rule = the matching
      exception if any, else the match with the most labels, else the
      implicit ``*`` default (registrable = last two labels).
      One DIVERGENCE from strict PSL, shared with the literal path: a
      host that IS a public suffix (``co.uk``, ``city.kawasaki.jp``
      under the wildcard-only list) passes through lowered instead of
      yielding NULL — the cap/mixture key must cover every row, and a
      bare-suffix host groups with itself.

    Scale shape: the suffix table is collected driver-side (count-only
    probe against ``max_rules`` BEFORE the collect — the PSL is ~10k
    rules; a corpus-sized frame here is a usage error and raises) and
    re-emitted as one broadcast LocalRelation per distinct rule label
    count, so the corpus side is a chain of at most ~5 broadcast hash
    joins — map-only, ZERO exchanges in the registered plan at any
    corpus scale.

    Parity: with a table holding exactly the default 16 suffixes the
    two paths are row-identical
    (tests/test_url.py::test_suffix_table_matches_literal_on_defaults).
    NULL/unparseable URLs yield NULL, both paths.
    """
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists")
    url = F.col(url_col)
    if suffixes_df is None:
        return df.withColumn(out_col, registered_domain(url))
    by_k = _parse_psl_rules(suffixes_df, suffix_col, max_rules)
    ks = sorted(by_k)
    internal = ["__host"]
    for k in ks:
        internal += [
            f"__psl{k}_t", f"__psl{k}_tail", f"__psl{k}_norm",
            f"__psl{k}_wild", f"__psl{k}_exc",
        ]
    _guard_internal_cols(df, internal)
    host = F.regexp_replace(_lower_host(url), r"^www\.", "")
    out = df.withColumn("__host", host)
    labels = F.split(F.col("__host"), r"\.")
    n = F.size(labels)
    spark = df.sparkSession
    for k in ks:
        # Arrow-backed local frame: each broadcast build otherwise runs
        # a Python worker to unpickle the rule rows on every execution
        rules_k = local_frame(
            spark,
            by_k[k],
            f"__psl{k}_tail string, __psl{k}_norm boolean, "
            f"__psl{k}_wild boolean, __psl{k}_exc boolean",
        )
        tail_k = F.concat_ws(
            ".", F.slice(labels, F.greatest(n - k + 1, F.lit(1)), F.lit(k))
        )
        out = out.withColumn(f"__psl{k}_t", tail_k)
        out = out.join(
            F.broadcast(rules_k),
            out[f"__psl{k}_t"] == rules_k[f"__psl{k}_tail"],
            "left",
        )
    # prevailing rule -> registrable-domain label count: a matching
    # exception (longest first) yields its own label count; otherwise
    # the most-labeled match (wildcard = fixed tail + 1) plus one;
    # otherwise the implicit "*" default (two labels)
    flag = lambda c: F.coalesce(F.col(c), F.lit(False))  # noqa: E731
    candidates = [F.lit(2)]
    for k in ks:
        candidates.append(
            F.when(flag(f"__psl{k}_norm") & (n >= k), F.lit(k + 1))
            .otherwise(F.lit(0))
        )
        candidates.append(
            F.when(flag(f"__psl{k}_wild") & (n >= k + 1), F.lit(k + 2))
            .otherwise(F.lit(0))
        )
    reg = F.greatest(*candidates)
    exc_chain = None
    for k in sorted(ks, reverse=True):
        cond = flag(f"__psl{k}_exc") & (n >= k)
        exc_chain = (
            F.when(cond, F.lit(k))
            if exc_chain is None
            else exc_chain.when(cond, F.lit(k))
        )
    if exc_chain is not None:
        reg = exc_chain.otherwise(reg)
    reg = F.least(reg, n)  # host IS (or is inside) a suffix: pass through
    domain = (
        F.when(
            F.col("__host").isNull() | (F.col("__host") == ""),
            F.lit(None).cast("string"),
        )
        .otherwise(F.concat_ws(".", F.slice(labels, n - reg + 1, reg)))
    )
    return out.withColumn(out_col, domain).drop(*internal)
