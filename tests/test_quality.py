"""quantile_floor semantics: exact cutoff placement, keep direction,
NULL-metric drop, approx-vs-exact agreement, and the broadcast
scalar plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators.quality import quantile_floor


def _df(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, m double")


def test_floor_keeps_top_mass(spark):
    df = _df(spark, [float(v) for v in range(1, 11)])  # 1..10
    # P10 of 1..10 (linear interpolation) = 1.9 -> keeps 2..10
    out = quantile_floor(df, "m", q=0.1)
    assert {r.m for r in out.collect()} == {float(v) for v in range(2, 11)}
    below = quantile_floor(df, "m", q=0.1, keep="below")
    assert {r.m for r in below.collect()} == {1.0}
    assert out.columns == df.columns


def test_null_metrics_dropped_and_ignored(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 10.0)], "id long, m double"
    )
    out = quantile_floor(df, "m", q=0.5)
    assert {r.id for r in out.collect()} == {3}  # median of {5,10}=7.5
    with pytest.raises(ValueError):
        quantile_floor(df, "m", q=1.5)
    with pytest.raises(ValueError):
        quantile_floor(df, "m", keep="sideways")


def test_nan_metrics_dropped_and_ignored(spark):
    """NaN >= any cutoff is true in Spark, so an unguarded NaN would
    both inflate the quantile and always clear the floor — it must be
    dropped like NULL (module-wide NaN contract, ADVICE r5 #3)."""
    nan = float("nan")
    df = spark.createDataFrame(
        [(1, 5.0), (2, nan), (3, 10.0), (4, nan)], "id long, m double"
    )
    out = quantile_floor(df, "m", q=0.5)
    assert {r.id for r in out.collect()} == {3}  # median of {5,10}=7.5
    below = quantile_floor(df, "m", q=0.5, keep="below")
    assert {r.id for r in below.collect()} == {1}


def test_approx_close_to_exact_on_real_metric(spark):
    from real_estate_bigdata_spark.functions.text import token_count
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    scored = docs.select("doc_id", token_count(F.col("text")).alias("m"))
    exact = quantile_floor(scored, "m", q=0.1).count()
    approx = quantile_floor(scored, "m", q=0.1, approx=True).count()
    assert abs(exact - approx) <= 0.05 * scored.count()


def test_plan_is_broadcast_scalar(spark):
    from real_estate_bigdata_spark.plans import assert_plan
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    assert_plan(
        quantile_floor(docs, F.col("n_chars"), q=0.1),
        max_sortmerge_joins=0,
        min_broadcast_joins=1,
        forbid_python=True,
    )


class TestCorpusHealthReport:
    def test_counts_every_invariant(self, spark):
        from real_estate_bigdata_spark.operators.quality import corpus_health_report

        rows = [
            (1, "hello"),
            (2, ""),         # empty
            (3, "   "),      # whitespace-only (blank, not empty)
            (4, None),       # NULL
            (4, "dup id"),   # duplicate id
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = corpus_health_report(df).first()
        assert r.n_rows == 5
        assert r.n_distinct_ids == 4
        assert r.n_dup_ids == 1
        assert r.n_null_text == 1
        assert r.n_empty_text == 1
        assert r.n_blank_text == 1
        assert r.min_chars == 0 and r.max_chars == 6
        # avg over non-NULL lengths: (5 + 0 + 3 + 6) / 4
        assert abs(r.avg_chars - 3.5) < 1e-9

    def test_single_aggregate_pass(self, spark):
        from real_estate_bigdata_spark.operators.quality import corpus_health_report
        from real_estate_bigdata_spark.plans import assert_plan
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        # count-distinct expands to two exchanges (partial distinct +
        # final) — still one scan, no join, no Python
        stats = assert_plan(
            corpus_health_report(docs), max_shuffles=2, forbid_python=True
        )
        assert stats.scans == 1, stats


class TestMetricHistogram:
    def test_bins_edges_under_overflow(self, spark):
        from real_estate_bigdata_spark.operators.quality import metric_histogram

        rows = [(float(v),) for v in [-5, 0, 1, 9, 10, 15, 19, 20, 99]]
        rows += [(None,), (float("nan"),)]
        df = spark.createDataFrame(rows, "m double")
        out = {r.bin: r for r in metric_histogram(df, "m", 0, 20, n_bins=2).collect()}
        assert out[0].n == 1 and out[0].lo_edge is None       # -5 underflows
        assert out[1].n == 3 and out[1].lo_edge == 0.0 and out[1].hi_edge == 10.0
        assert out[2].n == 3 and out[2].lo_edge == 10.0 and out[2].hi_edge == 20.0
        assert out[3].n == 2 and out[3].hi_edge is None       # 20, 99 overflow
        assert sum(r.n for r in out.values()) == 9    # NULL + NaN excluded

    def test_one_shuffle_no_python(self, spark):
        from real_estate_bigdata_spark.operators.quality import metric_histogram
        from real_estate_bigdata_spark.plans import assert_plan
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        assert_plan(
            metric_histogram(docs, F.length("text"), 0, 600, n_bins=20),
            max_shuffles=1,
            forbid_python=True,
        )

    def test_rejects_bad_bounds(self, spark):
        import pytest

        from real_estate_bigdata_spark.operators.quality import metric_histogram

        df = spark.createDataFrame([(1.0,)], "m double")
        with pytest.raises(ValueError):
            metric_histogram(df, "m", 5, 5)
        with pytest.raises(ValueError):
            metric_histogram(df, "m", 0, 10, n_bins=0)


def test_histogram_matches_duckdb_on_unrepresentable_width(spark, duck):
    # width (hi-lo)/n = 0.7/3 is not exactly representable; the operator
    # computes the SAME IEEE expression as the oracle (ADVICE r4), so
    # boundary values land in the same bin on both engines.
    from real_estate_bigdata_spark.operators.quality import metric_histogram

    vals = [0.1 + 0.7 * k / 21 for k in range(22)] + [0.0999, 0.8001]
    df = spark.createDataFrame([(v,) for v in vals], "m double")
    got = {
        r.bin: r.n for r in metric_histogram(df, "m", 0.1, 0.8, n_bins=3).collect()
    }
    duck.execute("CREATE OR REPLACE TEMP TABLE _h(v DOUBLE)")
    duck.executemany("INSERT INTO _h VALUES (?)", [(v,) for v in vals])
    want = dict(
        duck.execute(
            """
            SELECT CASE WHEN v < 0.1::DOUBLE THEN 0
                        WHEN v >= 0.8::DOUBLE THEN 4
                        ELSE floor((v - 0.1::DOUBLE)
                                   / ((0.8::DOUBLE - 0.1::DOUBLE) / 3))::BIGINT + 1
                   END AS bin, count(*) FROM _h GROUP BY bin
            """
        ).fetchall()
    )
    assert got == want


def test_linear_quality_scores_semantics(spark):
    """Hand-computed: weights {a:0.5, b:-0.25}, bias 0.25, normalized
    sigmoid. OOV weighs 0; NULL text -> NULL; empty doc scores bias."""
    import math

    from real_estate_bigdata_spark.operators.quality import linear_quality_scores

    docs = spark.createDataFrame(
        [
            (1, "a a b zz"),  # raw = .25 + (.5+.5-.25+0)/4 = 0.4375
            (2, ""),  # 0 tokens -> raw = bias = 0.25
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in linear_quality_scores(
            docs, {"a": 0.5, "b": -0.25}, bias=0.25
        ).collect()
    }
    assert out[1].n_tokens == 4
    assert abs(out[1].score - 1 / (1 + math.exp(-0.4375))) < 1e-12
    assert out[2].n_tokens == 0
    assert abs(out[2].score - 1 / (1 + math.exp(-0.25))) < 1e-12
    assert out[3].n_tokens is None and out[3].score is None


def test_linear_quality_scores_raw_unnormalized(spark):
    from real_estate_bigdata_spark.operators.quality import linear_quality_scores

    docs = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    row = linear_quality_scores(
        docs, {"a": 0.5, "b": -0.25}, normalize=False, sigmoid=False
    ).collect()[0]
    assert row.score == 0.75  # exact binary fractions


def test_linear_quality_scores_map_only_plan(spark):
    """The weight map is a plan literal: whole operator is a map-only
    projection — zero exchanges, zero joins, zero Python."""
    from real_estate_bigdata_spark.operators.quality import linear_quality_scores
    from real_estate_bigdata_spark.plans import assert_plan
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    stats = assert_plan(
        linear_quality_scores(docs, {"join": 0.5, "slow": -1.0}),
        forbid_python=True,
    )
    assert stats.shuffles == 0, stats


def test_linear_quality_scores_rejects_empty_weights(spark):
    import pytest as _pytest

    from real_estate_bigdata_spark.operators.quality import linear_quality_scores
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    with _pytest.raises(ValueError):
        linear_quality_scores(docs, {})


class TestMetricBuckets:
    def test_terciles_on_known_values(self, spark):
        from real_estate_bigdata_spark.operators.quality import metric_buckets

        # 9 values 1..9: cutoffs at p=1/3 -> 3.666667, p=2/3 -> 6.333333
        df = _df(spark, [float(v) for v in range(1, 10)])
        out = {r.id: r.bucket for r in metric_buckets(df, "m").collect()}
        assert out == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 3, 7: 3, 8: 3}

    def test_null_metric_gets_null_bucket_and_shapes_nothing(self, spark):
        from real_estate_bigdata_spark.operators.quality import metric_buckets

        df = _df(spark, [1.0, None, 2.0, 3.0, None, 4.0, 5.0, 6.0])
        rows = {r.id: r.bucket for r in metric_buckets(df, "m").collect()}
        assert rows[1] is None and rows[4] is None
        # cutoffs computed over the 6 non-null values only
        non_null = [rows[i] for i in (0, 2, 3, 5, 6, 7)]
        assert non_null == [1, 1, 2, 2, 3, 3]

    def test_nan_metric_gets_null_bucket_and_shapes_nothing(self, spark):
        """NaN sorts greater than any double in Spark, so an unguarded
        NaN would both skew every percentile cutoff and land in the top
        bucket (ADVICE r5 #3) — it must behave exactly like NULL."""
        from real_estate_bigdata_spark.operators.quality import metric_buckets

        nan = float("nan")
        df = _df(spark, [1.0, nan, 2.0, 3.0, nan, 4.0, 5.0, 6.0])
        rows = {r.id: r.bucket for r in metric_buckets(df, "m").collect()}
        assert rows[1] is None and rows[4] is None
        # cutoffs computed over the 6 finite values only — identical
        # buckets to the NULL-metric case above
        assert [rows[i] for i in (0, 2, 3, 5, 6, 7)] == [1, 1, 2, 2, 3, 3]

    def test_ties_land_in_lower_bucket(self, spark):
        from real_estate_bigdata_spark.operators.quality import metric_buckets

        # all-equal metric: both cutoffs equal the value, m > cut is
        # false everywhere -> everything in bucket 1
        df = _df(spark, [5.0] * 9)
        assert {r.bucket for r in metric_buckets(df, "m").collect()} == {1}

    def test_bucket_counts_balanced_on_real_metric(self, spark):
        from real_estate_bigdata_spark.operators.quality import metric_buckets
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        out = metric_buckets(
            docs.select("doc_id", F.col("n_chars").cast("double").alias("m")),
            "m",
            n_buckets=4,
        )
        counts = {r.bucket: r.n for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
        n = sum(counts.values())
        for b in (1, 2, 3, 4):
            # equal-frequency within tie tolerance
            assert counts[b] >= n // 8, counts

    def test_approx_agrees_with_exact_on_real_metric(self, spark):
        from real_estate_bigdata_spark.operators.quality import metric_buckets
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
            "doc_id", F.col("n_chars").cast("double").alias("m")
        )
        exact = {r.doc_id: r.bucket for r in metric_buckets(docs, "m").collect()}
        approx = {r.doc_id: r.bucket for r in metric_buckets(docs, "m", approx=True).collect()}
        agree = sum(1 for k in exact if exact[k] == approx[k])
        assert agree / len(exact) > 0.95

    def test_plan_is_broadcast_scalar_no_global_sort(self, spark):
        from real_estate_bigdata_spark.operators.quality import metric_buckets
        from real_estate_bigdata_spark.plans import assert_plan
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
            "doc_id", F.col("n_chars").cast("double").alias("m")
        )
        plan = metric_buckets(docs, "m")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert "Sort [" not in plan  # never a global ntile sort
        assert_plan(metric_buckets(docs, "m"), forbid_python=True)

    def test_rejects_bad_n(self, spark):
        from real_estate_bigdata_spark.operators.quality import metric_buckets

        df = _df(spark, [1.0, 2.0])
        with pytest.raises(ValueError):
            metric_buckets(df, "m", n_buckets=1)


class TestDistributionDrift:
    def test_identical_snapshots_zero_psi(self, spark):
        from real_estate_bigdata_spark.operators.quality import distribution_drift
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        out = distribution_drift(docs, docs, "n_chars", 0, 600, n_bins=10).collect()
        assert len(out) == 12  # 10 bins + under + overflow
        assert all(r.psi_contrib == 0.0 for r in out)
        assert all(r.n_old == r.n_new for r in out)

    def test_planted_shift_detected_in_right_bins(self, spark):
        from real_estate_bigdata_spark.operators.quality import distribution_drift

        old = spark.createDataFrame(
            [(i, 10.0) for i in range(100)], "id long, m double"
        )
        new = spark.createDataFrame(
            [(i, 90.0) for i in range(100)], "id long, m double"
        )
        rows = {
            r.bin: r
            for r in distribution_drift(old, new, "m", 0, 100, n_bins=10).collect()
        }
        # all old mass in bin 2 ([10,20)), all new in bin 10 ([90,100))
        assert rows[2].n_old == 100 and rows[2].n_new == 0
        assert rows[10].n_old == 0 and rows[10].n_new == 100
        psi = sum(r.psi_contrib for r in rows.values())
        assert psi > 0.25  # far past the act threshold
        # contributions are positive where mass moved, ~0 elsewhere
        assert rows[2].psi_contrib > 0 and rows[10].psi_contrib > 0
        assert abs(rows[5].psi_contrib) < 1e-9

    def test_empty_sides_and_nulls_smoothed(self, spark):
        from real_estate_bigdata_spark.operators.quality import distribution_drift

        old = spark.createDataFrame([(1, None)], "id long, m double")
        new = spark.createDataFrame([(1, 50.0)], "id long, m double")
        rows = distribution_drift(old, new, "m", 0, 100, n_bins=4).collect()
        # NULL metric contributes nothing; smoothing keeps every share
        # finite and every contribution defined
        assert len(rows) == 6
        assert all(r.share_old is not None and r.psi_contrib is not None for r in rows)
        assert sum(r.n_old for r in rows) == 0
        assert sum(r.n_new for r in rows) == 1

    def test_nothing_corpus_sized_moves(self, spark):
        from real_estate_bigdata_spark.operators.quality import distribution_drift
        from real_estate_bigdata_spark.plans import assert_plan
        from real_estate_bigdata_spark.schema import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        stats = assert_plan(
            distribution_drift(docs, docs, "n_chars", 0, 600), forbid_python=True
        )
        # two bounded-key histogram shuffles + the tiny bin-frame joins
        assert stats.shuffles <= 6, stats


class TestGroupedDrift:
    def test_per_group_psi_isolates_the_shifted_source(self, spark):
        from real_estate_bigdata_spark.operators.quality import distribution_drift

        old = spark.createDataFrame(
            [(i, "stable", 50.0) for i in range(100)]
            + [(200 + i, "drifty", 10.0) for i in range(100)],
            "id long, src string, m double",
        )
        new = spark.createDataFrame(
            [(i, "stable", 50.0) for i in range(100)]
            + [(200 + i, "drifty", 90.0) for i in range(100)],
            "id long, src string, m double",
        )
        out = distribution_drift(old, new, "m", 0, 100, n_bins=10, group_col="src")
        psi = {}
        for r in out.collect():
            psi[r.src] = psi.get(r.src, 0.0) + r.psi_contrib
        assert psi["stable"] < 0.01
        assert psi["drifty"] > 0.25

    def test_group_absent_from_one_side_gets_uniform_smoothing(self, spark):
        from real_estate_bigdata_spark.operators.quality import distribution_drift

        old = spark.createDataFrame(
            [(1, "gone", 10.0), (2, "kept", 20.0)], "id long, src string, m double"
        )
        new = spark.createDataFrame(
            [(3, "kept", 20.0), (4, None, 30.0)], "id long, src string, m double"
        )
        rows = distribution_drift(old, new, "m", 0, 100, n_bins=4, group_col="src").collect()
        srcs = {r.src for r in rows}
        assert srcs == {"gone", "kept"}  # NULL group excluded
        gone = [r for r in rows if r.src == "gone"]
        assert len(gone) == 6  # 4 bins + under/overflow, all defined
        assert all(r.psi_contrib is not None for r in gone)
        assert sum(r.n_new for r in gone) == 0


def test_grouped_drift_validates_and_metricless_group_absent(spark):
    """Review fixes: the grouped path validates bounds like the
    ungrouped one, and a group with no non-NULL metrics anywhere has no
    distribution to compare — absent from the output (the group set
    derives from the histogram aggregates, not a third corpus scan)."""
    from real_estate_bigdata_spark.operators.quality import distribution_drift

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "metricless", None)], "id long, src string, m double"
    )
    with pytest.raises(ValueError):
        distribution_drift(df, df, "m", 100, 0, group_col="src")
    with pytest.raises(ValueError):
        distribution_drift(df, df, "m", 0, 100, n_bins=0, group_col="src")
    srcs = {
        r.src
        for r in distribution_drift(df, df, "m", 0, 100, group_col="src").collect()
    }
    assert srcs == {"a"}


class TestGopherQualityFilter:
    """Gopher rule battery (Rae et al. 2021 A1.1) — hand-pinned rule
    arithmetic, each rule's rejection path, NULL/empty contract, and a
    map-only plan (the filter must push into codegen over the scan)."""

    GOOD = (
        "The quick brown fox likes to be of service and that is known "
        "to have been said with confidence by many observers over the "
        "years in numerous long reports about animal behavior and "
        "related topics of study that we all know and enjoy reading "
        "during quiet evenings at home with family members and friends "
        "who visit often"
    )

    def _run(self, spark, rows, **kw):
        from real_estate_bigdata_spark.operators.quality import (
            gopher_quality_filter,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r.doc_id: r for r in gopher_quality_filter(df, **kw).collect()
        }

    def test_rule_arithmetic_and_verdicts(self, spark):
        out = self._run(
            spark,
            [
                (1, self.GOOD),
                (2, "# # # ..."),
                (3, None),
                (4, ""),
                (5, "• one\n• two\n• three"),
                (6, "alpha beta. the gamma...\nends here too...\nplain"),
            ],
        )
        r1 = out[1]
        assert r1.n_words == 57 and r1.gopher_pass is True
        assert r1.n_required_stopwords == 8
        assert r1.symbol_word_ratio == 0.0 and r1.alpha_word_ratio == 1.0
        r2 = out[2]
        # 3 '#' + 1 '...' over 4 words; the single line ends with ...
        assert r2.symbol_word_ratio == 1.0
        assert r2.ellipsis_line_ratio == 1.0
        assert r2.alpha_word_ratio == 0.0 and r2.gopher_pass is False
        r3 = out[3]
        assert all(
            getattr(r3, f) is None
            for f in (
                "n_words", "mean_word_len", "symbol_word_ratio",
                "bullet_line_ratio", "ellipsis_line_ratio",
                "alpha_word_ratio", "n_required_stopwords", "gopher_pass",
            )
        )
        r4 = out[4]
        assert r4.n_words == 0 and r4.gopher_pass is False
        assert out[5].bullet_line_ratio == 1.0
        assert out[6].ellipsis_line_ratio == round(2 / 3, 6)

    def test_unicode_ellipsis_counts_in_symbol_ratio(self, spark):
        """r8 review: '…' (U+2026) must count toward the symbol-to-word
        ratio exactly like its ASCII spelling — a byte-identical doc
        must not evade the rule by using the Unicode form (which the
        ellipsis-LINE rule already recognized)."""
        out = self._run(
            spark,
            [(1, "alpha… beta… gamma… delta…"), (2, "alpha... beta... gamma... delta...")],
        )
        assert out[1].symbol_word_ratio == 1.0
        assert out[1].symbol_word_ratio == out[2].symbol_word_ratio
        # the line rule still sees both forms
        assert out[1].ellipsis_line_ratio == 1.0

    def test_each_threshold_rejects(self, spark):
        base = dict(
            min_words=5, max_words=1000, min_mean_word_len=1.0,
            max_mean_word_len=20.0, max_symbol_word_ratio=1.0,
            max_bullet_line_ratio=1.0, max_ellipsis_line_ratio=1.0,
            min_alpha_word_ratio=0.0, min_required_stopwords=0,
        )
        rows = [(1, self.GOOD)]
        assert self._run(spark, rows, **base)[1].gopher_pass is True
        for knock in (
            dict(min_words=100), dict(max_words=10),
            dict(min_mean_word_len=9.0), dict(max_mean_word_len=2.0),
            dict(min_alpha_word_ratio=1.01), dict(min_required_stopwords=9),
        ):
            kw = {**base, **knock}
            assert self._run(spark, rows, **kw)[1].gopher_pass is False, knock

    def test_map_only_plan(self, spark):
        from real_estate_bigdata_spark.operators.quality import (
            gopher_quality_filter,
        )
        from real_estate_bigdata_spark.plans.audit import plan_stats

        docs = spark.createDataFrame(
            [(1, self.GOOD)], "doc_id long, text string"
        )
        stats = plan_stats(gopher_quality_filter(docs))
        assert stats.shuffles == 0
        assert stats.python_stages == 0


class TestC4QualityFilter:
    """C4 cleaning battery (Raffel et al. 2020 §2.2) — hand-pinned line
    keep/drop arithmetic, each page rule's rejection path, the cleaned
    text rewrite, NULL/empty contract, and a map-only plan."""

    GOOD = (
        "The first sentence here is long enough to keep easily today.\n"
        "Another good sentence with plenty of words stands right here.\n"
        "A third full sentence closes out the page quite nicely now."
    )

    def _run(self, spark, rows, **kw):
        from real_estate_bigdata_spark.operators.quality import (
            c4_quality_filter,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r.doc_id: r for r in c4_quality_filter(df, **kw).collect()}

    def test_line_rules_and_clean_text(self, spark):
        out = self._run(
            spark,
            [
                (1, self.GOOD),
                # no terminal punct -> dropped; short -> dropped;
                # javascript -> dropped; survivor kept verbatim
                (2, "no terminal punctuation on this line\n"
                    "Too short.\n"
                    "Please enable JavaScript to view this content today.\n"
                    "Only this surviving line has words and ends with it."),
                (3, None),
                (4, ""),
            ],
        )
        r1 = out[1]
        assert r1.n_lines == 3 and r1.n_kept_lines == 3
        assert r1.n_sentences == 3 and r1.c4_pass is True
        assert r1.clean_text == self.GOOD
        r2 = out[2]
        assert r2.n_lines == 4 and r2.n_kept_lines == 1
        assert r2.clean_text == (
            "Only this surviving line has words and ends with it."
        )
        assert r2.n_sentences == 1 and r2.c4_pass is False
        r3 = out[3]
        assert all(
            getattr(r3, f) is None
            for f in (
                "n_lines", "n_kept_lines", "n_sentences",
                "has_curly_brace", "has_lorem_ipsum", "has_blocklisted",
                "clean_text", "c4_pass",
            )
        )
        r4 = out[4]
        assert r4.n_kept_lines == 0 and r4.c4_pass is False
        assert r4.clean_text == ""

    def test_each_page_rule_rejects(self, spark):
        rows = [
            (1, self.GOOD),
            (2, self.GOOD + "\nvar x = { 'code': 1 };"),
            (3, self.GOOD + "\nLorem Ipsum dolor sit amet."),
            (4, self.GOOD + "\nbuy cheap widgets now please."),
        ]
        out = self._run(spark, rows, blocklist=("CHEAP widgets",))
        assert out[1].c4_pass is True
        assert out[2].has_curly_brace is True and out[2].c4_pass is False
        assert out[3].has_lorem_ipsum is True and out[3].c4_pass is False
        assert out[4].has_blocklisted is True and out[4].c4_pass is False
        # min_sentences gate
        strict = self._run(spark, [(1, self.GOOD)], min_sentences=4)
        assert strict[1].c4_pass is False

    def test_terminal_punct_relaxation(self, spark):
        rows = [(1, "five plain words sit here\nshort one")]
        out = self._run(spark, rows)
        assert out[1].n_kept_lines == 0
        relaxed = self._run(
            spark, rows, require_terminal_punct=False, min_sentences=1
        )
        assert relaxed[1].n_kept_lines == 1
        assert relaxed[1].clean_text == "five plain words sit here"
        assert relaxed[1].c4_pass is True

    def test_map_only_plan(self, spark):
        from real_estate_bigdata_spark.operators.quality import (
            c4_quality_filter,
        )
        from real_estate_bigdata_spark.plans.audit import plan_stats

        docs = spark.createDataFrame(
            [(1, self.GOOD)], "doc_id long, text string"
        )
        stats = plan_stats(c4_quality_filter(docs, blocklist=("x",)))
        assert stats.shuffles == 0
        assert stats.python_stages == 0
