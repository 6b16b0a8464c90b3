"""Count-Min sketch (operators/sketches.py, NEW r14): bounded-memory
frequency estimation with the portable md5-prefix hash — build/estimate
contracts, the overestimate-only guarantee, DuckDB cell parity, and the
plan budgets that make it a 100 TB operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import sketches as sk
from real_estate_bigdata_spark.schema import load_table

SF = "/root/testdata/sf0.001"


def _tokens(spark):
    from real_estate_bigdata_spark.functions.text import tokenize

    docs = load_table(spark, SF, "documents")
    return docs.select(F.explode(tokenize(F.col("text"))).alias("token"))


class TestCountMinSketch:
    def test_estimate_never_underestimates(self, spark):
        """The CMS invariant: est >= true count for EVERY key (no
        deletions, so every cell a key hashes to holds at least its
        own count)."""
        toks = _tokens(spark).localCheckpoint(eager=False)
        sketch = sk.count_min_sketch(toks, "token", width=256, depth=3)
        exact = toks.groupBy("token").agg(F.count("*").alias("exact"))
        est = sk.cms_estimate(sketch, exact, "token", width=256, depth=3)
        rows = exact.join(est, "token").collect()
        assert rows
        bad = [(r.token, r.exact, r.est) for r in rows if r.est < r.exact]
        assert not bad, bad[:5]

    def test_width_one_degenerates_to_grand_total(self, spark):
        toks = _tokens(spark).localCheckpoint(eager=False)
        total = toks.count()
        sketch = sk.count_min_sketch(toks, "token", width=1, depth=2)
        est = sk.cms_estimate(sketch, toks, "token", width=1, depth=2)
        assert est.count() > 1
        assert {r.est for r in est.collect()} == {total}

    def test_fixture_counts_exact_at_generous_width(self, spark):
        """Fixture-pinned: at width 4096 these five keys land in
        distinct cells (deterministic md5 buckets), so the estimates
        equal the exact counts."""
        df = spark.createDataFrame(
            [(v,) for v in ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d", "e"]],
            "v string",
        )
        sketch = sk.count_min_sketch(df, "v", width=4096, depth=4)
        got = {
            r.v: r.est
            for r in sk.cms_estimate(sketch, df, "v", width=4096, depth=4).collect()
        }
        assert got == {"a": 5, "b": 3, "c": 2, "d": 1, "e": 1}

    def test_weight_col_accumulates(self, spark):
        df = spark.createDataFrame(
            [("a", 10), ("a", 5), ("b", 7)], "v string, w long"
        )
        sketch = sk.count_min_sketch(df, "v", width=512, depth=2, weight_col="w")
        got = {
            r.v: r.est
            for r in sk.cms_estimate(sketch, df, "v", width=512, depth=2).collect()
        }
        assert got == {"a": 15, "b": 7}

    def test_null_keys_skipped(self, spark):
        df = spark.createDataFrame([("a",), (None,), ("a",)], "v string")
        sketch = sk.count_min_sketch(df, "v", width=64, depth=2)
        assert sketch.agg(F.sum("cnt")).collect()[0][0] == 2 * 2  # depth x rows
        est = sk.cms_estimate(sketch, df, "v", width=64, depth=2)
        assert {(r.v, r.est) for r in est.collect()} == {("a", 2)}

    def test_validation(self, spark):
        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="width"):
            sk.count_min_sketch(df, "v", width=0)
        with pytest.raises(ValueError, match="depth"):
            sk.count_min_sketch(df, "v", depth=0)
        with pytest.raises(ValueError, match="collides"):
            sk.cms_estimate(df, df, "v", out_col="v")

    def test_duckdb_cell_parity(self, spark):
        """The portable contract directly: DuckDB rebuilds the exact
        cell grid (same md5-prefix buckets, same sums) — the oracle for
        q_cms_token_counts rests on this."""
        duckdb = pytest.importorskip("duckdb")

        rows = [("alpha",), ("beta",), ("alpha",), ("gamma delta",)]
        df = spark.createDataFrame(rows, "v string")
        cells = {
            (r.d, r.bucket): r.cnt
            for r in sk.count_min_sketch(df, "v", width=128, depth=3).collect()
        }
        con = duckdb.connect()
        got = con.execute(
            """
            WITH vals(v) AS (VALUES ('alpha'), ('beta'), ('alpha'), ('gamma delta')),
            grid AS (SELECT unnest([0,1,2]) AS d)
            SELECT d,
                   ('0x' || substr(md5(v || ':' || d::VARCHAR), 1, 15))::BIGINT % 128 AS bucket,
                   count(*)::BIGINT AS cnt
            FROM vals CROSS JOIN grid GROUP BY 1, 2
            """
        ).fetchall()
        assert {(d, b): c for d, b, c in got} == cells

    def test_save_load_roundtrip_serves_identically(self, spark, tmp_path):
        """The persisted artifact (cells + geometry meta, the IVF/BM25
        lifecycle pattern) must serve the same estimates as the live
        build — and carry its own width/depth so the serve path cannot
        hash with mismatched geometry."""
        toks = _tokens(spark).localCheckpoint(eager=False)
        sketch = sk.count_min_sketch(toks, "token", width=256, depth=3)
        path = str(tmp_path / "cms")
        sk.save_cms(sketch, path, width=256, depth=3)
        idx = sk.load_cms(spark, path)
        assert (idx.width, idx.depth) == (256, 3)
        queries = toks.limit(40)
        live = {
            (r.token, r.est)
            for r in sk.cms_estimate(
                sketch, queries, "token", width=256, depth=3
            ).collect()
        }
        served = {
            (r.token, r.est) for r in idx.estimate(queries, "token").collect()
        }
        assert served == live

    def test_save_validates_geometry(self, spark):
        df = spark.createDataFrame([("a",)], "v string")
        sketch = sk.count_min_sketch(df, "v", width=8, depth=2)
        with pytest.raises(ValueError, match="width"):
            sk.save_cms(sketch, "/tmp/never-written-cms", width=0, depth=2)

    def test_build_plan_is_one_bounded_aggregation(self, spark):
        from real_estate_bigdata_spark.plans import assert_plan

        toks = _tokens(spark)
        sketch = sk.count_min_sketch(toks, "token", width=1024, depth=4)
        # one exchange: the (d, bucket) hash aggregate — map-side
        # combine bounds each task's contribution at depth x width cells
        assert_plan(sketch, max_shuffles=1, forbid_python=True)

    def test_estimate_plan_broadcasts_the_sketch(self, spark):
        from real_estate_bigdata_spark.plans import assert_plan

        toks = _tokens(spark)
        sketch = sk.count_min_sketch(toks, "token", width=1024, depth=4)
        est = sk.cms_estimate(sketch, toks.limit(50), "token", width=1024, depth=4)
        # exchanges: sketch build + query-side distinct + final min
        # aggregate — the last two bounded by the QUERY set, the first
        # by the sketch; the join itself must broadcast, never
        # sort-merge the corpus
        stats = assert_plan(est, max_shuffles=4, forbid_python=True)
        assert stats.broadcast_joins >= 1, stats
        assert stats.sortmerge_joins == 0, stats


class TestHyperLogLog:
    def test_estimate_within_theory_bound(self, spark):
        """p=11 (m=2048): the Flajolet standard error is 1.04/sqrt(m)
        ~= 2.3%; pin the 10k-key estimate inside 3 sigma."""
        df = spark.range(10_000).select(
            F.concat(F.lit("key_"), F.col("id")).alias("k")
        )
        regs = sk.hll_registers(df, "k", p=11)
        est = sk.hll_estimate(regs, p=11).collect()[0].est
        assert abs(est - 10_000) / 10_000 < 3 * 1.04 / (2048 ** 0.5), est

    def test_small_range_linear_counting_near_exact(self, spark):
        """n << m lands in the linear-counting branch, which is
        near-exact when almost every register is empty."""
        df = spark.range(30).select(F.concat(F.lit("x"), F.col("id")).alias("k"))
        est = sk.hll_estimate(sk.hll_registers(df, "k", p=11), p=11).collect()[0].est
        assert abs(est - 30) < 2, est

    def test_merge_equals_sketch_of_union(self, spark):
        """Register-wise max is EXACTLY the sketch of the union — the
        mergeability that lets shards sketch locally and combine
        globally without re-reading data."""
        mk = lambda lo, hi: spark.range(lo, hi).select(
            F.concat(F.lit("key_"), F.col("id")).alias("k")
        )
        merged = sk.hll_merge(
            sk.hll_registers(mk(0, 6_000), "k", p=11),
            sk.hll_registers(mk(4_000, 10_000), "k", p=11),
        )
        whole = sk.hll_registers(mk(0, 10_000), "k", p=11)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_grouped_sketches_are_independent(self, spark):
        """group_cols builds one sketch per group: each group's
        registers equal the ungrouped sketch of just that group's
        rows."""
        df = spark.createDataFrame(
            [("g1", f"v{i}") for i in range(50)]
            + [("g2", f"v{i}") for i in range(200)],
            "g string, v string",
        )
        grouped = sk.hll_registers(df, "v", p=8, group_cols=["g"])
        solo_g2 = sk.hll_registers(df.where(F.col("g") == "g2"), "v", p=8)
        got = sorted(
            (r.bucket, r.max_rho)
            for r in grouped.where(F.col("g") == "g2").collect()
        )
        assert got == sorted((r.bucket, r.max_rho) for r in solo_g2.collect())

    def test_null_keys_skipped(self, spark):
        df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
        regs = sk.hll_registers(df, "v", p=8)
        assert regs.count() <= 2

    def test_validation(self, spark):
        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="p must be"):
            sk.hll_registers(df, "v", p=3)
        with pytest.raises(ValueError, match="p must be"):
            sk.hll_estimate(df, p=17)
        with pytest.raises(ValueError, match="at least one"):
            sk.hll_merge()
        regs = sk.hll_registers(df, "v", p=8)
        with pytest.raises(ValueError, match="collides"):
            sk.hll_estimate(regs, p=8, group_cols=["g"], out_col="g")

    def test_duckdb_register_parity(self, spark):
        """The portable contract directly: DuckDB rebuilds the exact
        register frame (same md5-prefix hash, same bucket split, same
        string-length rank) — the q_hll_distinct oracle rests on
        this."""
        duckdb = pytest.importorskip("duckdb")

        rows = [(f"u{i}",) for i in range(300)]
        df = spark.createDataFrame(rows, "v string")
        regs = {
            (r.bucket, r.max_rho)
            for r in sk.hll_registers(df, "v", p=8).collect()
        }
        con = duckdb.connect()
        got = con.execute(
            """
            WITH vals AS (
                SELECT 'u' || g::VARCHAR AS v FROM generate_series(0, 299) t(g)
            ), h AS (
                SELECT ('0x' || substr(md5(v), 1, 15))::BIGINT AS hv FROM vals
            )
            SELECT (hv & 255)::BIGINT AS bucket,
                   max(CASE WHEN (hv >> 8) = 0 THEN 53
                        ELSE 52 - length(bin(hv >> 8)) + 1 END) AS max_rho
            FROM h GROUP BY 1
            """
        ).fetchall()
        assert {(int(b), int(r)) for b, r in got} == regs

    def test_save_load_roundtrip_serves_identically(self, spark, tmp_path):
        """The persisted artifact (registers + p/group_cols meta — the
        CMS geometry-tier pattern) must estimate identically to the
        live build."""
        df = spark.createDataFrame(
            [("g1", f"v{i}") for i in range(400)]
            + [("g2", f"w{i}") for i in range(40)],
            "g string, v string",
        )
        regs = sk.hll_registers(df, "v", p=9, group_cols=["g"])
        path = str(tmp_path / "hll")
        sk.save_hll(regs, path, p=9, group_cols=["g"])
        idx = sk.load_hll(spark, path)
        assert idx.p == 9 and idx.group_cols == ("g",)
        live = sorted(
            map(tuple, sk.hll_estimate(regs, p=9, group_cols=["g"]).collect())
        )
        assert sorted(map(tuple, idx.estimate().collect())) == live

    def test_build_plan_is_one_bounded_aggregation(self, spark):
        from real_estate_bigdata_spark.plans import assert_plan

        toks = _tokens(spark)
        regs = sk.hll_registers(toks, "token", p=11)
        # one exchange: the bucket hash aggregate — map-side combine
        # bounds each task's contribution at 2^p registers
        assert_plan(regs, max_shuffles=1, forbid_python=True)

    def test_estimate_plan_stays_bounded(self, spark):
        from real_estate_bigdata_spark.plans import assert_plan

        docs = load_table(spark, SF, "documents")
        regs = sk.hll_registers(docs, "text", p=11, group_cols=["source"])
        est = sk.hll_estimate(regs, p=11, group_cols=["source"])
        # register build + the per-group readout aggregate; the second
        # exchange carries at most one row per (group, bucket)
        assert_plan(est, max_shuffles=2, forbid_python=True)


class TestHllOverlap:
    def test_inclusion_exclusion_accuracy(self, spark):
        """Planted overlap: |A|=3000, |B|=4000, |A∩B|=1000 — union
        estimate from the register-max merge, intersection by
        inclusion-exclusion; error is the UNION of the operands'
        (3-sigma at p=11 on each, summed conservatively)."""
        mk = lambda lo, hi: spark.range(lo, hi).select(
            F.concat(F.lit("u"), F.col("id")).alias("k")
        )
        ra = sk.hll_registers(mk(0, 3000), "k", p=11)
        rb = sk.hll_registers(mk(2000, 6000), "k", p=11)
        row = sk.hll_overlap_estimate(ra, rb, 11, "A", "B").collect()[0]
        assert (row.label_a, row.label_b) == ("A", "B")
        assert abs(row.est_union - 6000) / 6000 < 3 * 1.04 / (2048 ** 0.5)
        # intersection differences three noisy estimates
        assert abs(row.est_intersection - 1000) < 3 * 3 * 1.04 / (2048 ** 0.5) * 6000
        assert row.est_intersection == round(
            row.est_a + row.est_b - row.est_union, 6
        )

    def test_disjoint_sets_read_near_zero(self, spark):
        mk = lambda lo, hi: spark.range(lo, hi).select(
            F.concat(F.lit("u"), F.col("id")).alias("k")
        )
        ra = sk.hll_registers(mk(0, 2000), "k", p=11)
        rb = sk.hll_registers(mk(50_000, 52_000), "k", p=11)
        row = sk.hll_overlap_estimate(ra, rb, 11).collect()[0]
        # may be slightly negative (documented noise floor, not clamped)
        assert abs(row.est_intersection) < 400

    def test_identical_sets_intersection_equals_estimate(self, spark):
        df = spark.range(1000).select(F.concat(F.lit("u"), F.col("id")).alias("k"))
        r = sk.hll_registers(df, "k", p=11)
        row = sk.hll_overlap_estimate(r, r, 11).collect()[0]
        assert row.est_a == row.est_b == row.est_union
        assert row.est_intersection == round(row.est_a, 6)
