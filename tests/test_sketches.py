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
