"""Decontamination semantics the oracle sweep can't express: clean ==
corpus minus report, short/NULL-text immunity, min_overlap floor, and
the broadcast plan shape (flagging must never shuffle the corpus
against the benchmark)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import decontamination as dc
from real_estate_bigdata_spark.schema import load_table

SF = "/root/testdata/sf0.01"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_report_counts_shared_distinct_ngrams(spark):
    corpus = _docs(
        spark,
        [
            # 10 tokens -> 8-grams at offsets 1..3; the first two overlap
            # the benchmark doc's grams
            (1, "a b c d e f g h i j"),
            (2, "z y x w v u t s r q"),  # disjoint
            (3, "a b"),  # too short for any 8-gram
            (4, None),  # NULL text never reported
        ],
    )
    bench = _docs(spark, [(100, "a b c d e f g h i")])  # 9 tokens -> 2 grams
    got = {r.doc_id: r.n_hits for r in dc.contamination_report(corpus, bench, n=8).collect()}
    assert got == {1: 2}


def test_decontaminate_removes_exactly_reported_ids(spark):
    docs = load_table(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 7)
    corpus = docs.filter(F.col("doc_id") % 20 != 7)
    dirty = {r.doc_id for r in dc.contamination_report(corpus, bench, n=8).collect()}
    assert dirty  # testdata's planted near-dups make this non-trivial
    clean = dc.decontaminate(corpus, bench, n=8)
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    all_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert kept == all_ids - dirty
    assert clean.columns == corpus.columns  # full original schema


def test_min_overlap_floor(spark):
    corpus = _docs(spark, [(1, "a b c d e f g h i j")])  # 2 shared grams
    bench = _docs(spark, [(100, "a b c d e f g h i")])
    assert dc.decontaminate(corpus, bench, n=8, min_overlap=3).count() == 1
    assert dc.decontaminate(corpus, bench, n=8, min_overlap=2).count() == 0
    with pytest.raises(ValueError):
        dc.decontaminate(corpus, bench, n=8, min_overlap=0)
    with pytest.raises(ValueError):
        dc.benchmark_shingles(bench, n=0)


def test_flagging_plan_broadcasts_benchmark(spark):
    """The corpus-vs-benchmark join must be a broadcast hash join — a
    sort-merge there would shuffle the full corpus shingle stream by
    shingle id at 100 TB. Zero sort-merge joins anywhere in the plan."""
    from real_estate_bigdata_spark.plans import assert_plan

    docs = load_table(spark, SF, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 7)
    corpus = docs.filter(F.col("doc_id") % 20 != 7)
    assert_plan(
        dc.contamination_report(corpus, bench, n=8),
        min_broadcast_joins=1,
        max_sortmerge_joins=0,
        forbid_python=True,
    )


def test_redact_spans_surgical_and_byte_identical_clean(spark):
    from real_estate_bigdata_spark.operators.decontamination import (
        redact_contaminated_spans,
    )

    bench = spark.createDataFrame(
        [(100, "q w e r")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # the 4-gram "q w e r" appears mid-doc: only its window goes
            (1, "keep1 keep2 q w e r keep3"),
            # two overlapping matches: "q w e r" at 0 and at 4
            (2, "q w e r q w e r tail"),
            # entirely covered
            (3, "q w e r"),
            # clean doc with IRREGULAR whitespace — must stay byte-identical
            (4, "clean   doc\twith  weird spacing"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in redact_contaminated_spans(corpus, bench, n=4).collect()
    }
    assert out[1].text == "keep1 keep2 keep3" and out[1].n_redacted == 1
    assert out[2].text == "tail" and out[2].n_redacted == 2
    assert out[3].text == "" and out[3].n_redacted == 1
    assert out[4].text == "clean   doc\twith  weird spacing"
    assert out[4].n_redacted == 0
    assert out[5].text is None and out[5].n_redacted == 0
    assert set(out) == {1, 2, 3, 4, 5}  # every row survives


def test_redact_spans_dirty_table_broadcasts(spark):
    from real_estate_bigdata_spark.operators.decontamination import (
        redact_contaminated_spans,
    )
    from real_estate_bigdata_spark.plans import assert_plan
    from real_estate_bigdata_spark.schema import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 7)
    corpus = docs.filter(F.col("doc_id") % 20 != 7)
    # benchmark shingles broadcast in; the rewrite is a map-side array
    # filter — the corpus text payload must never shuffle, so the only
    # exchanges belong to the benchmark-distinct and span aggregates
    stats = assert_plan(
        redact_contaminated_spans(corpus, bench, n=8),
        min_broadcast_joins=1,
        forbid_python=True,
    )
    assert stats.shuffles <= 3, stats


class TestSemanticDecontamination:
    """Embedding-level contamination (NEW r7): the paraphrase-leakage
    complement of the lexical n-gram check."""

    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, [1.0, 0.0, 0.0, 0.0]),   # exact copy of bench 100
                (2, [0.9, 0.1, 0.0, 0.0]),   # near bench 100
                (3, [0.0, 0.0, 1.0, 0.0]),   # orthogonal to the bench
                (4, None),                    # unscoreable
            ],
            "vec_id long, embedding array<float>",
        )
        bench = spark.createDataFrame(
            [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        return corpus, bench

    def test_report_flags_copies_and_near_copies_only(self, spark):
        corpus, bench = self._frames(spark)
        got = {
            r.vec_id: (r.n_matches, r.max_cosine)
            for r in dc.semantic_contamination_report(
                corpus, bench, threshold=0.9
            ).collect()
        }
        assert set(got) == {1, 2}
        assert got[1] == (1, 1.0)
        assert got[2][0] == 1 and 0.9 <= got[2][1] < 1.0

    def test_decontaminate_removes_exactly_flagged_rows(self, spark):
        corpus, bench = self._frames(spark)
        clean = dc.semantic_decontaminate(corpus, bench, threshold=0.9)
        assert sorted(r.vec_id for r in clean.collect()) == [3, 4]
        assert clean.columns == corpus.columns  # full schema preserved

    def test_threshold_monotone_and_validated(self, spark):
        corpus, bench = self._frames(spark)
        loose = dc.semantic_contamination_report(corpus, bench, threshold=0.5)
        tight = dc.semantic_contamination_report(corpus, bench, threshold=0.99)
        ids_loose = {r.vec_id for r in loose.collect()}
        ids_tight = {r.vec_id for r in tight.collect()}
        assert ids_tight <= ids_loose
        with pytest.raises(ValueError):
            dc.semantic_contamination_report(corpus, bench, threshold=1.5)

    def test_plan_broadcasts_benchmark_corpus_never_shuffles_payload(
        self, spark
    ):
        """The benchmark side must broadcast (a sort-merge would shuffle
        the full corpus embedding stream at 100 TB); scoring stays pure
        Column code."""
        from real_estate_bigdata_spark.plans import assert_plan

        emb = load_table(spark, SF, "embeddings")
        rep = dc.semantic_contamination_report(
            emb.filter(F.col("vec_id") % 2 == 0),
            emb.filter(F.col("vec_id") % 2 == 1),
            threshold=0.4,
        )
        assert_plan(
            rep,
            min_broadcast_joins=1,
            max_sortmerge_joins=0,
            forbid_python=True,
        )


class TestBloomScreen:
    def test_superset_of_exact_no_false_negatives(self, spark):
        """Bloom screen contract: every doc (and every hit) the exact
        report finds must appear with >= the exact count — zero false
        negatives by construction; both hash modes."""
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        bench = docs.filter(F.col("doc_id") % 20 == 7)
        corpus = docs.filter(F.col("doc_id") % 20 != 7)
        exact = {
            r["doc_id"]: r["n_hits"]
            for r in dc.contamination_report(corpus, bench, n=8).collect()
        }
        for portable in (False, True):
            bloom = dc.build_shingle_bloom(bench, n=8, portable=portable)
            got = {
                r["doc_id"]: r["n_hits"]
                for r in dc.bloom_contamination_report(
                    corpus, bloom, n=8, portable=portable
                ).collect()
            }
            for d, n in exact.items():
                assert got.get(d, 0) >= n, (portable, d)

    def test_decontaminate_drops_everything_exact_drops(self, spark):
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        bench = docs.filter(F.col("doc_id") % 20 == 7)
        corpus = docs.filter(F.col("doc_id") % 20 != 7)
        exact_kept = {
            r["doc_id"] for r in dc.decontaminate(corpus, bench, n=8).collect()
        }
        bloom_kept = {
            r["doc_id"]
            for r in dc.bloom_decontaminate(corpus, bench, n=8).collect()
        }
        # conservative screen: bloom keeps a subset of the exact keep set
        assert bloom_kept <= exact_kept

    def test_corpus_pass_is_map_only(self, spark):
        """The whole screen is one scan + project + the single-row
        broadcast bind of the word table: zero shuffles, no sort-merge,
        no per-shingle join or explode — the reason the operator
        exists. (The bind is a broadcast of ONE row; inlining the word
        table as a literal instead measured ~10x slower because the
        m/32-element array was rebuilt per row.)"""
        from real_estate_bigdata_spark.plans.audit import plan_stats

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        bloom = dc.build_shingle_bloom(docs.limit(5), n=8)
        stats = plan_stats(dc.bloom_contamination_report(docs, bloom, n=8))
        assert stats.shuffles == 0
        assert stats.broadcast_joins == 1 and stats.sortmerge_joins == 0
        assert stats.python_stages == 0

    def test_validates_params(self, spark):
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        with pytest.raises(ValueError, match="power of two"):
            dc.build_shingle_bloom(docs.limit(2), m_bits=1000)
        with pytest.raises(ValueError, match="k must be"):
            dc.build_shingle_bloom(docs.limit(2), k=0)
        bloom = dc.build_shingle_bloom(docs.limit(2), m_bits=1 << 12)
        with pytest.raises(ValueError, match="words"):
            dc.bloom_contamination_report(docs, bloom, m_bits=1 << 13)
        with pytest.raises(ValueError, match="min_overlap"):
            dc.bloom_decontaminate(docs, docs.limit(2), min_overlap=0)
