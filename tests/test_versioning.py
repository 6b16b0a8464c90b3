"""Corpus snapshot diff semantics: status taxonomy, NULL-vs-empty
discrimination, fingerprint injectivity, delta-only output, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators.versioning import corpus_diff
from real_estate_bigdata_spark.schema import load_table

SF = "/root/testdata/sf0.01"


def test_corpus_diff_status_taxonomy(spark):
    old = spark.createDataFrame(
        [
            (1, "same", "en"),
            (2, "will change", "en"),
            (3, "gone", "en"),
            (4, None, "en"),  # NULL text, unchanged
        ],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [
            (1, "same", "en"),
            (2, "did change", "en"),
            (4, None, "en"),
            (5, "brand new", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    # unchanged rows (1, 4) are omitted — delta-sized output
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_corpus_diff_null_vs_empty_and_cross_column_aliasing(spark):
    """NULL -> '' is a change; shifting a character across a column
    boundary ('a1','b') -> ('a','1b') is a change — the length-prefixed
    encoding keeps the fingerprint injective."""
    old = spark.createDataFrame(
        [(1, None, "x"), (2, "a1", "b")], "doc_id long, text string, lang string"
    )
    new = spark.createDataFrame(
        [(1, "", "x"), (2, "a", "1b")], "doc_id long, text string, lang string"
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_corpus_diff_subset_columns(spark):
    """An explicit compare_cols restricts what counts as a change."""
    old = spark.createDataFrame(
        [(1, "t", "en")], "doc_id long, text string, lang string"
    )
    new = spark.createDataFrame(
        [(1, "t", "vi")], "doc_id long, text string, lang string"
    )
    assert corpus_diff(old, new, compare_cols=["text"]).count() == 0
    got = corpus_diff(old, new, compare_cols=["lang"]).collect()
    assert [(r.doc_id, r.status) for r in got] == [(1, "changed")]


def test_corpus_diff_requires_comparable_columns(spark):
    a = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    b = spark.createDataFrame([(1, 2)], "doc_id long, other int")
    with pytest.raises(ValueError):
        corpus_diff(a, b)


def test_corpus_diff_payload_never_joins(spark):
    """Both sides project to (id, fingerprint) before the join: the
    full-outer join moves two bigints per row, never the text payload,
    and nothing in the plan crosses into Python."""
    from real_estate_bigdata_spark.plans import assert_plan

    docs = load_table(spark, SF, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 3 != 1)
    stats = assert_plan(corpus_diff(old, new), forbid_python=True)
    assert stats.shuffles <= 2, stats
