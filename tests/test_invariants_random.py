"""Seeded randomized invariant sweep over the round-4 operators: one
generated corpus (deterministic RNG — reproducible failures), many
invariants. Catches the edge shapes hand-written cases miss (empty
groups, all-duplicate groups, single-row strata) without Hypothesis'
per-example Spark-job cost.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators.quality import (
    corpus_health_report,
    metric_histogram,
)
from real_estate_bigdata_spark.operators.sampling import cap_per_group
from real_estate_bigdata_spark.operators.text_analysis import (
    remove_boilerplate_lines,
)


def _random_corpus(spark, seed=20260814, n=400):
    rng = random.Random(seed)
    shared_lines = [f"shared line {i}" for i in range(5)]
    rows = []
    for i in range(n):
        group = f"g{rng.randrange(12)}"
        kind = rng.random()
        if kind < 0.05:
            text = None
        elif kind < 0.10:
            text = ""
        else:
            lines = [
                rng.choice(shared_lines) if rng.random() < 0.3
                else f"unique {i} {rng.randrange(10**9)}"
                for _ in range(rng.randrange(1, 6))
            ]
            text = "\n".join(lines)
        rows.append((i, group, text))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_cap_per_group_invariants_random(spark):
    df = _random_corpus(spark)
    for cap in (1, 7, 1000):
        out = cap_per_group(df, max_rows=cap)
        per = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        orig = {r.source: r.n for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()}
        for g, n in per.items():
            assert n == min(cap, orig[g]), (g, cap, n, orig[g])
        # survivors are a subset of the input, never duplicated
        assert out.count() == out.select("doc_id").distinct().count()
        # prefilter path must agree exactly
        fast = {r.doc_id for r in cap_per_group(df, max_rows=cap, prefilter_counts=True).collect()}
        assert fast == {r.doc_id for r in out.collect()}


def test_remove_boilerplate_invariants_random(spark):
    df = _random_corpus(spark)
    out = remove_boilerplate_lines(df, max_docs=2)
    got = {r.doc_id: r.text for r in out.collect()}
    orig = {r.doc_id: (r.source, r.text) for r in df.collect()}
    # row count preserved; NULL stays NULL; output lines are a
    # subsequence of input lines (order preserved, nothing invented)
    assert set(got) == set(orig)
    for did, text in got.items():
        src_text = orig[did][1]
        if src_text is None:
            assert text is None
            continue
        assert text is not None
        in_lines = src_text.split("\n")
        out_lines = text.split("\n") if text != "" else []
        it = iter(in_lines)
        assert all(any(line == cand for cand in it) for line in out_lines), did
    # the 30%-frequency shared lines must be gone from every doc
    joined = "\n".join(t for t in got.values() if t)
    assert "shared line" not in joined


def test_health_report_and_histogram_consistency_random(spark):
    df = _random_corpus(spark)
    r = corpus_health_report(df).first()
    assert r.n_rows == 400
    assert r.n_distinct_ids == 400 and r.n_dup_ids == 0
    # histogram over the same metric must conserve the non-NULL count
    hist = metric_histogram(df, F.length("text"), 0, 100, n_bins=7)
    assert sum(x.n for x in hist.collect()) == r.n_rows - r.n_null_text
    # ... at any bin granularity
    hist1 = metric_histogram(df, F.length("text"), 0, 100, n_bins=1)
    assert sum(x.n for x in hist1.collect()) == r.n_rows - r.n_null_text
