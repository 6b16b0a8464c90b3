"""Evaluation statistics (operators.evaluation) vs pure-Python mirrors.

The AUC mirror is the O(n log n) rank-sum definition with explicit tie
handling — independent of the Spark histogram/window formulation, so an
agreement pins the distributed algebra, not a reimplementation of it.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators.evaluation import (
    auc_score,
    calibration_bins,
    confusion_at_threshold,
    precision_at_k,
)
from real_estate_bigdata_spark.operators.linear_probe import (
    linear_probe_scores,
)
from real_estate_bigdata_spark.plans import assert_plan


def mirror_auc(pairs):
    """Rank-sum AUC with average ranks for ties (Mann-Whitney)."""
    pos = sorted(s for s, y in pairs if y == 1)
    neg = sorted(s for s, y in pairs if y == 0)
    if not pos or not neg:
        return None
    num = 0.0
    for p in pos:
        # binary-search-free mirror: count strictly-below and ties
        below = sum(1 for n in neg if n < p)
        ties = sum(1 for n in neg if n == p)
        num += below + 0.5 * ties
    return num / (len(pos) * len(neg))


@pytest.fixture(scope="module")
def scored(spark):
    rng = random.Random(8)
    rows = []
    for i in range(400):
        y = rng.random() < 0.4
        # overlapping classes + deliberate ties (scores on a coarse grid)
        s = round(rng.gauss(1.0 if y else 0.0, 1.0), 1)
        rows.append((i, float(s), int(y)))
    # null score and null label rows must be excluded everywhere
    rows.append((9001, None, 1))
    rows.append((9002, 0.5, None))
    return spark.createDataFrame(rows, "id long, score double, label int")


def test_auc_matches_rank_sum_mirror(scored):
    got = auc_score(scored, "score", "label").collect()[0]
    pairs = [
        (r["score"], r["label"])
        for r in scored.collect()
        if r["score"] is not None and r["label"] is not None
    ]
    want = mirror_auc(pairs)
    assert got["auc"] == pytest.approx(want, abs=1e-6)
    assert got["n_pos"] == sum(1 for _, y in pairs if y == 1)
    assert got["n_neg"] == sum(1 for _, y in pairs if y == 0)


def test_auc_extremes(spark):
    sep = spark.createDataFrame(
        [(float(i), int(i >= 5)) for i in range(10)], "score double, label int"
    )
    assert auc_score(sep, "score", "label").collect()[0]["auc"] == 1.0
    rev = sep.withColumn("label", 1 - F.col("label"))
    assert auc_score(rev, "score", "label").collect()[0]["auc"] == 0.0
    # all ties -> exactly 0.5 regardless of class balance
    flat = spark.createDataFrame(
        [(1.0, i % 2) for i in range(10)], "score double, label int"
    )
    assert auc_score(flat, "score", "label").collect()[0]["auc"] == 0.5


def test_auc_degenerate_class_is_null(spark):
    onecls = spark.createDataFrame(
        [(float(i), 1) for i in range(5)], "score double, label int"
    )
    row = auc_score(onecls, "score", "label").collect()[0]
    assert row["auc"] is None and row["n_pos"] == 5 and row["n_neg"] == 0


def test_calibration_bins_clamp_and_mass(scored):
    out = calibration_bins(scored, "score", "label", lo=0.0, hi=1.0, bins=4)
    rows = {r["bin"]: r for r in out.collect()}
    assert set(rows) <= set(range(4))
    # every non-null row lands in exactly one bin (out-of-range clamped)
    n_valid = scored.filter(
        F.col("score").isNotNull() & F.col("label").isNotNull()
    ).count()
    assert sum(r["n"] for r in rows.values()) == n_valid
    # clamped edge bins hold the out-of-range mass, so their mean
    # score sits outside [lo, hi)
    assert rows[0]["mean_score"] < 0.25
    assert rows[3]["mean_score"] > 0.75


def test_calibration_validates_args(scored):
    with pytest.raises(ValueError):
        calibration_bins(scored, bins=0)
    with pytest.raises(ValueError):
        calibration_bins(scored, lo=1.0, hi=1.0)


def test_confusion_matches_manual(scored):
    got = confusion_at_threshold(scored, "score", "label", 0.5).collect()[0]
    pairs = [
        (r["score"], r["label"])
        for r in scored.collect()
        if r["score"] is not None and r["label"] is not None
    ]
    tp = sum(1 for s, y in pairs if s >= 0.5 and y == 1)
    fp = sum(1 for s, y in pairs if s >= 0.5 and y == 0)
    tn = sum(1 for s, y in pairs if s < 0.5 and y == 0)
    fn = sum(1 for s, y in pairs if s < 0.5 and y == 1)
    assert (got["tp"], got["fp"], got["tn"], got["fn"]) == (tp, fp, tn, fn)
    assert got["accuracy"] == pytest.approx((tp + tn) / len(pairs), abs=1e-6)
    assert got["precision"] == pytest.approx(tp / (tp + fp), abs=1e-6)
    assert got["recall"] == pytest.approx(tp / (tp + fn), abs=1e-6)
    p, r = tp / (tp + fp), tp / (tp + fn)
    assert got["f1"] == pytest.approx(2 * p * r / (p + r), abs=1e-6)


def test_confusion_null_rates_when_degenerate(spark):
    # threshold above every score: no predicted positives -> precision
    # NULL (not 0), recall 0, f1 NULL
    df = spark.createDataFrame(
        [(0.1, 1), (0.2, 0)], "score double, label int"
    )
    got = confusion_at_threshold(df, "score", "label", 5.0).collect()[0]
    assert got["precision"] is None and got["f1"] is None
    assert got["recall"] == 0.0


def test_precision_at_k_deterministic_ties(spark):
    # 6 rows share the top score; only id order decides the k=3 cut
    df = spark.createDataFrame(
        [(i, 1.0, int(i < 3)) for i in range(6)]
        + [(i, 0.0, 1) for i in range(6, 12)],
        "id long, score double, label int",
    )
    got = precision_at_k(df, "score", "label", "id", k=3).collect()[0]
    assert got["k"] == 3 and got["n_pos"] == 3
    assert got["precision_at_k"] == 1.0


def test_precision_at_k_smaller_corpus(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 1), (1, 0.5, 0)], "id long, score double, label int"
    )
    got = precision_at_k(df, "score", "label", "id", k=10).collect()[0]
    assert got["k"] == 10  # requested k is reported
    assert got["precision_at_k"] == 0.5  # but the rate uses rows taken
    with pytest.raises(ValueError):
        precision_at_k(df, k=0)


def test_probe_auc_end_to_end(spark, sf_dir):
    """The served composition: fit the closed-form probe, evaluate it
    with auc_score — the probe trained ON the labels must rank them far
    better than chance, and the Spark AUC must equal the rank-sum
    mirror on the same rounded scores."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "__target", (F.col("label") <= 4).cast("double")
    )
    scores = linear_probe_scores(emb, target_col="__target").join(
        emb.select("vec_id", "__target"), "vec_id"
    )
    got = auc_score(scores, "probe_score", "__target").collect()[0]
    pairs = [
        (r["probe_score"], r["__target"])
        for r in scores.collect()
        if r["probe_score"] is not None
    ]
    assert got["auc"] == pytest.approx(mirror_auc(pairs), abs=1e-6)
    assert got["auc"] > 0.55  # probe beats chance on its training set


def test_evaluation_plans_stay_jvm_side(scored):
    """No Python stages anywhere; AUC keeps its bounded shuffle shape
    (hash exchange for the score histogram + single-partition exchanges
    for the ordered window over DISTINCT scores and the final one-row
    aggregate — never a corpus-wide global sort)."""
    assert_plan(auc_score(scored, "score", "label"), max_shuffles=4,
                forbid_python=True)
    assert_plan(calibration_bins(scored), max_shuffles=2, forbid_python=True)
    assert_plan(
        confusion_at_threshold(scored), max_shuffles=2, forbid_python=True
    )
    assert_plan(
        precision_at_k(scored, "score", "label", "id", 5),
        max_shuffles=2,
        forbid_python=True,
    )
    # the top-k is a TakeOrdered, not a global sort
    from real_estate_bigdata_spark.plans import executed_plan_str

    plan = executed_plan_str(
        precision_at_k(scored, "score", "label", "id", 5)
    )
    assert "TakeOrderedAndProject" in plan
