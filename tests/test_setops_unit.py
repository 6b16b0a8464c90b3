"""Unit tests for set operators not covered by the oracle queries."""

from __future__ import annotations

import pytest

from real_estate_bigdata_spark.operators.setops import union_all_tagged


def test_union_all_tagged(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([(2, "y"), (3, "z")], "id int, v string")
    out = union_all_tagged({"alpha": a, "beta": b}).collect()
    assert {(r.id, r.v, r.source_tag) for r in out} == {
        (1, "x", "alpha"),
        (2, "y", "beta"),
        (3, "z", "beta"),
    }


def test_union_all_tagged_rejects_empty():
    with pytest.raises(ValueError):
        union_all_tagged({})


def test_with_run_metrics_piggybacks_on_action(spark):
    from real_estate_bigdata_spark.util import with_run_metrics

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id int, v string"
    )
    observed, obs = with_run_metrics(df, count_col="v")
    assert observed.count() == 3  # the one and only action
    assert obs.get == {"n_rows": 3, "n_v_nonnull": 2}
