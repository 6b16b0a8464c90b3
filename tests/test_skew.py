"""Salted aggregation/join must match the unsalted results exactly on
a deliberately skewed dataset (one key owning ~90% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import skew


def _skewed(spark):
    hot = [("hot", float(i % 7)) for i in range(9000)]
    cold = [(f"k{i % 50}", float(i)) for i in range(1000)]
    return spark.createDataFrame(hot + cold, "key string, value double")


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.key): (r.n, r.s)
        for r in df.groupBy("key")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    salted = {
        (r.key): (r.n, r.sum_value)
        for r in skew.salted_agg_count(df, "key", n_salts=8, measure="value").collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(50)] + [("orphan", "X")],
        "key string, label string",
    )
    plain = (
        fact.join(dim.withColumnRenamed("key", "dkey"), F.col("key") == F.col("dkey"))
        .groupBy("label")
        .count()
        .collect()
    )
    salted = (
        skew.salted_join(fact, dim.withColumnRenamed("key", "dkey"), "key", "dkey", n_salts=8)
        .groupBy("label")
        .count()
        .collect()
    )
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_salted_join_rejects_right_and_full(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame([("hot", "H")], "dkey string, label string")
    import pytest

    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError):
            skew.salted_join(fact, dim, "key", "dkey", n_salts=4, how=how)
