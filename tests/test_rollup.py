"""Incremental rollup maintenance must equal a full recompute, and a
second-day increment must not rewrite the first day's partition."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import rollup as ru

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_incremental_merge_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    day1 = [
        (1, datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (2, datetime(2024, 1, 1, 10, 40), "click", 2.0),
        (3, datetime(2024, 1, 1, 11, 0), "view", 3.0),
    ]
    day1_late = [
        (4, datetime(2024, 1, 1, 10, 59), "click", 4.0),  # merges into hour 10
        (5, datetime(2024, 1, 2, 9, 0), "view", 5.0),
    ]
    ru.merge_rollup_increment(spark, _events(spark, day1), path)
    ru.merge_rollup_increment(spark, _events(spark, day1_late), path)

    got = {
        (r.bucket_hour, r.event_type): (r.n_events, r.total_value, r.avg_value)
        for r in ru.read_rollup(spark, path).collect()
    }
    full = {
        (r.bucket_hour, r.event_type): (r.n_events, r.total_value, r.avg_value)
        for r in ru.hourly_rollup(_events(spark, day1 + day1_late))
        .select(
            "bucket_hour",
            "event_type",
            "n_events",
            F.round("sum_value", 2).alias("total_value"),
            F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
        )
        .collect()
    }
    assert got == full
    # the late event merged into the existing hour-10 click bucket
    assert got[(datetime(2024, 1, 1, 10, 0), "click")][0] == 3


def test_untouched_partition_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "rollup")
    ru.merge_rollup_increment(
        spark, _events(spark, [(1, datetime(2024, 1, 1, 8, 0), "click", 1.0)]), path
    )
    day1_dir = os.path.join(path, "bucket_date=2024-01-01")
    before = {f: os.path.getmtime(os.path.join(day1_dir, f))
              for f in os.listdir(day1_dir) if f.endswith(".parquet")}
    ru.merge_rollup_increment(
        spark, _events(spark, [(2, datetime(2024, 1, 2, 8, 0), "view", 2.0)]), path
    )
    after = {f: os.path.getmtime(os.path.join(day1_dir, f))
             for f in os.listdir(day1_dir) if f.endswith(".parquet")}
    assert before == after  # day-1 files untouched by the day-2 increment
    assert ru.read_rollup(spark, path).count() == 2


def test_null_timestamp_partition_accumulates(spark, tmp_path):
    """Events with NULL ts land in the null bucket partition; a second
    increment must MERGE with it, not silently overwrite it (isin never
    matches SQL NULL)."""
    path = str(tmp_path / "rollup")
    ru.merge_rollup_increment(
        spark, _events(spark, [(1, None, "click", 1.0)]), path
    )
    ru.merge_rollup_increment(
        spark, _events(spark, [(2, None, "click", 5.0)]), path
    )
    rows = ru.read_rollup(spark, path).collect()
    assert len(rows) == 1
    assert (rows[0].n_events, rows[0].total_value) == (2, 6.0)
