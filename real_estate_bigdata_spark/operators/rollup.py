"""Hypertable-style time-bucket rollup with incremental maintenance.

The continuous-aggregate pattern (TimescaleDB's "hypertable rollup",
the lakehouse "incremental materialized view"): keep an hourly
aggregate table that is MERGED with each new batch of events instead of
recomputed from all history. The merge is partition-scoped — only the
date partitions the increment touches are rewritten (dynamic partition
overwrite), so maintenance cost tracks the increment, not the table.

Counts and sums are decomposable, so merging partials (sum of counts,
sum of sums) is exact; averages derive at read time. The same shape
maintains any algebraic aggregate; sketch columns (HLL etc.) would
merge the same way with their binary union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["hourly_rollup", "merge_rollup_increment", "read_rollup"]


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Events -> (bucket_date, bucket_hour, event_type) partial
    aggregates. bucket_date is the partition column; the raw sum is kept
    unrounded so merges stay exact (round at serving time)."""
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        events.groupBy(
            F.to_date(hour).alias("bucket_date"),
            hour.alias("bucket_hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )


def merge_rollup_increment(
    spark: SparkSession, increment: DataFrame, rollup_path: str
) -> None:
    """Fold a batch of new events into the rollup table at
    ``rollup_path``: aggregate the increment to the rollup grain, union
    with the EXISTING rows of only the touched date partitions, merge
    partials, and dynamically overwrite those partitions.

    Touched-partition pruning is the point — a day's increment rewrites
    one partition of a years-deep rollup. The read of existing rows is
    partition-pruned by the same predicate it overwrites.
    """
    # one aggregation pass feeds both the dates collect and the merge
    inc = hourly_rollup(increment).persist()
    try:
        dates = [
            r.bucket_date for r in inc.select("bucket_date").distinct().collect()
        ]
        if _path_exists(spark, rollup_path):
            # isin() never matches SQL NULL — the null-date partition
            # (events with NULL ts) must be selected explicitly or its
            # accumulated partials would be silently overwritten
            non_null = [d for d in dates if d is not None]
            cond = F.col("bucket_date").isin(non_null)
            if any(d is None for d in dates):
                cond = cond | F.col("bucket_date").isNull()
            existing = spark.read.parquet(rollup_path).filter(cond)
            merged_src = inc.unionByName(existing)
        else:  # first write — table does not exist yet; any OTHER read
            # error (schema drift, corrupt files) must surface, not be
            # misread as a first write that clobbers history
            merged_src = inc
        merged = merged_src.groupBy("bucket_date", "bucket_hour", "event_type").agg(
            F.sum("n_events").alias("n_events"), F.sum("sum_value").alias("sum_value")
        )
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket_date")
            .parquet(rollup_path)
        )
    finally:
        inc.unpersist()


def _path_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Serving view over the rollup: rounded sums + derived average.
    ``WHERE bucket_date ...`` predicates prune at the directory level."""
    r = spark.read.parquet(rollup_path)
    return r.select(
        "bucket_date",
        "bucket_hour",
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 2).alias("total_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
    )
