"""Event-stream analytics in batch form (the `events` table): time
windows, JSON prop extraction, sessionization primitives.

These are the batch twins of the streaming operators in
``streaming/`` — same expressions, so a query can be developed in batch
and lifted to `readStream` unchanged (Structured Streaming's
unified-API property).

The reference's only event-time behavior is ingest-date partitioning
(`kafka_to_hdfs_consumer.py:89-90`, SURVEY §2.9 ST3); windows/watermarks
are north-star surface with Spark semantics as spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tumbling_window_stats", "json_prop_stats", "sessionize"]


def tumbling_window_stats(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows per event_type: count + sum(value).

    `F.window` buckets rows JVM-side; the aggregate is the usual
    partial+final hash agg on (window, event_type) — one shuffle. In
    streaming the same expression runs incrementally with a watermark.
    """
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def json_prop_stats(events: DataFrame) -> DataFrame:
    """Extract the numeric `k` property from the JSON `props` string and
    aggregate per event_type.

    Uses regexp extraction (portable, pushdown-friendly) rather than a
    full JSON parse; `F.get_json_object` is the general alternative when
    props are nested.
    """
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).try_cast("bigint")
    return (
        events.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.min("k").alias("min_k"),
            F.count("*").alias("n"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    gap to the previous event exceeds ``gap_minutes``.

    Classic two-window formulation (lag -> boundary flag -> running sum =
    session id): two passes over one (user_id)-partitioned sort, no
    self-join. Returns one row per session with bounds and stats.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag("ts").over(w)
    # unix_micros, not unix_timestamp: event timestamps carry microseconds
    # and the gap comparison must not floor to whole seconds.
    is_new = (
        prev_ts.isNull() | (F.unix_micros("ts") - F.unix_micros(prev_ts) > gap_us)
    ).cast("int")
    with_session = events.withColumn("is_new", is_new).withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_session.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )
