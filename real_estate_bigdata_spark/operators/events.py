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

__all__ = [
    "tumbling_window_stats",
    "json_prop_stats",
    "sessionize",
    "funnel_conversion",
    "cohort_retention",
]


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


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    within_hours: float | None = None,
) -> DataFrame:
    """Ordered funnel analysis (r11): for each step k, the users whose
    FIRST qualifying step-k event occurs strictly AFTER their step-(k-1)
    entry time — the product-analytics "view -> click -> purchase"
    readout. Returns one row per step:
    ``(step_idx, step, n_users, conv_from_first, conv_from_prev)``.

    "Qualifying" is the earliest-entry semantics: a user's entry time
    into step k is min(t | type = steps[k], t > entry_{k-1}), so
    out-of-order events (a purchase before the first view) do not
    count, but a LATER in-order purchase still does. ``within_hours``
    additionally caps the gap between CONSECUTIVE entries (t <=
    entry_{k-1} + within) — the windowed funnel every product
    dashboard actually draws; None means unbounded.

    Scale shape: step k is one filtered aggregate on the user key
    joined to step k-1's (user, entry-time) frame — k sequential
    user-key shuffles, each strictly shrinking (funnels only narrow);
    no per-user event sort, no corpus-wide window. The final k-row
    assembly uses an unpartitioned lag window — bounded by len(steps),
    never by data.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    from pyspark.sql import Window

    u, t, ty = F.col(user_col), F.col(time_col), F.col(type_col)
    reached = (
        events.filter(ty == steps[0])
        .groupBy(user_col)
        .agg(F.min(time_col).alias("__entry"))
    )
    counts = [
        reached.agg(
            F.lit(1).alias("step_idx"),
            F.lit(steps[0]).alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
    ]
    for k, step in enumerate(steps[1:], start=2):
        prev = reached.select(
            F.col(user_col), F.col("__entry").alias("__prev")
        )
        cond = t > F.col("__prev")
        if within_hours is not None:
            # make_interval(hours=...) truncates fractional hours to the
            # integer part; the secs argument is decimal-capable, so
            # within_hours=1.5 really caps at 90 minutes (r12 ADVICE fix).
            cond = cond & (
                t
                <= F.col("__prev")
                + F.make_interval(
                    secs=F.lit(float(within_hours) * 3600.0)
                )
            )
        reached = (
            events.filter(ty == step)
            .join(prev, user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min(time_col).alias("__entry"))
        )
        counts.append(
            reached.agg(
                F.lit(k).alias("step_idx"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    w = Window.orderBy("step_idx")  # len(steps) rows — bounded
    first = F.first("n_users").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_n = F.lag("n_users").over(w)
    return out.select(
        "step_idx",
        "step",
        "n_users",
        F.round(
            F.when(first > 0, F.col("n_users") / first).otherwise(None), 6
        ).alias("conv_from_first"),
        F.round(
            F.when(prev_n > 0, F.col("n_users") / prev_n), 6
        ).alias("conv_from_prev"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention (r11): users grouped by the ``period`` of their
    FIRST event; for each (cohort, period offset), the distinct users
    active in that period and the retention fraction of the cohort —
    the classic triangle every activation dashboard draws. Returns
    ``(cohort, period_offset, n_active, retention)``.

    Scale shape: one user-key aggregate derives each user's cohort,
    one join tags every event with its user's cohort (user-key
    shuffle), one (cohort, offset) aggregate with distinct counting,
    and the cohort sizes (bounded by the calendar) broadcast back for
    the ratio. ``period`` is ``week`` or ``day`` (date_trunc units
    shared by Spark and the oracle engines).
    """
    if period not in ("week", "day"):
        raise ValueError(f"period must be 'week' or 'day', got {period!r}")
    days_per = 7 if period == "week" else 1
    first = (
        events.groupBy(user_col)
        .agg(
            F.date_trunc(period, F.min(time_col)).cast("date").alias("__cohort")
        )
    )
    tagged = events.select(user_col, F.col(time_col)).join(first, user_col)
    active = (
        tagged.select(
            user_col,
            "__cohort",
            F.floor(
                F.datediff(
                    F.date_trunc(period, F.col(time_col)).cast("date"),
                    F.col("__cohort"),
                )
                / days_per
            )
            .cast("int")
            .alias("period_offset"),
        )
        .groupBy("__cohort", "period_offset")
        .agg(F.countDistinct(user_col).cast("long").alias("n_active"))
    )
    sizes = first.groupBy("__cohort").agg(
        F.count(F.lit(1)).cast("long").alias("__size")
    )
    return (
        active.join(F.broadcast(sizes), "__cohort")
        .select(
            F.col("__cohort").alias("cohort"),
            "period_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("__size"), 6).alias("retention"),
        )
    )
