"""Stream-stream joins with watermark-bounded state — the streaming
twin of ``operators.temporal.interval_join``.

The reference repo has no analogue (its streaming tier is
crawl->Kafka->JSONL file movement, SURVEY §3); this is the §2.9 ABSENT
extension that makes the event tables joinable IN FLIGHT: correlate a
click stream with an impression stream while both are still arriving,
instead of landing both and running the batch interval join later.

Execution model (Spark-native, no custom state code): both inputs
carry event-time watermarks, the join condition is an equi key plus a
bounded time range, and Structured Streaming derives the state
retention from the watermark + range — each side buffers only rows
that could still find a partner; older state is evicted. Without the
time bound the state would grow without limit, which is why
``stream_stream_interval_join`` REQUIRES the range and the watermarks
rather than defaulting them.

At 100 TB-of-events scale the state store is the bottleneck: the equi
key carries the shuffle exactly like the batch join, and the state per
key is bounded by (watermark + interval width) x arrival rate. Size
the watermark to the real out-of-orderness, not to a comfort margin —
every extra minute of watermark is a minute of state on every key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_stream_interval_join"]


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    width_seconds: int,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming pairs (left, right) with the same ``on`` key and
    ``left.ts < right.ts <= left.ts + width_seconds`` — identical
    semantics and output schema to the batch
    ``operators.temporal.interval_join`` (right columns ``r_``-prefixed),
    so a replay of the landed data through the batch operator converges
    to what the stream emitted (pinned by
    ``tests/test_streaming_joins.py``).

    Both sides get ``watermark`` as their event-time watermark; Spark
    bounds each side's join state to the watermark plus the interval
    width and evicts older buffered rows. Works on batch DataFrames
    too (watermarks are a no-op there), which is what the convergence
    test exploits.
    """
    if width_seconds <= 0:
        raise ValueError(f"width_seconds must be positive, got {width_seconds}")
    l = left.withWatermark(ts_col, watermark)
    r = right.withWatermark(ts_col, watermark).select(
        F.col(on).alias("__rk"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    )
    cond = (
        (F.col(on) == F.col("__rk"))
        & (F.col(f"r_{ts_col}") > F.col(ts_col))
        & (
            F.col(f"r_{ts_col}")
            <= F.col(ts_col) + F.make_interval(secs=F.lit(width_seconds))
        )
    )
    return l.join(r, cond).drop("__rk")
