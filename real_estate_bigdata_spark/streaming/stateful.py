"""Custom stateful streaming operators (applyInPandasWithState).

SURVEY §2.9: the reference's streaming layer is stateless append-only
(buffer -> flush); event-time state is ABSENT and north-star scope.
This module provides the canonical custom stateful operator — gap-based
sessionization over an event stream — implemented with
``applyInPandasWithState``: per-key state travels with the shuffle, each
micro-batch updates it via an Arrow-batched pandas function, and the
emitted rows converge to the batch ``operators.events.sessionize``
semantics (30-min inactivity gap) as the stream drains.

Scale shape: state is O(1) per active key (one open session tuple), the
per-batch work is one shuffle on the key — the same plan as the batch
window, but incremental.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "sessionize_stream",
    "dedup_stream",
    "SESSION_OUTPUT_SCHEMA",
    "SESSION_STATE_SCHEMA",
]


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: keep the first record per key,
    dropping replays that arrive within the watermark horizon.

    `dropDuplicatesWithinWatermark` bounds state to the watermark window
    (plain streaming dropDuplicates retains key state FOREVER — a memory
    leak on an unbounded keyspace like listing links). This is the
    streaming twin of the batch `operators.dedup.exact_dedup`, matched
    to the reference's re-crawl policy (ST5: pages 1..N re-scraped every
    run, so duplicates arrive minutes apart — well inside one horizon).
    Records of a key recurring AFTER the horizon pass through again:
    downstream batch dedup (exact/MinHash) owns cross-horizon identity.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_seq long, session_start timestamp, "
    "session_end timestamp, n_events long, session_value double, closed boolean"
)
#: (open session): seq, start/last event time in epoch-us, count, value sum
SESSION_STATE_SCHEMA = "session_seq long, start_us long, last_us long, n long, vsum double"

_US = 1_000_000


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Incremental gap sessionization of a streaming (user_id, ts,
    value) DataFrame. Emits, per micro-batch, every session the batch
    touched: finalized sessions with ``closed=true`` (a later event
    opened a new one) and the still-open session with ``closed=false``
    (its aggregates are the running truth so far — re-emitted with
    updated numbers by later batches, 'update' output semantics).

    Within a key, events must arrive in event-time order across batches
    (guaranteed by a watermarked, ordered source or an upstream
    sort-within-batch; out-of-order events within one batch are sorted
    here).
    """
    gap_us = gap_seconds * _US

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            seq, start_us, last_us, n, vsum = state.get
        else:
            seq, start_us, last_us, n, vsum = 0, None, None, 0, 0.0
        out: list[tuple] = []

        def emit(closed: bool) -> None:
            out.append(
                (
                    user_id,
                    seq,
                    pd.Timestamp(start_us, unit="us"),
                    pd.Timestamp(last_us, unit="us"),
                    n,
                    float(vsum),
                    closed,
                )
            )

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"] if "event_id" in batch else ["ts"])
        for ts, value in zip(batch["ts"], batch["value"]):
            ts_us = ts.value // 1000
            if start_us is None:
                seq, start_us, last_us, n, vsum = seq + 1, ts_us, ts_us, 1, float(value)
            elif ts_us - last_us > gap_us:
                emit(True)
                seq, start_us, last_us, n, vsum = seq + 1, ts_us, ts_us, 1, float(value)
            else:
                last_us, n, vsum = ts_us, n + 1, vsum + float(value)
        if start_us is not None:
            emit(False)
            state.update((int(seq), int(start_us), int(last_us), int(n), float(vsum)))
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_seq",
                "session_start",
                "session_end",
                "n_events",
                "session_value",
                "closed",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
