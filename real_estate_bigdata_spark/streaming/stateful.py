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
    "corpus_stats_stream",
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


CORPUS_STATS_OUTPUT_SCHEMA = (
    "source string, n_docs long, n_null_docs long, ws_tokens long, "
    "n_chars long, avg_ws_tokens double"
)
CORPUS_STATS_STATE_SCHEMA = "n_docs long, n_null long, ws long, chars long"


def corpus_stats_stream(docs: DataFrame) -> DataFrame:
    """Running per-source corpus accounting over a document stream —
    the incremental twin of ``operators.text_analysis.token_accounting``
    for continuous ingest: each micro-batch updates per-source totals
    (docs, NULL docs, whitespace tokens, chars, running mean tokens)
    and re-emits the running truth for every source the batch touched
    ('update' semantics — a live corpus-size dashboard during a crawl,
    without rescanning the lake).

    The token/char counting runs BEFORE the stateful operator as JVM
    Column expressions (map-side, codegen); the pandas state function
    only sums four integers per batch, so per-key state is O(1) and the
    only shuffle is the groupBy on ``source`` — cardinality = number of
    sources, trivially small.
    """
    from pyspark.sql import functions as F

    from real_estate_bigdata_spark.functions.text import token_count

    enriched = docs.select(
        "source",
        token_count(F.col("text")).alias("__ws"),
        F.length("text").alias("__nc"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            n_docs, n_null, ws, chars = state.get
        else:
            n_docs, n_null, ws, chars = 0, 0, 0, 0
        for pdf in pdfs:
            n_docs += len(pdf)
            n_null += int(pdf["__ws"].isna().sum())
            ws += int(pdf["__ws"].fillna(0).sum())
            chars += int(pdf["__nc"].fillna(0).sum())
        state.update((int(n_docs), int(n_null), int(ws), int(chars)))
        counted = n_docs - n_null
        yield pd.DataFrame(
            [
                (
                    source,
                    n_docs,
                    n_null,
                    ws,
                    chars,
                    float(ws) / counted if counted else None,
                )
            ],
            columns=[
                "source",
                "n_docs",
                "n_null_docs",
                "ws_tokens",
                "n_chars",
                "avg_ws_tokens",
            ],
        )

    return enriched.groupBy("source").applyInPandasWithState(
        update,
        CORPUS_STATS_OUTPUT_SCHEMA,
        CORPUS_STATS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
