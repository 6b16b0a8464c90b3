"""Custom stateful streaming operator test: incremental sessionization
via applyInPandasWithState must converge to the batch sessionize
semantics once the stream drains, with state genuinely crossing
micro-batch boundaries (maxFilesPerTrigger=1 forces one batch per
file)."""

from __future__ import annotations

import json

from real_estate_bigdata_spark.operators import events as ev
from real_estate_bigdata_spark.streaming.stateful import sessionize_stream

EVENT_SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def _write_jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _event(eid, user, minute, value):
    return {
        "event_id": eid,
        "user_id": user,
        "ts": f"2024-01-01T{minute // 60:02d}:{minute % 60:02d}:00.000000Z",
        "value": value,
    }


def test_stateful_sessionize_converges_to_batch(spark, tmp_path):
    src = tmp_path / "events_in"
    src.mkdir()
    # file boundary splits user 1's first session (state must carry):
    # user 1: 0,10 | 20 -> one 3-event session; 70 -> second session
    # user 2: 5 | (none)  -> one open session
    batch1 = [_event(1, 1, 0, 1.0), _event(2, 1, 10, 2.0), _event(3, 2, 5, 5.0)]
    batch2 = [_event(4, 1, 20, 3.0), _event(5, 1, 70, 4.0)]
    _write_jsonl(src / "a.jsonl", batch1)
    _write_jsonl(src / "b.jsonl", batch2)
    # the file source orders batches by modification time; pin it so
    # batch1 (earlier event time) is genuinely the first micro-batch
    import os
    import time

    now = time.time()
    os.utime(src / "a.jsonl", (now - 60, now - 60))
    os.utime(src / "b.jsonl", (now, now))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("select * from sessions_out").collect()
    assert len(rows) > 0
    # multiple batches ran: user 1 session 1 must appear more than once
    # (initial 2-event emission, then the 3-event update)
    u1s1 = [r for r in rows if r.user_id == 1 and r.session_seq == 1]
    assert len(u1s1) >= 2, rows
    assert {r.n_events for r in u1s1} == {2, 3}

    # final state per (user, session): the emission with max n_events
    final = {}
    for r in rows:
        k = (r.user_id, r.session_seq)
        if k not in final or r.n_events > final[k].n_events:
            final[k] = r

    from datetime import datetime

    all_events = spark.createDataFrame(
        [
            (
                e["event_id"],
                e["user_id"],
                datetime.fromisoformat(e["ts"].replace("Z", "")),
                e["value"],
            )
            for e in batch1 + batch2
        ],
        EVENT_SCHEMA,
    )
    expected = {
        (r.user_id, r.session_seq): r
        for r in ev.sessionize(all_events).collect()
    }
    assert set(final) == set(expected)
    for k, exp in expected.items():
        got = final[k]
        assert got.n_events == exp.n_events, k
        assert got.session_start == exp.session_start, k
        assert got.session_end == exp.session_end, k
        assert round(got.session_value, 2) == exp.session_value, k

    # closed flags: user 1 session 1 closed by session 2; open sessions not
    assert final[(1, 1)].closed is True
    assert final[(1, 2)].closed is False
    assert final[(2, 1)].closed is False


def test_dedup_stream_drops_replays_within_watermark(spark, tmp_path):
    """Replayed records (same key) arriving in later micro-batches
    within the watermark must be dropped; distinct keys all survive."""
    import os
    import time

    from real_estate_bigdata_spark.streaming.stateful import dedup_stream

    src = tmp_path / "dd_in"
    src.mkdir()
    b1 = [_event(1, 1, 0, 1.0), _event(2, 2, 1, 2.0)]
    b2 = [_event(1, 1, 0, 1.0), _event(3, 3, 2, 3.0)]  # event 1 replayed
    _write_jsonl(src / "a.jsonl", b1)
    _write_jsonl(src / "b.jsonl", b2)
    now = time.time()
    os.utime(src / "a.jsonl", (now - 60, now - 60))
    os.utime(src / "b.jsonl", (now, now))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        dedup_stream(stream, ["event_id"], watermark="2 hours")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select event_id from dedup_out").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3], ids


def test_corpus_stats_stream_running_totals(spark, tmp_path):
    """Per-source running totals must accumulate across micro-batches
    (maxFilesPerTrigger=1) and converge to the batch token_accounting
    numbers once the stream drains; NULL docs count separately and
    don't poison sums."""
    import os
    import time

    from real_estate_bigdata_spark.streaming.stateful import corpus_stats_stream

    DOC_SCHEMA = "doc_id long, source string, text string"
    src = tmp_path / "docs_in"
    src.mkdir()
    batch1 = [
        {"doc_id": 1, "source": "a", "text": "one two three"},
        {"doc_id": 2, "source": "a", "text": None},
        {"doc_id": 3, "source": "b", "text": "x y"},
    ]
    batch2 = [
        {"doc_id": 4, "source": "a", "text": "four five"},
        {"doc_id": 5, "source": "b", "text": "z"},
    ]
    _write_jsonl(src / "a.jsonl", batch1)
    _write_jsonl(src / "b.jsonl", batch2)
    now = time.time()
    os.utime(src / "a.jsonl", (now - 60, now - 60))
    os.utime(src / "b.jsonl", (now, now))

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        corpus_stats_stream(stream)
        .writeStream.format("memory")
        .queryName("corpus_stats_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM corpus_stats_out").collect()
    # update mode re-emits per batch; the LAST emission per source is
    # the running truth — reconstruct it by max n_docs
    final = {}
    for r in rows:
        if r.source not in final or r.n_docs > final[r.source].n_docs:
            final[r.source] = r
    a, b = final["a"], final["b"]
    assert (a.n_docs, a.n_null_docs, a.ws_tokens) == (3, 1, 5)
    assert abs(a.avg_ws_tokens - 2.5) < 1e-9
    assert (b.n_docs, b.n_null_docs, b.ws_tokens) == (2, 0, 3)
    # intermediate emission for source a existed with batch-1-only totals
    partials = [r for r in rows if r.source == "a" and r.n_docs == 2]
    assert partials and partials[0].ws_tokens == 3
