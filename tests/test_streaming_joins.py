"""Stream-stream interval join: joined IN FLIGHT across micro-batches,
watermark-bounded state, and convergence to the batch interval join on
the same landed data."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from real_estate_bigdata_spark.operators.temporal import interval_join
from real_estate_bigdata_spark.streaming.joins import stream_stream_interval_join

EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("kind", StringType()),
    ]
)


def _write_events(path, rows):
    with open(path, "w") as f:
        for uid, ts, kind in rows:
            f.write(json.dumps({"user_id": uid, "ts": ts, "kind": kind}) + "\n")


def _stream(spark, d):
    return spark.readStream.schema(EVENT_SCHEMA).json(str(d))


class TestStreamStreamIntervalJoin:
    def test_joins_across_micro_batches_and_converges_to_batch(self, spark, tmp_path):
        ldir, rdir = tmp_path / "l", tmp_path / "r"
        ldir.mkdir()
        rdir.mkdir()
        # left: views; right: purchases. Purchase at +5 min joins a
        # 10-min window; purchase at +20 min must NOT.
        _write_events(
            ldir / "a.jsonl",
            [
                (1, "2024-01-01T10:00:00", "view"),
                (2, "2024-01-01T10:00:00", "view"),
                (3, "2024-01-01T10:00:00", "view"),
            ],
        )
        # right arrives split across two files -> two micro-batches
        # (maxFilesPerTrigger=1): the join must buffer left state and
        # match rows from BOTH batches
        _write_events(rdir / "b1.jsonl", [(1, "2024-01-01T10:05:00", "buy")])
        _write_events(
            rdir / "b2.jsonl",
            [
                (2, "2024-01-01T10:08:00", "buy"),
                (3, "2024-01-01T10:20:00", "buy"),  # outside the window
                (9, "2024-01-01T10:05:00", "buy"),  # no matching view
            ],
        )
        left = _stream(spark, ldir)
        right = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(rdir))
        )
        joined = stream_stream_interval_join(left, right, "user_id", 600)
        q = (
            joined.writeStream.format("memory")
            .queryName("ssj_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.kind, r.r_kind)
            for r in spark.sql("SELECT * FROM ssj_out").collect()
        }
        assert got == {(1, "view", "buy"), (2, "view", "buy")}

        # replaying the landed data through the BATCH interval join
        # gives the identical pair set (streaming/batch convergence)
        lb = spark.read.schema(EVENT_SCHEMA).json(str(ldir))
        rb = spark.read.schema(EVENT_SCHEMA).json(str(rdir))
        batch = interval_join(lb, rb, "user_id", 600)
        batch_got = {(r.user_id, r.kind, r.r_kind) for r in batch.collect()}
        assert batch_got == got

    def test_rejects_unbounded_interval(self, spark, tmp_path):
        import pytest

        d = tmp_path / "x"
        d.mkdir()
        s = _stream(spark, d)
        with pytest.raises(ValueError):
            stream_stream_interval_join(s, s, "user_id", 0)
