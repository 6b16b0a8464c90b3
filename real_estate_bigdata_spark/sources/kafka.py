"""Kafka source/sink builders — the Spark-native replacement for the
reference's kafka-python producer/consumer pair (SURVEY §2.1 S4/S5).

Semantics preserved:

- topic `alonhadat`, earliest reset (`kafka_to_hdfs_consumer.py:17,61`)
- JSON value encoding with UTF-8 Vietnamese text intact
  (`kafka_producer.py:24`, F12 — Spark's to_json never ASCII-escapes)
- key = coalesce(link, title, fallback) (`kafka_producer.py:59-61`, F13)
  — with the fallback made *deterministic* (content hash) instead of the
  reference's `unknown_key_<time.time()>` which always fires because the
  crawler never sets link/title (latent bug, SURVEY §1.2 — not
  reproduced).

Connect retry/backoff (S4 :20-33, ST7) and graceful shutdown (ST6) are
owned by the Spark Kafka connector and StreamingQuery lifecycle.

NOTE: running these requires the `spark-sql-kafka` connector package and
a broker; in broker-less environments the builders still construct and
the JSON codec functions are testable stand-alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from real_estate_bigdata_spark.schema import RAW_LISTING_SCHEMA

__all__ = [
    "encode_kafka_records",
    "decode_kafka_records",
    "kafka_stream_source",
    "kafka_stream_sink",
]

DEFAULT_TOPIC = "alonhadat"


def encode_kafka_records(df: DataFrame) -> DataFrame:
    """records -> (key, value) Kafka envelope (S4 parity).

    key: coalesce(link, title, xxhash64(all columns)) — deterministic
    dedup key even for the reference's always-null link/title.
    value: UTF-8 JSON of the full record.
    """
    return df.select(
        F.coalesce(
            F.col("link"),
            F.col("title"),
            F.xxhash64(*[F.col(c) for c in df.columns]).cast("string"),
        )
        .cast("string")
        .alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def decode_kafka_records(
    kafka_df: DataFrame, schema: StructType = RAW_LISTING_SCHEMA
) -> DataFrame:
    """Kafka envelope -> typed records (S5 parity: blind JSON deserialize
    at kafka_to_hdfs_consumer.py:63, but under an explicit schema)."""
    return kafka_df.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r"),
        F.col("timestamp").alias("kafka_ts"),
    ).select("r.*", "kafka_ts")


def kafka_stream_source(
    spark: SparkSession,
    bootstrap: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100,
):
    """readStream from Kafka with the reference consumer's config
    (earliest reset; ~100-row micro-batches via maxOffsetsPerTrigger —
    the count half of the reference's 100-row/60-s composite trigger
    ST1; the time half is the processingTime trigger on the sink)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_stream_sink(
    df: DataFrame,
    bootstrap: str,
    topic: str,
    checkpoint: str,
):
    """writeStream to Kafka (S4 as a continuous sink); expects the
    (key, value) shape from :func:`encode_kafka_records`."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
