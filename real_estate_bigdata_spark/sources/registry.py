"""Config-driven source registry (reference X1/X2).

The reference hard-codes its source table as a Python list of
(name, crawl_fn, topic) tuples in `scheduler/scheduler_runner.py:28-31`
and fans out one thread per source (`:46-53`). Here a source is a
declarative spec and the fan-out is one INDEPENDENT Structured
Streaming query per source — isolation (a broken source stalls only its
own query, X3), per-source checkpoints, and the Spark scheduler owns
the parallelism instead of a thread pool.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from real_estate_bigdata_spark.functions.normalize import normalize_listings
from real_estate_bigdata_spark.schema import RAW_LISTING_SCHEMA
from real_estate_bigdata_spark.streaming.ingest import file_stream_ingest

__all__ = ["SourceSpec", "SourceRegistry"]


@dataclass(frozen=True)
class SourceSpec:
    """One listing source: where raw records drop, under what schema.

    ``kind='file'`` reads a JSONL drop directory (the testable stand-in
    for a live scraper, SURVEY S1); ``kind='kafka'`` subscribes to
    ``topic`` via ``sources.kafka`` (requires a broker — builder only in
    this environment).
    """

    name: str
    src: str  # drop directory (file) or bootstrap servers (kafka)
    kind: str = "file"
    topic: str | None = None
    schema: StructType = field(default_factory=lambda: RAW_LISTING_SCHEMA)


class SourceRegistry:
    """Registered sources -> one streaming ingest query each, all
    landing in the same partitioned lake under `source=<name>`."""

    def __init__(self) -> None:
        self._specs: dict[str, SourceSpec] = {}

    def register(self, spec: SourceSpec) -> "SourceRegistry":
        if spec.name in self._specs:
            raise ValueError(f"source {spec.name!r} already registered")
        self._specs[spec.name] = spec
        return self

    def specs(self) -> list[SourceSpec]:
        return list(self._specs.values())

    def start_all(
        self,
        spark: SparkSession,
        lake_path: str,
        checkpoint_root: str,
        available_now: bool = True,
    ) -> list[StreamingQuery]:
        """Launch one ingest query per source (the X2 fan-out). Each
        normalizes in-flight and appends to its OWN `source=<name>`
        subtree of the lake with its own checkpoint: a streaming file
        sink owns its directory's `_spark_metadata` transaction log, so
        concurrent queries must not share a sink path — writing each
        source INTO its partition directory keeps one lake layout
        (`source` comes back as a partition column on a root read) while
        giving every query exclusive sink ownership. Provenance is the
        registry name, never the payload's claimed source."""
        # validate EVERY spec before starting ANY query — failing midway
        # would orphan already-started queries with no handle returned
        unsupported = [s.name for s in self.specs() if s.kind != "file"]
        if unsupported:
            raise NotImplementedError(
                f"source kind(s) for {unsupported} need a live broker; "
                "use sources.kafka builders directly"
            )
        queries = []
        for spec in self.specs():
            raw = file_stream_ingest(spark, spec.src, schema=spec.schema)
            normalized = normalize_listings(raw).drop("source")
            writer = (
                normalized.writeStream.format("parquet")
                .option("path", f"{lake_path}/source={spec.name}")
                .option("checkpointLocation", f"{checkpoint_root}/{spec.name}")
                .partitionBy("ingest_date")
                .outputMode("append")
            )
            writer = (
                writer.trigger(availableNow=True)
                if available_now
                else writer.trigger(processingTime="60 seconds")
            )
            queries.append(writer.start())
        return queries
