"""Streaming sketch maintenance — a persistent HyperLogLog register
store updated per micro-batch (NEW r14; the streaming twin of
``operators/sketches.py``: the reference re-crawls continuously
(`kafka_cc/consumer/kafka_to_hdfs_consumer.py:49-151`-class ingest
loops) and at 100 TB "distinct users/URLs per domain so far" must be
MAINTAINED incrementally, never recomputed from the full history).

Why HLL makes this store trivially correct where the fingerprint store
needs tombstone fenceposts: register-wise MAX is idempotent AND
commutative, so

* a REPLAYED epoch (foreachBatch redelivery after a crash) rewrites
  exactly its own ``ingest_batch`` partition with identical registers —
  dynamic partition overwrite makes the store converge;
* an INTERRUPTED compaction leaves base + unfolded epochs, and the next
  load's merge absorbs the redundancy — max(max(a,b), b) = max(a,b); no
  ledger, no fencepost, no claim tag.

Layout (the index-lifecycle meta-tier pattern):

* ``<store>/meta`` — one row: p + group_cols; the serve path can never
  hash with mismatched geometry.
* ``<store>/epochs/ingest_batch=N`` — per-micro-batch register deltas.
* ``<store>/base`` — the folded tier written by
  :func:`compact_hll_store` (run while the stream is stopped).

Scale posture: each micro-batch ships at most ``2^p`` register rows per
group into the store regardless of batch size; the serving merge reads
registers only (never re-reads ingested payloads); compaction bounds
the epoch-tier file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from real_estate_bigdata_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_registers,
)
from real_estate_bigdata_spark.streaming.ingest import file_stream_ingest

__all__ = [
    "run_hll_distinct_ingest",
    "load_streaming_hll",
    "streaming_hll_estimate",
    "compact_hll_store",
]


def _write_meta(spark: SparkSession, store_dir: str, p: int, group_cols):
    spark.createDataFrame(
        [(int(p), ",".join(group_cols or []))], "p int, group_cols string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{store_dir}/meta")


def _read_meta(spark: SparkSession, store_dir: str) -> tuple[int, list[str]]:
    meta = spark.read.parquet(f"{store_dir}/meta").collect()[0]
    return int(meta.p), [c for c in meta.group_cols.split(",") if c]


def run_hll_distinct_ingest(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    col: str,
    schema: StructType,
    p: int = 11,
    group_cols: list[str] | None = None,
    available_now: bool = True,
    processing_time: str = "60 seconds",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Maintain the register store over a JSONL drop directory: each
    micro-batch sketches ITS OWN rows (one bounded hash aggregate) and
    writes the delta as its epoch partition — dynamic overwrite, so a
    replayed epoch converges byte-for-byte. The geometry meta tier is
    (re)written idempotently every batch."""
    keys = list(group_cols or [])

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        _write_meta(sess, store_dir, p, keys)
        regs = hll_registers(batch_df, col, p=p, group_cols=keys)
        (
            regs.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(f"{store_dir}/epochs")
        )

    raw = file_stream_ingest(
        spark, src_dir, schema=schema, max_files_per_trigger=max_files_per_trigger
    )
    writer = raw.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def _tier_frames(spark: SparkSession, store_dir: str) -> list[DataFrame]:
    from pyspark.errors import AnalysisException

    out = []
    for sub in ("base", "epochs"):
        try:
            df = spark.read.parquet(f"{store_dir}/{sub}")
        except AnalysisException:
            continue
        out.append(df.drop("ingest_batch") if "ingest_batch" in df.columns else df)
    return out


def load_streaming_hll(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged register frame (base tier + all epoch deltas) —
    register-wise max, exactly the sketch of everything ever ingested.
    Raises if the store has no tiers (a silently-empty sketch would
    read as 'zero distinct ever seen')."""
    tiers = _tier_frames(spark, store_dir)
    if not tiers:
        raise FileNotFoundError(
            f"no HLL store tiers under {store_dir!r} — has the ingest ever"
            " committed a batch?"
        )
    return hll_merge(*tiers)


def streaming_hll_estimate(
    spark: SparkSession, store_dir: str, out_col: str = "est"
) -> DataFrame:
    """Distinct-count estimates from the store at its OWN persisted
    geometry (meta tier) — the serve path cannot drift from the
    build."""
    p, keys = _read_meta(spark, store_dir)
    return hll_estimate(
        load_streaming_hll(spark, store_dir), p,
        group_cols=keys, out_col=out_col,
    )


def compact_hll_store(spark: SparkSession, store_dir: str) -> int:
    """Fold all epoch partitions (and any prior base) into one base
    tier; run while the stream is stopped (the fingerprint-store
    compaction contract). Crash-safe WITHOUT a ledger: the fold is a
    max-merge, so if the epoch delete below never runs, the next load
    merges base with the already-folded epochs and gets the identical
    registers — redundancy, never wrongness. Returns the number of
    register rows in the folded base."""
    merged = load_streaming_hll(spark, store_dir).localCheckpoint(eager=True)
    n = merged.count()
    merged.write.mode("overwrite").parquet(f"{store_dir}/base")
    # drop the folded epoch tier (best-effort; see crash-safety note)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(f"{store_dir}/epochs")
    fs = path.getFileSystem(hconf)
    if fs.exists(path):
        fs.delete(path, True)
    return n
