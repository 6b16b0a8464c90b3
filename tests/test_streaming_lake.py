"""Streaming ingest + lake tests (SURVEY §5.4): file-source ->
normalize -> partitioned sink, exactly-once under restart, corrupt-record
quarantine, compaction, Kafka codec round-trip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from real_estate_bigdata_spark.schema import RAW_LISTING_SCHEMA
from real_estate_bigdata_spark.sources import kafka as kf
from real_estate_bigdata_spark.sources import lake
from real_estate_bigdata_spark.streaming import ingest

RECORD = {
    "raw_post_date": "hôm nay",
    "duong_pho": "Đường Láng",
    "phuong_xa": "Phường Láng Thượng",
    "quan_huyen": "Quận Đống Đa",
    "thanh_pho": "Hà Nội",
    "loai_bds": "Nhà đất",
    "raw_price": "1,5 tỷ",
    "raw_area": "45,5 m2",
    "raw_kich_thuoc": "Kích thước: 4,5x20m",
    "duong_truoc_nha": "5m",
    "so_tang": "3 lầu",
    "so_phong_ngu": "4 phòng ngủ",
    "cho_de_xe": "Có",
    "source": "alonhadat",
    "link": None,
    "title": None,
}


def _write_jsonl(path, records):
    with open(path, "w", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")


def _mk(record_overrides):
    r = dict(RECORD)
    r.update(record_overrides)
    return r


class TestFileStreamIngest:
    def test_ingest_and_exactly_once_restart(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        dest = str(tmp_path / "lake")
        ckpt = str(tmp_path / "ckpt")
        _write_jsonl(src / "batch1.jsonl", [_mk({"quan_huyen": f"Quận {i}"}) for i in range(5)])

        q = ingest.run_file_ingest(spark, str(src), dest, ckpt)
        q.awaitTermination(60)
        out1 = spark.read.parquet(dest)
        assert out1.count() == 5
        # partition layout: ingest_date + source directories exist
        assert out1.select("ingest_date", "source").distinct().count() == 1

        # restart with same checkpoint + one NEW file: old file must not
        # be reprocessed (exactly-once, ST2-stronger)
        _write_jsonl(src / "batch2.jsonl", [_mk({"quan_huyen": "Gò Vấp"})])
        q2 = ingest.run_file_ingest(spark, str(src), dest, ckpt)
        q2.awaitTermination(60)
        out2 = spark.read.parquet(dest)
        assert out2.count() == 6
        assert out2.filter(F.col("quan_huyen") == "Gò Vấp").count() == 1

    def test_normalization_applied_in_flight(self, spark, tmp_path):
        src = tmp_path / "drop2"
        src.mkdir()
        _write_jsonl(src / "b.jsonl", [RECORD])
        q = ingest.run_file_ingest(
            spark, str(src), str(tmp_path / "lake2"), str(tmp_path / "ckpt2")
        )
        q.awaitTermination(60)
        row = spark.read.parquet(str(tmp_path / "lake2")).first()
        assert row.quan_huyen == "Đống Đa"
        assert row.price_ty == pytest.approx(1.5)
        assert row.cho_de_xe is True


class TestWindowedStream:
    def test_watermarked_window_on_stream(self, spark, tmp_path):
        """Drive windowed_event_counts through an actual readStream
        (memory sink) — watermark + window must run incrementally."""
        src = tmp_path / "events"
        src.mkdir()
        rows = [
            {"ts": "2024-01-01T00:10:00", "event_type": "click", "value": 1.0},
            {"ts": "2024-01-01T00:20:00", "event_type": "click", "value": 2.0},
            {"ts": "2024-01-01T01:05:00", "event_type": "view", "value": 5.0},
        ]
        _write_jsonl(src / "e.jsonl", rows)
        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .json(str(src))
        )
        windowed = ingest.windowed_event_counts(stream)
        # complete mode: append would hold windows back until the
        # watermark passes, and this bounded drain ends before that.
        q = (
            windowed.writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_w"))
            .start()
        )
        q.awaitTermination(60)
        got = {
            (str(r.window_start), r.event_type): (r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert got == {
            ("2024-01-01 00:00:00", "click"): (2, 3.0),
            ("2024-01-01 01:00:00", "view"): (1, 5.0),
        }

    def test_streaming_window_counts_equal_batch_operator(self, spark, tmp_path):
        """The streaming windowed aggregate over real testdata (driven
        through readStream + availableNow) must equal the batch
        ``tumbling_window_stats`` result on the same rows — the §2.9
        batch/stream twin contract, locked as code evolves."""
        from real_estate_bigdata_spark.operators.events import tumbling_window_stats
        from real_estate_bigdata_spark.schema import load_table

        events = load_table(spark, "/root/testdata/sf0.001", "events").select(
            "ts", "event_type", "value"
        )
        src = str(tmp_path / "events_stream")
        events.write.parquet(src)
        stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(src)
        q = (
            ingest.windowed_event_counts(stream)
            .writeStream.format("memory")
            .queryName("win_twin")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_twin"))
            .start()
        )
        q.awaitTermination(120)
        streamed = sorted(
            map(tuple, spark.sql("SELECT * FROM win_twin").collect())
        )
        batch = sorted(map(tuple, tumbling_window_stats(events).collect()))
        assert streamed == batch and len(batch) > 0


class TestLake:
    def test_quarantine_split(self, spark, tmp_path):
        p = tmp_path / "raw.jsonl"
        with open(p, "w", encoding="utf-8") as f:
            f.write(json.dumps(RECORD, ensure_ascii=False) + "\n")
            f.write("this is not json\n")
            f.write(json.dumps(_mk({"quan_huyen": "Quận 3"}), ensure_ascii=False) + "\n")
        raw = lake.read_raw_jsonl(spark, str(p))
        clean, bad, release = lake.quarantine_split(raw)
        assert clean.count() == 2
        assert bad.count() == 1
        assert "not json" in bad.first()[0]
        # release() must drop the cached parse (no leak in long sessions)
        before = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert before >= 1
        release()
        after = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert after == before - 1

    def test_compaction_reduces_files_keeps_rows(self, spark, tmp_path):
        dest = str(tmp_path / "lake3")
        df = spark.range(1000).select(
            F.col("id"),
            F.lit("2025-04-24").cast("date").alias("ingest_date"),
            F.lit("alonhadat").alias("source"),
        )
        # fragment: 16 small files in one partition
        df.repartition(16).write.partitionBy("ingest_date", "source").parquet(dest)
        import glob

        files_before = glob.glob(f"{dest}/**/*.parquet", recursive=True)
        assert len(files_before) >= 16
        lake.compact_partitions(spark, dest, target_rows_per_file=1_000_000)
        files_after = glob.glob(f"{dest}/**/*.parquet", recursive=True)
        assert len(files_after) < len(files_before)
        assert spark.read.parquet(dest).count() == 1000
        assert set(
            r.id for r in spark.read.parquet(dest).select("id").collect()
        ) == set(range(1000))

    def test_compaction_keeps_null_partition_rows(self, spark, tmp_path):
        """Rows in a NULL-valued partition (__HIVE_DEFAULT_PARTITION__)
        must survive compaction — the per-partition salting join is
        NULL-safe (a plain equi-join would silently drop them; same loss
        class as the r1 rollup NULL-partition bug)."""
        dest = str(tmp_path / "lake_null")
        df = spark.range(20).select(
            F.col("id"),
            F.lit("2025-04-24").cast("date").alias("ingest_date"),
            F.when(F.col("id") < 5, F.lit(None).cast("string"))
            .otherwise(F.lit("alonhadat"))
            .alias("source"),
        )
        df.repartition(4).write.partitionBy("ingest_date", "source").parquet(dest)
        lake.compact_partitions(spark, dest, target_rows_per_file=1000)
        out = spark.read.parquet(dest)
        assert out.count() == 20
        assert out.filter(F.col("source").isNull()).count() == 5

    def test_compaction_splits_hot_partition_to_target_size(self, spark, tmp_path):
        """A hot partition must split into ~target_rows_per_file files,
        not collapse into one giant file + straggler task (the r1 bug:
        repartitioning by partition cols alone sent every row of a
        partition to a single task)."""
        import glob

        dest = str(tmp_path / "lake_hot")
        df = spark.range(1000).select(
            F.col("id"),
            F.lit("2025-04-24").cast("date").alias("ingest_date"),
            F.lit("alonhadat").alias("source"),
        )
        df.repartition(2).write.partitionBy("ingest_date", "source").parquet(dest)
        lake.compact_partitions(spark, dest, target_rows_per_file=300)
        files = glob.glob(f"{dest}/**/*.parquet", recursive=True)
        assert len(files) >= 4  # ceil(1000/300)
        for f in files:
            assert spark.read.parquet(f).count() <= 300
        out = spark.read.parquet(dest)
        assert out.count() == 1000
        assert {r.id for r in out.select("id").collect()} == set(range(1000))


class TestStreamingLakeCompaction:
    def test_streaming_sink_requires_dest_and_compacts(self, spark, tmp_path):
        """A streaming-sink lake (has _spark_metadata) refuses in-place
        compaction and compacts correctly into a silver table."""
        src = tmp_path / "drop"
        src.mkdir()
        for b in range(3):
            _write_jsonl(
                src / f"b{b}.jsonl",
                [_mk({"quan_huyen": f"Quận {b}-{i}"}) for i in range(4)],
            )
        dest = str(tmp_path / "bronze")
        q = ingest.run_file_ingest(spark, str(src), dest, str(tmp_path / "ck"))
        q.awaitTermination(60)
        with pytest.raises(ValueError, match="_spark_metadata"):
            lake.compact_partitions(spark, dest)
        silver = str(tmp_path / "silver")
        lake.compact_partitions(spark, dest, dest_path=silver)
        out = spark.read.parquet(silver)
        assert out.count() == 12
        # bronze remains a valid streaming table
        assert spark.read.parquet(dest).count() == 12


class TestKafkaCodec:
    def test_encode_decode_roundtrip_utf8(self, spark):
        df = spark.createDataFrame([tuple(RECORD.values())], RAW_LISTING_SCHEMA)
        enc = kf.encode_kafka_records(df)
        row = enc.first()
        assert row.key is not None  # deterministic hash fallback, not time-based
        assert "Đống Đa" in row.value  # UTF-8 not escaped (F12 parity)
        # decode back under the schema (simulate the envelope)
        env = enc.select(
            "key", "value", F.lit("alonhadat").alias("topic"),
            F.current_timestamp().alias("timestamp"),
        )
        dec = kf.decode_kafka_records(env)
        back = dec.first()
        assert back.quan_huyen == "Quận Đống Đa"
        assert back.raw_price == "1,5 tỷ"

    def test_key_deterministic_across_runs(self, spark):
        df = spark.createDataFrame([tuple(RECORD.values())], RAW_LISTING_SCHEMA)
        k1 = kf.encode_kafka_records(df).first().key
        k2 = kf.encode_kafka_records(df).first().key
        assert k1 == k2


class TestCompositeFlushIngest:
    """ST1 reference-exact 100-row/60-s composite flush (opt-in twin of
    run_file_ingest; VERDICT r8 task #8)."""

    def test_count_half_flushes_at_threshold(self, spark, tmp_path):
        # 3 files x 40 rows, one file per micro-batch: the backlog
        # crosses flush_rows=100 on the third batch -> everything lands
        src = tmp_path / "drop"
        src.mkdir()
        for f in range(3):
            _write_jsonl(
                src / f"f{f}.jsonl",
                [_mk({"quan_huyen": f"Quận {f}-{i}"}) for i in range(40)],
            )
        dest = str(tmp_path / "lake")
        q = ingest.run_composite_flush_ingest(
            spark, str(src), dest, str(tmp_path / "ck"),
            flush_rows=100, flush_seconds=1e9, max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        assert spark.read.parquet(dest).count() == 120
        # staging fully drained by the threshold flush
        assert ingest.finalize_composite_flush(spark, dest) == 0

    def test_below_threshold_stays_staged_until_finalize(self, spark, tmp_path):
        src = tmp_path / "drop2"
        src.mkdir()
        _write_jsonl(src / "f.jsonl", [_mk({}) for _ in range(5)])
        dest = str(tmp_path / "lake2")
        q = ingest.run_composite_flush_ingest(
            spark, str(src), dest, str(tmp_path / "ck2"),
            flush_rows=100, flush_seconds=1e9,
        )
        q.awaitTermination(120)
        # sub-threshold rows are staged, invisible to a lake read, and
        # drained exactly once by the shutdown-hook twin
        assert ingest.finalize_composite_flush(spark, dest) == 5
        assert spark.read.parquet(dest).count() == 5
        assert ingest.finalize_composite_flush(spark, dest) == 0

    def test_time_half_flushes_every_batch_at_zero(self, spark, tmp_path):
        src = tmp_path / "drop3"
        src.mkdir()
        _write_jsonl(src / "f.jsonl", [_mk({}) for _ in range(5)])
        dest = str(tmp_path / "lake3")
        q = ingest.run_composite_flush_ingest(
            spark, str(src), dest, str(tmp_path / "ck3"),
            flush_rows=10_000, flush_seconds=0.0,
        )
        q.awaitTermination(120)
        assert spark.read.parquet(dest).count() == 5
        assert ingest.finalize_composite_flush(spark, dest) == 0

    def test_restart_drains_leftovers_no_clean_path_duplicates(
        self, spark, tmp_path
    ):
        src = tmp_path / "drop4"
        src.mkdir()
        dest = str(tmp_path / "lake4")
        ckpt = str(tmp_path / "ck4")
        _write_jsonl(
            src / "a.jsonl",
            [_mk({"quan_huyen": f"A{i}"}) for i in range(60)],
        )
        q = ingest.run_composite_flush_ingest(
            spark, str(src), dest, ckpt,
            flush_rows=100, flush_seconds=1e9,
        )
        q.awaitTermination(120)
        # 60 staged, below threshold. Restart with one new 60-row file:
        # backlog 120 crosses the threshold -> both epochs flush, the
        # already-processed file is NOT re-read (checkpoint), and the
        # clean path emits no duplicates
        _write_jsonl(
            src / "b.jsonl",
            [_mk({"quan_huyen": f"B{i}"}) for i in range(60)],
        )
        q2 = ingest.run_composite_flush_ingest(
            spark, str(src), dest, ckpt,
            flush_rows=100, flush_seconds=1e9,
        )
        q2.awaitTermination(120)
        out = spark.read.parquet(dest)
        assert out.count() == 120
        assert out.select("quan_huyen").distinct().count() == 120
        assert ingest.finalize_composite_flush(spark, dest) == 0

    def test_claimed_epochs_flush_exactly_once_under_race(
        self, spark, tmp_path
    ):
        """ADVICE r9: a finalize racing the in-batch flush must not
        double-append. Claims are atomic dir renames — once one flusher
        claims the staged epochs, a second flusher sees nothing to
        claim and flushes zero rows."""
        src = tmp_path / "drop5"
        src.mkdir()
        _write_jsonl(src / "f.jsonl", [_mk({}) for _ in range(5)])
        dest = str(tmp_path / "lake5")
        q = ingest.run_composite_flush_ingest(
            spark, str(src), dest, str(tmp_path / "ck5"),
            flush_rows=100, flush_seconds=1e9,
        )
        q.awaitTermination(120)
        staging = dest + "/_flush_staging"
        # flusher A claims every staged epoch (rename to _flushing_)
        claimed = ingest._claim_staged(spark, staging)
        assert claimed and all("/_flushing_" in d for d in claimed)
        # flusher B (either a second finalize or the in-batch flush)
        # finds nothing claimable -> flushes 0, no double-append
        assert ingest._claim_staged(spark, staging) == []
        assert ingest._flush_staged(spark, staging, dest) == 0
        # finalize adopts A's orphaned claims (A "crashed" mid-flush)
        assert ingest.finalize_composite_flush(spark, dest) == 5
        assert spark.read.parquet(dest).count() == 5
        assert ingest.finalize_composite_flush(spark, dest) == 0

    def test_replayed_epoch_claims_unique_no_nesting(
        self, spark, tmp_path
    ):
        """ADVICE r10: a crash between claim and append leaves an
        orphaned ``_flushing_*ingest_batch=N`` claim, and the replayed
        micro-batch recreates ``ingest_batch=N``. The NEXT claim of the
        recreated epoch must not rename INTO the existing orphan
        (HDFS/local rename-into-directory semantics would nest a
        partition-named subdir inside it) — uuid-unique claim names
        make every rename target fresh, and finalize adopts both
        claims as two separate epochs."""
        dest = str(tmp_path / "lake6")
        staging = dest + "/_flush_staging"

        def _stage_epoch(tag):
            spark.createDataFrame(
                [(tag, "2024-01-01", "srcA")],
                "quan_huyen string, ingest_date string, source string",
            ).coalesce(1).write.mode("overwrite").parquet(
                staging + "/ingest_batch=7"
            )

        _stage_epoch("first")
        first = ingest._claim_staged(spark, staging)
        assert len(first) == 1  # orphaned claim (flusher "crashed")
        _stage_epoch("second")  # replayed micro-batch, same epoch id
        second = ingest._claim_staged(spark, staging)
        assert len(second) == 1 and second != first
        # neither claim nested the other: each reads exactly one row,
        # with the staged schema only (no leaked ingest_batch column)
        for d, tag in [(first[0], "first"), (second[0], "second")]:
            got = spark.read.parquet(d)
            assert got.columns == ["quan_huyen", "ingest_date", "source"]
            assert [r.quan_huyen for r in got.collect()] == [tag]
        # finalize adopts both orphans -> 2 rows total, exactly once
        assert ingest.finalize_composite_flush(spark, dest) == 2
        out = spark.read.parquet(dest)
        assert sorted(r.quan_huyen for r in out.collect()) == [
            "first", "second",
        ]
        assert ingest.finalize_composite_flush(spark, dest) == 0

    def test_validates_thresholds(self, spark, tmp_path):
        with pytest.raises(ValueError):
            ingest.run_composite_flush_ingest(
                spark, str(tmp_path), str(tmp_path / "l"),
                str(tmp_path / "c"), flush_rows=0,
            )
        with pytest.raises(ValueError):
            ingest.run_composite_flush_ingest(
                spark, str(tmp_path), str(tmp_path / "l"),
                str(tmp_path / "c"), flush_seconds=-1.0,
            )
