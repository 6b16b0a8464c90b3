"""Streaming HLL register store (streaming/sketch_store.py, NEW r14):
per-micro-batch register deltas, cross-restart accumulation, serve-path
geometry from the meta tier, and the max-merge idempotency that makes
compaction crash-safe without a ledger."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from real_estate_bigdata_spark.operators import sketches as sk
from real_estate_bigdata_spark.streaming import sketch_store as ss

SCHEMA = "user_id long, domain string"


def _schema():
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        [StructField("user_id", LongType()), StructField("domain", StringType())]
    )


def _write_jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        for uid, dom in rows:
            f.write(json.dumps({"user_id": uid, "domain": dom}) + "\n")


def _run(spark, src, store, ckpt, **kw):
    q = ss.run_hll_distinct_ingest(
        spark, str(src), str(store), str(ckpt), "user_id",
        schema=_schema(), p=9, group_cols=["domain"], **kw
    )
    q.awaitTermination(120)


def _batch_regs(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return sk.hll_registers(df, "user_id", p=9, group_cols=["domain"])


class TestHllIngest:
    def test_store_equals_batch_sketch_of_everything(self, spark, tmp_path):
        """The accumulated store's merged registers equal the batch
        sketch of the full history EXACTLY — across a stream restart."""
        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        b1 = [(i, "a.com") for i in range(200)] + [(i, "b.com") for i in range(40)]
        _write_jsonl(src / "b1.jsonl", b1)
        _run(spark, src, store, ckpt)

        b2 = [(i, "a.com") for i in range(100, 300)]  # 100 overlap, 100 new
        _write_jsonl(src / "b2.jsonl", b2)
        _run(spark, src, store, ckpt)  # restart, same checkpoint

        merged = sorted(
            map(tuple, ss.load_streaming_hll(spark, str(store)).collect())
        )
        want = sorted(map(tuple, _batch_regs(spark, b1 + b2).collect()))
        assert merged == want

    def test_estimate_serves_at_persisted_geometry(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        rows = [(i, "a.com") for i in range(500)] + [(i, "b.com") for i in range(20)]
        _write_jsonl(src / "b1.jsonl", rows)
        _run(spark, src, store, ckpt)
        got = {
            r.domain: r.est
            for r in ss.streaming_hll_estimate(spark, str(store)).collect()
        }
        # p=9 -> ~4.6% standard error; b.com (20) sits in linear counting
        assert abs(got["a.com"] - 500) / 500 < 0.15
        assert abs(got["b.com"] - 20) < 3

    def test_compaction_preserves_registers_and_folds_epochs(self, spark, tmp_path):
        import os

        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        _write_jsonl(src / "b1.jsonl", [(i, "a.com") for i in range(300)])
        _run(spark, src, store, ckpt)
        before = sorted(
            map(tuple, ss.load_streaming_hll(spark, str(store)).collect())
        )
        n = ss.compact_hll_store(spark, str(store))
        assert n == len(before)
        assert not os.path.exists(str(store / "epochs"))
        after = sorted(
            map(tuple, ss.load_streaming_hll(spark, str(store)).collect())
        )
        assert after == before
        # estimates still serve from the folded base + meta tier
        est = ss.streaming_hll_estimate(spark, str(store)).collect()
        assert len(est) == 1

    def test_interrupted_compaction_converges(self, spark, tmp_path):
        """Crash-safety WITHOUT a ledger: if the epoch delete never
        runs (base written, epochs still present), the merge absorbs
        the redundancy — max is idempotent."""
        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        _write_jsonl(src / "b1.jsonl", [(i, "a.com") for i in range(300)])
        _run(spark, src, store, ckpt)
        before = sorted(
            map(tuple, ss.load_streaming_hll(spark, str(store)).collect())
        )
        # simulate the interrupted fold: write base, KEEP epochs
        merged = ss.load_streaming_hll(spark, str(store)).localCheckpoint(
            eager=True
        )
        merged.write.mode("overwrite").parquet(str(store / "base"))
        assert (store / "epochs").exists()
        after = sorted(
            map(tuple, ss.load_streaming_hll(spark, str(store)).collect())
        )
        assert after == before

    def test_ingest_after_compaction_keeps_accumulating(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        b1 = [(i, "a.com") for i in range(200)]
        _write_jsonl(src / "b1.jsonl", b1)
        _run(spark, src, store, ckpt)
        ss.compact_hll_store(spark, str(store))
        b2 = [(i, "a.com") for i in range(150, 400)]
        _write_jsonl(src / "b2.jsonl", b2)
        _run(spark, src, store, ckpt)
        merged = sorted(
            map(tuple, ss.load_streaming_hll(spark, str(store)).collect())
        )
        want = sorted(map(tuple, _batch_regs(spark, b1 + b2).collect()))
        assert merged == want

    def test_torn_base_write_serves_prior_compaction(self, spark, tmp_path):
        """ADVICE r14: a second compaction that crashes MID base write
        (new version dir present, no _SUCCESS) must not lose the
        previously-compacted registers — the loader serves the newest
        COMMITTED base version."""
        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        b1 = [(i, "a.com") for i in range(300)]
        _write_jsonl(src / "b1.jsonl", b1)
        _run(spark, src, store, ckpt)
        ss.compact_hll_store(spark, str(store))  # -> base/v0, epochs gone
        before = sorted(
            map(tuple, ss.load_streaming_hll(spark, str(store)).collect())
        )
        # simulate a torn v1 write: directory + a junk file, NO _SUCCESS
        torn = store / "base" / "v1"
        torn.mkdir(parents=True)
        (torn / "part-00000.parquet").write_bytes(b"torn")
        after = sorted(
            map(tuple, ss.load_streaming_hll(spark, str(store)).collect())
        )
        assert after == before
        # and the NEXT compaction publishes past the torn version
        b2 = [(i, "a.com") for i in range(250, 500)]
        _write_jsonl(src / "b2.jsonl", b2)
        _run(spark, src, store, ckpt)
        ss.compact_hll_store(spark, str(store))
        merged = sorted(
            map(tuple, ss.load_streaming_hll(spark, str(store)).collect())
        )
        want = sorted(map(tuple, _batch_regs(spark, b1 + b2).collect()))
        assert merged == want

    def test_empty_store_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError, match="HLL store"):
            ss.load_streaming_hll(spark, str(tmp_path / "nope"))

    def test_per_batch_delta_is_bounded(self, spark, tmp_path):
        """The store grows by at most 2^p rows per group per epoch —
        the bounded-state contract that makes this a 100 TB operator."""
        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        _write_jsonl(
            src / "b1.jsonl", [(i, "a.com") for i in range(5000)]
        )
        _run(spark, src, store, ckpt)
        epochs = spark.read.parquet(str(store / "epochs"))
        per = epochs.groupBy("ingest_batch", "domain").count().collect()
        assert all(r["count"] <= 512 for r in per)


def _run_cms(spark, src, store, ckpt, **kw):
    q = ss.run_cms_ingest(
        spark, str(src), str(store), str(ckpt), "domain",
        schema=_schema(), width=256, depth=3, **kw
    )
    q.awaitTermination(120)


def _batch_cells(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return sk.count_min_sketch(df, "domain", width=256, depth=3)


class TestCmsIngest:
    def test_store_sums_to_batch_sketch_of_everything(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        b1 = [(i, "a.com") for i in range(100)] + [(i, "b.com") for i in range(30)]
        _write_jsonl(src / "b1.jsonl", b1)
        _run_cms(spark, src, store, ckpt)
        b2 = [(i, "a.com") for i in range(50)]
        _write_jsonl(src / "b2.jsonl", b2)
        _run_cms(spark, src, store, ckpt)  # restart, same checkpoint
        got = sorted(map(tuple, ss.load_streaming_cms(spark, str(store)).collect()))
        want = sorted(map(tuple, _batch_cells(spark, b1 + b2).collect()))
        assert got == want

    def test_estimate_counts_full_history(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        _write_jsonl(src / "b1.jsonl", [(i, "a.com") for i in range(100)])
        _run_cms(spark, src, store, ckpt)
        _write_jsonl(src / "b2.jsonl", [(i, "a.com") for i in range(50)])
        _run_cms(spark, src, store, ckpt)
        q = spark.createDataFrame([("a.com",)], "domain string")
        got = ss.streaming_cms_estimate(spark, str(store), q, "domain").collect()
        assert got[0].est >= 150  # overestimate-only, across both epochs

    def test_compaction_fencepost_never_double_counts(self, spark, tmp_path):
        """The load-bearing contrast with the HLL store: fold epochs
        into a versioned base, then leave the folded epoch partitions
        ON DISK (the interrupted-delete crash) — the fencepost filter
        must ignore them, keeping every count exact."""
        import shutil

        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        b1 = [(i, "a.com") for i in range(100)]
        _write_jsonl(src / "b1.jsonl", b1)
        _run_cms(spark, src, store, ckpt)
        b2 = [(i, "b.com") for i in range(40)]
        _write_jsonl(src / "b2.jsonl", b2)
        _run_cms(spark, src, store, ckpt)
        before = sorted(map(tuple, ss.load_streaming_cms(spark, str(store)).collect()))

        # snapshot epoch 0, fold it, then RESTORE it = interrupted delete
        ep0 = store / "epochs" / "ingest_batch=0"
        saved = tmp_path / "ep0_copy"
        shutil.copytree(str(ep0), str(saved))
        f = ss.compact_cms_store(spark, str(store))
        assert f == 0
        shutil.copytree(str(saved), str(ep0))
        after = sorted(map(tuple, ss.load_streaming_cms(spark, str(store)).collect()))
        assert after == before  # epoch 0 on disk AND in base -> counted once

    def test_ingest_after_compaction_keeps_accumulating(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        b1 = [(i, "a.com") for i in range(100)]
        b2 = [(i, "b.com") for i in range(40)]
        _write_jsonl(src / "b1.jsonl", b1)
        _run_cms(spark, src, store, ckpt)
        _write_jsonl(src / "b2.jsonl", b2)
        _run_cms(spark, src, store, ckpt)
        ss.compact_cms_store(spark, str(store))  # folds epoch 0 only
        b3 = [(i, "a.com") for i in range(25)]
        _write_jsonl(src / "b3.jsonl", b3)
        _run_cms(spark, src, store, ckpt)
        got = sorted(map(tuple, ss.load_streaming_cms(spark, str(store)).collect()))
        want = sorted(map(tuple, _batch_cells(spark, b1 + b2 + b3).collect()))
        assert got == want

    def test_repeated_compaction_versions_advance(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        store, ckpt = tmp_path / "store", tmp_path / "ckpt"
        for n, batch in enumerate(
            ([(i, "a.com") for i in range(60)],
             [(i, "b.com") for i in range(30)],
             [(i, "c.com") for i in range(10)])
        ):
            _write_jsonl(src / f"b{n}.jsonl", batch)
            _run_cms(spark, src, store, ckpt)
        f1 = ss.compact_cms_store(spark, str(store))  # folds 0..1
        assert f1 == 1
        f2 = ss.compact_cms_store(spark, str(store))  # nothing new below newest
        assert f2 == -1
        got = sorted(map(tuple, ss.load_streaming_cms(spark, str(store)).collect()))
        want = sorted(map(tuple, _batch_cells(
            spark,
            [(i, "a.com") for i in range(60)]
            + [(i, "b.com") for i in range(30)]
            + [(i, "c.com") for i in range(10)],
        ).collect()))
        assert got == want

    def test_empty_store_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError, match="CMS store"):
            ss.load_streaming_cms(spark, str(tmp_path / "nope"))
