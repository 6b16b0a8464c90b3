"""Streaming ingest with persistent-store dedup (SURVEY §1.2's broken
link-key re-crawl intent, end-to-end): every micro-batch drops documents
whose content fingerprint exists in the store built by prior batches,
across restarts; NULL-text docs always pass and never poison the store.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from real_estate_bigdata_spark.streaming import ingest


def _write_jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        for doc_id, text in rows:
            f.write(
                json.dumps(
                    {
                        "doc_id": doc_id,
                        "text": text,
                        "lang": "en",
                        "source": "s1",
                        "n_chars": len(text) if text else 0,
                    }
                )
                + "\n"
            )


def _run(spark, src, dest, store, ckpt):
    q = ingest.run_deduped_doc_ingest(
        spark, str(src), str(dest), str(store), str(ckpt)
    )
    q.awaitTermination(120)


class TestDedupedDocIngest:
    def test_cross_batch_dedup_across_restart(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        dest, store, ckpt = tmp_path / "lake", tmp_path / "store", tmp_path / "ckpt"

        # batch 1: doc 3 is a whitespace-variant duplicate of doc 1
        # (same normalized fingerprint); doc 4 has NULL text.
        _write_jsonl(
            src / "b1.jsonl",
            [(1, "aaa bbb"), (2, "ccc ddd"), (3, "aaa   bbb"), (4, None)],
        )
        _run(spark, src, dest, store, ckpt)
        out1 = spark.read.parquet(str(dest))
        assert sorted(r.doc_id for r in out1.collect()) == [1, 2, 4]

        # restart with new files: doc 5 replays doc 2's content
        # (cross-batch duplicate), 6 is novel, 7 is NULL again — NULL
        # must never dedup against the earlier NULL doc.
        _write_jsonl(
            src / "b2.jsonl", [(5, "ccc  ddd"), (6, "eee fff"), (7, None)]
        )
        _run(spark, src, dest, store, ckpt)
        out2 = spark.read.parquet(str(dest))
        assert sorted(r.doc_id for r in out2.collect()) == [1, 2, 4, 6, 7]

        # store holds exactly the three distinct non-NULL fingerprints,
        # each in the epoch partition that first saw it
        st = spark.read.parquet(str(store))
        assert st.select("fingerprint").distinct().count() == 3
        assert st.count() == 3
        assert st.filter(F.col("fingerprint").isNull()).count() == 0

        # restart with nothing new: a drained re-run must change nothing
        _run(spark, src, dest, store, ckpt)
        assert sorted(
            r.doc_id for r in spark.read.parquet(str(dest)).collect()
        ) == [1, 2, 4, 6, 7]
        assert spark.read.parquet(str(store)).count() == 3

    def test_replayed_epoch_is_idempotent(self, spark, tmp_path):
        """Simulate a crash AFTER the epoch's writes but BEFORE the
        checkpoint commit: wiping the checkpoint forces the same input
        to re-run as a fresh epoch against a store that already holds
        its fingerprints from the first attempt. The epoch-partition
        filter (ingest_batch < current) cannot apply here (the replay
        gets a new epoch id), so this instead pins the OUTER guarantee:
        re-ingesting already-stored content never duplicates the lake.
        """
        src = tmp_path / "drop"
        src.mkdir()
        dest, store = tmp_path / "lake", tmp_path / "store"
        _write_jsonl(src / "b1.jsonl", [(1, "aaa bbb"), (2, "ccc ddd")])
        _run(spark, src, dest, store, tmp_path / "ckpt1")
        # second run, fresh checkpoint: same file re-processed
        _run(spark, src, dest, store, tmp_path / "ckpt2")
        out = spark.read.parquet(str(dest))
        # the replayed epoch re-resolved to the SAME epoch partition and
        # overwrote it in place — no duplicate rows in the lake
        assert out.select("doc_id").distinct().count() == 2
        assert out.count() == 2
        assert spark.read.parquet(str(store)).count() == 2
