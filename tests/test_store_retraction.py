"""Dedup-store retraction (VERDICT r5 task #6): a takedown / opt-out /
bad-crawl removal must also free the store entry, or re-ingestion of
legitimate content is blocked forever. Deletion-vector style: tombstones
mask every store read immediately; the next compaction applies them
physically and consumes them; a key RE-ADDED after its retraction is
live again and keeps deduplicating its own future duplicates.
"""

from __future__ import annotations

import json

from real_estate_bigdata_spark.streaming import ingest

BASE = (
    "the quick brown fox jumps over the lazy dog near the old river "
    "bank while seven other foxes watch from the tall dry summer grass"
)


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


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run_exact(spark, src, dest, store, ckpt, table=None):
    q = ingest.run_deduped_doc_ingest(
        spark, str(src), str(dest), str(store), str(ckpt),
        compacted_table=table,
    )
    q.awaitTermination(120)


def _lake_ids(spark, dest):
    return sorted(r.doc_id for r in spark.read.parquet(str(dest)).collect())


class TestFingerprintRetraction:
    def test_retract_then_reingest_survives_then_dedups_again(
        self, spark, tmp_path
    ):
        src = tmp_path / "drop"
        src.mkdir()
        dest, store, ckpt = tmp_path / "lake", tmp_path / "store", tmp_path / "ckpt"

        _write_jsonl(src / "b1.jsonl", [(1, BASE)])
        _run_exact(spark, src, dest, store, ckpt)
        # same content, different whitespace (fingerprint-identical):
        # blocked by the store
        _write_jsonl(src / "b2.jsonl", [(9, BASE.replace(" ", "  "))])
        _run_exact(spark, src, dest, store, ckpt)
        assert _lake_ids(spark, dest) == [1]

        # takedown: retract the content, stream stopped
        n = ingest.retract_fingerprints(spark, str(store), _docs(spark, [(1, BASE)]))
        assert n == 1
        # re-ingest of the same content now SURVIVES (the task's gate)
        _write_jsonl(src / "b3.jsonl", [(10, BASE)])
        _run_exact(spark, src, dest, store, ckpt)
        assert _lake_ids(spark, dest) == [1, 10]
        # and the re-added fingerprint dedups ITS future duplicates —
        # the tombstone is epoch-scoped, not a permanent hole
        _write_jsonl(src / "b4.jsonl", [(11, BASE)])
        _run_exact(spark, src, dest, store, ckpt)
        assert _lake_ids(spark, dest) == [1, 10]

    def test_compaction_applies_and_consumes_tombstones(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        dest, store, ckpt = tmp_path / "lake", tmp_path / "store", tmp_path / "ckpt"
        table = "fp_retract_applied"

        _write_jsonl(src / "b1.jsonl", [(1, BASE), (2, "other text entirely")])
        _run_exact(spark, src, dest, store, ckpt)
        _write_jsonl(src / "b2.jsonl", [(3, "third unrelated document")])
        _run_exact(spark, src, dest, store, ckpt)

        assert ingest.retract_fingerprints(
            spark, str(store), _docs(spark, [(1, BASE)])
        ) == 1
        # fold EVERYTHING (both epochs committed — the stream is done)
        folded = ingest.compact_fingerprint_store(
            spark, str(store), table=table, up_to_batch=10**6
        )
        assert folded == 2
        # physically applied: doc 1's fingerprint is gone from the table
        assert spark.table(table).count() == 2
        # consumed: the ledger directory is gone
        import os

        assert not os.path.exists(str(store) + "/_tombstones")
        # and the freed content re-ingests through the compacted tier
        _write_jsonl(src / "b3.jsonl", [(12, BASE)])
        _run_exact(spark, src, dest, store, ckpt, table=table)
        assert 12 in _lake_ids(spark, dest)

    def test_readded_key_survives_the_fold(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        dest, store, ckpt = tmp_path / "lake", tmp_path / "store", tmp_path / "ckpt"
        table = "fp_retract_readded"

        _write_jsonl(src / "b1.jsonl", [(1, BASE)])
        _run_exact(spark, src, dest, store, ckpt)
        ingest.retract_fingerprints(spark, str(store), _docs(spark, [(1, BASE)]))
        # re-ingest after retraction: admitted, fingerprint re-added in
        # a LATER epoch than the tombstone's as_of_batch
        _write_jsonl(src / "b2.jsonl", [(10, BASE)])
        _run_exact(spark, src, dest, store, ckpt)
        assert _lake_ids(spark, dest) == [1, 10]

        # fold both epochs: the tombstone masks epoch 0's row but the
        # epoch-1 re-add SURVIVES into the table; ledger consumed
        folded = ingest.compact_fingerprint_store(
            spark, str(store), table=table, up_to_batch=10**6
        )
        assert folded == 2
        assert spark.table(table).count() == 1
        # the surviving table row keeps deduplicating
        _write_jsonl(src / "b3.jsonl", [(11, BASE)])
        _run_exact(spark, src, dest, store, ckpt, table=table)
        assert _lake_ids(spark, dest) == [1, 10]


class TestSignatureRetraction:
    def _near(self, tail):
        return BASE.replace("summer", tail)

    def test_retract_then_near_reingest_survives(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        dest, store, ckpt = tmp_path / "lake", tmp_path / "store", tmp_path / "ckpt"

        def run():
            q = ingest.run_neardup_doc_ingest(
                spark, str(src), str(dest), str(store), str(ckpt)
            )
            q.awaitTermination(120)

        _write_jsonl(src / "b1.jsonl", [(1, BASE)])
        run()
        # near-dup (one word changed) blocked by the stored signature
        _write_jsonl(src / "b2.jsonl", [(9, self._near("winter"))])
        run()
        assert _lake_ids(spark, dest) == [1]

        # retract doc 1 by id; its near-dup content is admissible again
        assert ingest.retract_signatures(
            spark, str(store), _docs(spark, [(1, "")]).select("doc_id")
        ) == 1
        _write_jsonl(src / "b3.jsonl", [(10, self._near("autumn"))])
        run()
        assert _lake_ids(spark, dest) == [1, 10]
        # and doc 10's stored signature blocks ITS near-dups
        _write_jsonl(src / "b4.jsonl", [(11, self._near("spring"))])
        run()
        assert _lake_ids(spark, dest) == [1, 10]
