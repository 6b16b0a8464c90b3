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


class TestAnnIndexRetraction:
    """ANN-artifact retraction (VERDICT r6 task #3): the search-side
    half of the takedown story. Contract: retract id -> absent from all
    three search paths (ivf_search / pq_topk / ivfpq_topk over loaded
    artifacts) -> compaction removes the rows physically and consumes
    the ledger -> a re-added id is searchable again."""

    def _emb(self, spark, n=60, dim=16, seed=7):
        import numpy as np

        rng = np.random.default_rng(seed)
        rows = [
            (i, [float(x) for x in rng.standard_normal(dim)])
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def _build_artifacts(self, spark, emb, path):
        from real_estate_bigdata_spark.operators import similarity as sim

        idx = sim.build_ivf_index(emb, n_lists=4)
        sim.save_ivf_index(idx, path)
        cb = sim.train_pq(emb, m=4, ksub=8)
        sim.save_pq(cb, sim.pq_encode(emb, cb), path)
        return cb

    def _search_ids(self, spark, path, emb, victim):
        """The union of neighbor ids the three search paths return for
        a few queries (excluding the victim as a query)."""
        from pyspark.sql import functions as F

        from real_estate_bigdata_spark.operators import similarity as sim

        q = emb.filter(F.col("vec_id") != victim).orderBy("vec_id").limit(3)
        index = sim.load_ivf_index(spark, path)
        cb, codes = sim.load_pq(spark, path)
        out = set()
        big_k = 70  # > corpus size: any live id MUST appear
        for df in (
            sim.ivf_search(index, q, k=big_k, n_probe=4),
            sim.pq_topk(codes, cb, q, k=big_k),
            sim.ivfpq_topk(index, cb, codes, q, k=big_k, n_probe=4),
        ):
            out |= {r.neighbor_id for r in df.collect()}
        return out

    def test_retract_compact_readd_lifecycle(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from real_estate_bigdata_spark.operators import similarity as sim

        emb = self._emb(spark)
        path = str(tmp_path / "ann")
        cb = self._build_artifacts(spark, emb, path)
        victim = 17

        assert victim in self._search_ids(spark, path, emb, victim)

        n = sim.retract_from_ann_index(
            spark, path, spark.createDataFrame([(victim,)], "vec_id long")
        )
        assert n == 1
        # masked everywhere, zero rewrite yet
        assert victim not in self._search_ids(spark, path, emb, victim)

        # compaction removes the rows physically and consumes the ledger
        applied = sim.compact_ann_index(spark, path)
        assert applied == 1
        raw_lists = spark.read.parquet(f"{path}/lists")
        raw_codes = spark.read.parquet(f"{path}/codes")
        assert raw_lists.filter(F.col("neighbor_id") == victim).count() == 0
        assert raw_codes.filter(F.col("vec_id") == victim).count() == 0
        assert sim.compact_ann_index(spark, path) == 0  # ledger consumed
        assert victim not in self._search_ids(spark, path, emb, victim)

        # re-add the id: extend the IVF lists, append fresh codes
        readd = emb.filter(F.col("vec_id") == victim)
        index = sim.load_ivf_index(spark, path)
        extended = sim.extend_ivf_index(index, readd)
        # write via checkpoint: save overwrites the dir the lists read
        ext_rows = extended.lists.localCheckpoint(eager=True)
        sim.save_ivf_index(sim.IvfIndex(extended.centroids, ext_rows), path)
        sim.pq_encode(readd, cb).select("vec_id", "code").write.mode(
            "append"
        ).parquet(f"{path}/codes")
        assert victim in self._search_ids(spark, path, emb, victim)

    def test_retraction_survives_partial_swap_crash(self, spark, tmp_path):
        """Crash window: _lists_new written, live table renamed away,
        process died before the rename-in. The next compact call must
        finish the swap before doing anything else."""
        from pyspark.sql import functions as F

        from real_estate_bigdata_spark.operators import similarity as sim

        emb = self._emb(spark, n=30)
        path = str(tmp_path / "ann")
        self._build_artifacts(spark, emb, path)
        sim.retract_from_ann_index(
            spark, path, spark.createDataFrame([(3,)], "vec_id long")
        )
        # simulate the half-done swap for the lists table
        masked = spark.read.parquet(f"{path}/lists").filter(
            F.col("neighbor_id") != 3
        )
        masked.write.mode("overwrite").partitionBy("__list").parquet(
            f"{path}/_lists_new"
        )
        import shutil

        shutil.rmtree(f"{path}/lists")
        assert sim.compact_ann_index(spark, path) == 1
        raw = spark.read.parquet(f"{path}/lists")
        assert raw.filter(F.col("neighbor_id") == 3).count() == 0
        assert raw.count() == 29

    def test_lossy_id_cast_fails_fast(self, spark, tmp_path):
        import pytest as _pytest

        from real_estate_bigdata_spark.operators import similarity as sim

        emb = self._emb(spark, n=10)
        path = str(tmp_path / "ann")
        self._build_artifacts(spark, emb, path)
        strs = spark.createDataFrame([("not-an-id",)], "vec_id string")
        with _pytest.raises(ValueError, match="losslessly"):
            sim.retract_from_ann_index(spark, path, strs)

    def test_missing_artifact_fails_with_clear_error(self, spark, tmp_path):
        import pytest as _pytest

        from real_estate_bigdata_spark.operators import similarity as sim

        with _pytest.raises(ValueError, match="no ANN artifact"):
            sim.retract_from_ann_index(
                spark,
                str(tmp_path / "nope"),
                spark.createDataFrame([(1,)], "vec_id long"),
            )

    def test_fractional_id_truncating_cast_fails_fast(self, spark, tmp_path):
        """VERDICT r7 #5: double 7.5 -> bigint 7 is a NON-null lossy
        cast (non-ANSI truncation) that would tombstone the WRONG key;
        the round-trip guard must catch it. Exact-integer-valued
        doubles still retract."""
        import pytest as _pytest
        from pyspark.sql import functions as F

        from real_estate_bigdata_spark.operators import similarity as sim

        emb = self._emb(spark, n=10)
        path = str(tmp_path / "ann")
        self._build_artifacts(spark, emb, path)
        fractional = spark.createDataFrame([(7.5,)], "vec_id double")
        with _pytest.raises(ValueError, match="losslessly"):
            sim.retract_from_ann_index(spark, path, fractional)
        # no ledger row was written by the failed call
        import os

        assert not os.path.exists(f"{path}/_tombstones")
        exact = spark.createDataFrame([(3.0,)], "vec_id double")
        assert sim.retract_from_ann_index(spark, path, exact) == 1
        idx = sim.load_ivf_index(spark, path)
        assert idx.lists.filter(F.col("neighbor_id") == 3).count() == 0

    def test_fractional_key_fails_fast_on_store_retraction(
        self, spark, tmp_path
    ):
        """Same truncating-cast guard on the dedup-store ledger path
        (_retract_keys)."""
        import pytest as _pytest

        store = tmp_path / "store"
        spark.createDataFrame(
            [(10, [1, 2, 3], 0)],
            "doc_id long, sig array<bigint>, ingest_batch int",
        ).write.partitionBy("ingest_batch").parquet(str(store))
        fractional = spark.createDataFrame([(10.5,)], "doc_id double")
        with _pytest.raises(ValueError, match="losslessly"):
            ingest.retract_signatures(spark, str(store), fractional)
        exact = spark.createDataFrame([(10.0,)], "doc_id double")
        assert ingest.retract_signatures(spark, str(store), exact) == 1


class TestSignatureLedgerKeyType:
    def test_ledger_key_type_derives_from_store_not_caller(
        self, spark, tmp_path
    ):
        """ADVICE r6 #1: int-typed caller ids against a bigint-keyed
        store must produce a bigint ledger (readable by the masks), not
        an int one."""
        from pyspark.sql import functions as F

        store = tmp_path / "store"
        # seed a bigint-keyed signature store epoch directly
        spark.createDataFrame(
            [(10, [1, 2, 3], 0)],
            "doc_id long, sig array<bigint>, ingest_batch int",
        ).write.partitionBy("ingest_batch").parquet(str(store))
        narrow = spark.createDataFrame([(10,)], "doc_id int")
        assert ingest.retract_signatures(spark, str(store), narrow) == 1
        ledger = spark.read.parquet(str(store) + "/_tombstones")
        assert ledger.schema["doc_id"].dataType.simpleString() == "bigint"
        assert [r.doc_id for r in ledger.collect()] == [10]
