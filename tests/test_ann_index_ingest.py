"""Continuous IVF-index maintenance (round 7): the epoch-append tier
that makes a persisted ANN index maintainable at scale — append without
rewriting the base, serve the union, retract, compact back to one tier.
The search-state twin of the dedup-store ingest lifecycle.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import similarity as sim
from real_estate_bigdata_spark.streaming import ingest

DIM = 8


def _vecs(start, n, seed):
    rng = np.random.default_rng(seed)
    return [
        (start + i, [float(x) for x in rng.standard_normal(DIM)], 0)
        for i in range(n)
    ]


def _write_jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        for vec_id, emb, label in rows:
            f.write(
                json.dumps({"vec_id": vec_id, "embedding": emb, "label": label})
                + "\n"
            )


def _build_base(spark, path, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sim.save_ivf_index(sim.build_ivf_index(df, n_lists=4), path)
    return df


def _run(spark, src, path, ckpt):
    q = ingest.run_embedding_index_ingest(
        spark, str(src), path, str(ckpt), max_files_per_trigger=1
    )
    q.awaitTermination(120)


def _loaded_ids(spark, path):
    return sorted(
        r.neighbor_id
        for r in sim.load_ivf_index(spark, path).lists.collect()
    )


class TestEmbeddingIndexIngest:
    def test_appended_vectors_searchable_and_replay_idempotent(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "idx")
        base_rows = _vecs(0, 30, seed=1)
        _build_base(spark, path, base_rows)

        src = tmp_path / "drop"
        src.mkdir()
        b1, b2 = _vecs(100, 10, seed=2), _vecs(200, 10, seed=3)
        # plant a twin: 205 is (nearly) vector 0's direction
        twin = [float(x) + 0.001 for x in base_rows[0][1]]
        b2[5] = (205, twin, 0)
        _write_jsonl(src / "b1.jsonl", b1)
        _write_jsonl(src / "b2.jsonl", b2)
        _run(spark, src, path, tmp_path / "ck1")

        want = sorted([r[0] for r in base_rows + b1 + b2])
        assert _loaded_ids(spark, path) == want

        # the appended twin is retrievable: query with vector 0
        q = spark.createDataFrame(
            [base_rows[0]], "vec_id long, embedding array<float>, label int"
        )
        idx = sim.load_ivf_index(spark, path)
        top = sim.ivf_search(idx, q, k=3, n_probe=4).collect()
        assert top[0].neighbor_id == 205

        # fresh-checkpoint replay: same epochs rewritten, no dup rows
        _run(spark, src, path, tmp_path / "ck2")
        assert _loaded_ids(spark, path) == want

    def test_retract_appended_then_compact_folds_epochs(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "idx")
        base_rows = _vecs(0, 20, seed=4)
        _build_base(spark, path, base_rows)
        src = tmp_path / "drop"
        src.mkdir()
        b1 = _vecs(100, 10, seed=5)
        _write_jsonl(src / "b1.jsonl", b1)
        _run(spark, src, path, tmp_path / "ck")

        # retract one appended id: masked out of the loaded union
        n = sim.retract_from_ann_index(
            spark, path, spark.createDataFrame([(103,)], "vec_id long")
        )
        assert n == 1
        assert 103 not in _loaded_ids(spark, path)

        # compact: epoch tier folds into base, tombstone applied+consumed
        assert sim.compact_ann_index(spark, path) == 1
        import os

        assert not os.path.exists(f"{path}/lists_epochs")
        assert not os.path.exists(f"{path}/_tombstones")
        want = sorted(r[0] for r in base_rows + b1 if r[0] != 103)
        base = spark.read.parquet(f"{path}/lists")  # raw base, no mask
        assert sorted(r.neighbor_id for r in base.collect()) == want

        # the partition-pruned layout survives the fold
        pruned = {
            r.f
            for r in base.filter(F.col("__list") == 0)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        allf = {
            r.f
            for r in base.select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        assert pruned and pruned < allf

        # fold-only compaction after more appends, no tombstones
        _write_jsonl(src / "b2.jsonl", _vecs(300, 5, seed=6))
        _run(spark, src, path, tmp_path / "ck")
        assert sim.compact_ann_index(spark, path) == 0  # ids applied: none
        assert not os.path.exists(f"{path}/lists_epochs")
        assert len(_loaded_ids(spark, path)) == len(want) + 5

    def test_fold_crash_window_cannot_serve_duplicates(self, spark, tmp_path):
        """ADVICE r7: crash between the lists swap and the epoch-dir
        delete — the swapped base already holds the folded rows, and the
        still-on-disk epoch tier must NOT union back in (a duplicated
        row would occupy two top-k slots). The fold fencepost written
        into the swapped base filters the resurfaced tier, mirroring
        _bm25_live_epochs; a compaction re-run converges without
        re-adding the folded rows."""
        import shutil

        path = str(tmp_path / "idx")
        base_rows = _vecs(0, 30, seed=7)
        df = _build_base(spark, path, base_rows)
        new = spark.createDataFrame(
            _vecs(100, 10, seed=8), "vec_id long, embedding array<float>, label int"
        )
        sim.append_ivf_epoch(spark, path, new, epoch=0)
        assert len(_loaded_ids(spark, path)) == 40

        # compact, then resurrect the epoch tier = the crash window
        saved = str(tmp_path / "saved_epochs")
        shutil.copytree(f"{path}/lists_epochs", saved)
        assert sim.compact_ann_index(spark, path) == 0
        shutil.copytree(saved, f"{path}/lists_epochs")

        ids = [
            r.neighbor_id
            for r in sim.load_ivf_index(spark, path).lists.collect()
        ]
        assert sorted(ids) == sorted(set(ids))  # no id served twice
        assert len(ids) == 40

        # a search in the window returns distinct neighbors
        q = spark.createDataFrame(
            [new.collect()[0]], "vec_id long, embedding array<double>, label int"
        )
        top = sim.ivf_search(
            sim.load_ivf_index(spark, path), q, k=5, n_probe=4
        ).collect()
        assert len({r.neighbor_id for r in top}) == len(top)

        # re-run converges: base still 40 rows, tier dropped for good
        assert sim.compact_ann_index(spark, path) == 0
        import os

        assert not os.path.exists(f"{path}/lists_epochs")
        assert spark.read.parquet(f"{path}/lists").count() == 40

        # a genuinely NEW epoch above the fencepost still appends
        newer = spark.createDataFrame(
            _vecs(200, 5, seed=9), "vec_id long, embedding array<float>, label int"
        )
        sim.append_ivf_epoch(spark, path, newer, epoch=1)
        assert len(_loaded_ids(spark, path)) == 45

    def test_legacy_crash_state_without_marker_compacts_clean(
        self, spark, tmp_path
    ):
        """r8 review finding: a PRE-fencepost artifact whose compaction
        crashed between the lists swap and the epoch-dir delete has the
        folded rows BOTH in the base and on disk as epochs, with no
        ``_folded_through`` marker — the old code's ``.distinct()``
        covered that window, so the new fencepost path must fall back to
        distinct when an epoch tier exists but the base has no marker,
        or the re-run bakes permanent duplicates into the base."""
        import os
        import shutil

        path = str(tmp_path / "idx")
        _build_base(spark, path, _vecs(0, 30, seed=10))
        new = spark.createDataFrame(
            _vecs(100, 10, seed=11),
            "vec_id long, embedding array<float>, label int",
        )
        sim.append_ivf_epoch(spark, path, new, epoch=0)

        # reproduce the legacy crash state: fold (which writes the r8
        # marker), resurrect the epoch tier, then strip the marker —
        # base holds the folded rows, epochs on disk, no fencepost
        saved = str(tmp_path / "saved_epochs")
        shutil.copytree(f"{path}/lists_epochs", saved)
        assert sim.compact_ann_index(spark, path) == 0
        shutil.copytree(saved, f"{path}/lists_epochs")
        os.remove(f"{path}/lists/_folded_through")

        # the re-run must converge to 40 DISTINCT rows, not 50
        assert sim.compact_ann_index(spark, path) == 0
        base = [
            r.neighbor_id
            for r in spark.read.parquet(f"{path}/lists").collect()
        ]
        assert sorted(base) == sorted(set(base))
        assert len(base) == 40
        assert not os.path.exists(f"{path}/lists_epochs")
        # and the artifact is now marker-bearing: the distinct fallback
        # was a one-time migration cost
        from real_estate_bigdata_spark.util import read_fold_marker

        assert read_fold_marker(spark, f"{path}/lists") >= 0


class TestPqEpochAppend:
    """append_pq_epoch (round 8): the codes twin of the IVF epoch tier
    — encode new vectors against the FROZEN persisted codebook, serve
    base + epochs through load_pq, retract across tiers, compact folds
    both artifact families behind their own fenceposts."""

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def _build(self, spark, path, rows):
        df = self._df(spark, rows)
        cb = sim.train_pq(df, m=4, ksub=8)
        sim.save_pq(cb, sim.pq_encode(df, cb), path)
        return df, cb

    def _search_ids(self, spark, path, queries):
        cb, codes = sim.load_pq(spark, path)
        return [
            (r.query_id, r.neighbor_id, r.rn)
            for r in sim.pq_topk(codes, cb, queries, k=5)
            .orderBy("query_id", "rn")
            .collect()
        ]

    def test_append_equals_full_reencode(self, spark, tmp_path):
        path = str(tmp_path / "pq")
        base_rows = _vecs(0, 40, seed=10)
        df, cb = self._build(spark, path, base_rows)
        new_rows = _vecs(100, 15, seed=11)
        sim.append_pq_epoch(spark, path, self._df(spark, new_rows), epoch=0)

        q = self._df(spark, base_rows[:3])
        got = self._search_ids(spark, path, q)
        # full re-encode of the union with the SAME codebook
        full = str(tmp_path / "pq_full")
        union = self._df(spark, base_rows + new_rows)
        sim.save_pq(cb, sim.pq_encode(union, cb), full)
        assert got == self._search_ids(spark, full, q)
        _, codes = sim.load_pq(spark, path)
        assert sorted(r.vec_id for r in codes.select("vec_id").collect()) \
            == sorted(r[0] for r in base_rows + new_rows)

    def test_replayed_epoch_idempotent_and_retract_across_tiers(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "pq")
        base_rows = _vecs(0, 30, seed=12)
        self._build(spark, path, base_rows)
        new_rows = _vecs(100, 10, seed=13)
        newdf = self._df(spark, new_rows)
        sim.append_pq_epoch(spark, path, newdf, epoch=3)
        before = sorted(
            r.vec_id for r in sim.load_pq(spark, path)[1].collect()
        )
        sim.append_pq_epoch(spark, path, newdf, epoch=3)  # replay
        assert sorted(
            r.vec_id for r in sim.load_pq(spark, path)[1].collect()
        ) == before

        # retract one base id and one appended id: masked in BOTH tiers
        sim.retract_from_ann_index(
            spark, path, spark.createDataFrame([(0,), (105,)], "vec_id long")
        )
        ids = {r.vec_id for r in sim.load_pq(spark, path)[1].collect()}
        assert 0 not in ids and 105 not in ids

        # compact: folds the tier, applies the ledger, consumes both
        assert sim.compact_ann_index(spark, path) == 2
        import os

        assert not os.path.exists(f"{path}/codes_epochs")
        assert not os.path.exists(f"{path}/_tombstones")
        ids2 = sorted(
            r.vec_id for r in sim.load_pq(spark, path)[1].collect()
        )
        assert ids2 == sorted(i for i in before if i not in (0, 105))
        # re-added after compaction: searchable again
        sim.append_pq_epoch(
            spark, path, self._df(spark, [new_rows[5]]), epoch=4
        )
        assert 105 in {
            r.vec_id for r in sim.load_pq(spark, path)[1].collect()
        }

    def test_fold_crash_window_cannot_serve_duplicate_codes(
        self, spark, tmp_path
    ):
        """Resurfaced codes_epochs after the codes swap (fencepost set):
        load_pq must not union the folded partitions back in."""
        import shutil

        path = str(tmp_path / "pq")
        base_rows = _vecs(0, 20, seed=14)
        self._build(spark, path, base_rows)
        new_rows = _vecs(100, 8, seed=15)
        sim.append_pq_epoch(spark, path, self._df(spark, new_rows), epoch=0)
        saved = str(tmp_path / "saved_epochs")
        shutil.copytree(f"{path}/codes_epochs", saved)
        assert sim.compact_ann_index(spark, path) == 0  # fold-only
        shutil.copytree(saved, f"{path}/codes_epochs")  # crash window
        ids = [r.vec_id for r in sim.load_pq(spark, path)[1].collect()]
        assert len(ids) == len(set(ids)), "duplicate codes served"
        assert sorted(ids) == sorted(r[0] for r in base_rows + new_rows)
        # compaction re-run converges (epoch at/below fencepost skipped)
        assert sim.compact_ann_index(spark, path) == 0
        ids2 = [r.vec_id for r in sim.load_pq(spark, path)[1].collect()]
        assert sorted(ids2) == sorted(ids)

    def test_append_requires_artifact(self, spark, tmp_path):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="save_pq first"):
            sim.append_pq_epoch(
                spark,
                str(tmp_path / "nope"),
                self._df(spark, _vecs(0, 3, seed=1)),
                epoch=0,
            )

    def test_epoch_id_column_comes_from_artifact_not_caller(
        self, spark, tmp_path
    ):
        """r8 review: the artifact was saved with id column 'emb_id';
        an append whose input frame names its id 'vec_id' (the default)
        must still land the epoch tier under the ARTIFACT's id column —
        the caller's id_col names the input column only. Before the
        fix the tier was durably written with the caller's name and
        every later load_pq failed at serve time."""
        path = str(tmp_path / "pq")
        rows = _vecs(0, 30, seed=16)
        df = spark.createDataFrame(
            [(i, v) for i, v, _ in rows],
            "emb_id long, embedding array<float>",
        )
        cb = sim.train_pq(df, m=4, ksub=8, id_col="emb_id")
        sim.save_pq(
            cb, sim.pq_encode(df, cb, id_col="emb_id"), path, id_col="emb_id"
        )

        new_rows = _vecs(100, 8, seed=17)
        sim.append_pq_epoch(
            spark, path, self._df(spark, new_rows), epoch=0
        )  # default id_col='vec_id' — input column name, nothing more
        _, codes = sim.load_pq(spark, path)
        assert codes.columns[0] == "emb_id"
        assert sorted(r.emb_id for r in codes.collect()) == sorted(
            r[0] for r in rows + new_rows
        )
        # and the fold keeps the artifact's id column
        assert sim.compact_ann_index(spark, path) == 0
        base = spark.read.parquet(f"{path}/codes")
        assert "emb_id" in base.columns and "vec_id" not in base.columns


class TestIvfPqCombinedIngest:
    def test_one_stream_maintains_both_tiers(self, spark, tmp_path):
        """append_codes=True: one stream appends lists AND codes epochs;
        both serve; fresh-checkpoint replay adds nothing."""
        path = str(tmp_path / "idx")
        base_rows = _vecs(0, 30, seed=20)
        df = _build_base(spark, path, base_rows)
        cb = sim.train_pq(df, m=4, ksub=8)
        sim.save_pq(cb, sim.pq_encode(df, cb), path)

        src = tmp_path / "drop"
        src.mkdir()
        b1 = _vecs(100, 10, seed=21)
        _write_jsonl(src / "b1.jsonl", b1)
        q = ingest.run_embedding_index_ingest(
            spark, str(src), path, str(tmp_path / "ck1"),
            max_files_per_trigger=1, append_codes=True,
        )
        q.awaitTermination(120)

        want = sorted(r[0] for r in base_rows + b1)
        assert _loaded_ids(spark, path) == want
        _, codes = sim.load_pq(spark, path)
        assert sorted(r.vec_id for r in codes.collect()) == want

        # replay under a fresh checkpoint: both tiers unchanged
        q = ingest.run_embedding_index_ingest(
            spark, str(src), path, str(tmp_path / "ck2"),
            max_files_per_trigger=1, append_codes=True,
        )
        q.awaitTermination(120)
        assert _loaded_ids(spark, path) == want
        _, codes = sim.load_pq(spark, path)
        assert sorted(r.vec_id for r in codes.collect()) == want

        # the composed IVF-PQ search sees an appended vector: query
        # with an appended id's own direction, expect itself top-1
        # excluded (self-match removed) but its near-twin findable
        index = sim.load_ivf_index(spark, path)
        cb2, codes2 = sim.load_pq(spark, path)
        queries = spark.createDataFrame(
            [b1[0]], "vec_id long, embedding array<float>, label int"
        )
        res = sim.ivfpq_topk(
            index, cb2, codes2, queries, k=3, n_probe=4
        ).collect()
        assert res and all(r.neighbor_id != b1[0][0] for r in res)
