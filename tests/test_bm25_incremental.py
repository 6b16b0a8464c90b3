"""Incremental BM25 index maintenance (round 7): epoch-append postings
+ stats partials, serve the union, compact back to one tier with
fold-fencepost double-count protection — the lexical twin of the IVF
epoch tier.
"""

from __future__ import annotations

import json
import os

from real_estate_bigdata_spark.operators import text_analysis as ta
from real_estate_bigdata_spark.streaming import ingest

DOCS_A = [
    (1, "spark joins the window over the big table"),
    (2, "duckdb is an embedded analytical database engine"),
    (3, "the window function family includes rank and lag"),
]
DOCS_B = [
    (10, "spark window aggregation with watermarks and joins"),
    (11, "a totally unrelated cooking recipe with onions"),
    (12, ""),  # blank doc: counts toward n, adds no postings
]
QUERIES = ("spark window", "the", "rank joins")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _results(spark, path, q):
    return [
        (r.doc_id, r.score)
        for r in ta.bm25_search(spark, path, q, k=10).collect()
    ]


class TestBm25EpochAppend:
    def test_append_equals_full_rebuild(self, spark, tmp_path):
        """Build on A + append B must score IDENTICALLY to a fresh
        build on A+B, for every query — the parity that proves stats,
        df, and postings combine exactly across tiers."""
        inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
        ta.build_bm25_index(_df(spark, DOCS_A), inc)
        ta.append_bm25_epoch(spark, inc, _df(spark, DOCS_B), epoch=0)
        ta.build_bm25_index(_df(spark, DOCS_A + DOCS_B), full)
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, full, q), q

    def test_replayed_epoch_is_idempotent(self, spark, tmp_path):
        inc = str(tmp_path / "inc")
        ta.build_bm25_index(_df(spark, DOCS_A), inc)
        ta.append_bm25_epoch(spark, inc, _df(spark, DOCS_B), epoch=0)
        before = {q: _results(spark, inc, q) for q in QUERIES}
        ta.append_bm25_epoch(spark, inc, _df(spark, DOCS_B), epoch=0)
        for q in QUERIES:
            assert _results(spark, inc, q) == before[q], q

    def test_compact_folds_and_fencepost_blocks_double_count(
        self, spark, tmp_path
    ):
        inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
        ta.build_bm25_index(_df(spark, DOCS_A), inc)
        ta.append_bm25_epoch(spark, inc, _df(spark, DOCS_B), epoch=0)
        ta.build_bm25_index(_df(spark, DOCS_A + DOCS_B), full)

        assert ta.compact_bm25_index(spark, inc) == 1
        for sub in ("stats", "postings", "term_stats"):
            assert not os.path.exists(f"{inc}/{sub}_epochs"), sub
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, full, q), q
        assert ta.compact_bm25_index(spark, inc) == 0  # consumed

        # crash-window simulation: base already folded (fencepost set),
        # but the epoch partitions resurface on disk — search AND a
        # compaction re-run must skip them
        ta.append_bm25_epoch(spark, inc, _df(spark, DOCS_B), epoch=0)
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, full, q), q
        assert ta.compact_bm25_index(spark, inc) == 0
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, full, q), q

        # a genuinely NEW epoch above the fencepost still counts
        new_docs = [(20, "spark window spark window")]
        ta.append_bm25_epoch(spark, inc, _df(spark, new_docs), epoch=1)
        full2 = str(tmp_path / "full2")
        ta.build_bm25_index(_df(spark, DOCS_A + DOCS_B + new_docs), full2)
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, full2, q), q

    def test_append_requires_existing_index(self, spark, tmp_path):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="build_bm25_index first"):
            ta.append_bm25_epoch(
                spark, str(tmp_path / "nope"), _df(spark, DOCS_A), epoch=0
            )


class TestBm25IndexIngestStream:
    def _write_jsonl(self, path, rows):
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

    def test_streamed_appends_serve_and_replay_idempotent(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "idx")
        ta.build_bm25_index(_df(spark, DOCS_A), path)
        src = tmp_path / "drop"
        src.mkdir()
        self._write_jsonl(src / "b1.jsonl", DOCS_B[:2])
        q = ingest.run_bm25_index_ingest(
            spark, str(src), path, str(tmp_path / "ck"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        full = str(tmp_path / "full")
        ta.build_bm25_index(_df(spark, DOCS_A + DOCS_B[:2]), full)
        for query in QUERIES:
            assert _results(spark, path, query) == _results(
                spark, full, query
            ), query
        # drained re-run (same checkpoint): nothing changes
        q = ingest.run_bm25_index_ingest(
            spark, str(src), path, str(tmp_path / "ck"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        for query in QUERIES:
            assert _results(spark, path, query) == _results(
                spark, full, query
            ), query


class TestBm25Retraction:
    """Value-aware takedown path (round 8): retract_from_bm25_index
    must leave surviving scores bit-equal to a fresh build WITHOUT the
    retracted doc — a key-only mask is insufficient for BM25 because
    the doc's (1, dl) stats share and +1-per-term df shares shift every
    surviving score."""

    def test_retract_matches_fresh_build_without_doc(self, spark, tmp_path):
        inc, fresh = str(tmp_path / "inc"), str(tmp_path / "fresh")
        ta.build_bm25_index(_df(spark, DOCS_A + DOCS_B), inc)
        n = ta.retract_from_bm25_index(
            spark, inc, spark.createDataFrame([(1,)], "doc_id long")
        )
        assert n == 1
        ta.build_bm25_index(
            _df(spark, [d for d in DOCS_A + DOCS_B if d[0] != 1]), fresh
        )
        for q in QUERIES:
            got = _results(spark, inc, q)
            assert all(doc != 1 for doc, _ in got), q
            assert got == _results(spark, fresh, q), q

    def test_retract_is_idempotent_and_unknown_id_noop(self, spark, tmp_path):
        inc = str(tmp_path / "inc")
        ta.build_bm25_index(_df(spark, DOCS_A + DOCS_B), inc)
        assert ta.retract_from_bm25_index(
            spark, inc, spark.createDataFrame([(1,)], "doc_id long")
        ) == 1
        before = {q: _results(spark, inc, q) for q in QUERIES}
        # again, plus an id the index never held
        assert ta.retract_from_bm25_index(
            spark, inc, spark.createDataFrame([(1,), (999,)], "doc_id long")
        ) == 0
        for q in QUERIES:
            assert _results(spark, inc, q) == before[q], q

    def test_compact_applies_ledger_and_reappend_searchable(
        self, spark, tmp_path
    ):
        inc, fresh = str(tmp_path / "inc"), str(tmp_path / "fresh")
        ta.build_bm25_index(_df(spark, DOCS_A + DOCS_B), inc)
        ta.retract_from_bm25_index(
            spark, inc, spark.createDataFrame([(10,)], "doc_id long")
        )
        assert ta.compact_bm25_index(spark, inc) == 0  # retraction-only
        import os

        assert not os.path.exists(f"{inc}/_tombstones")
        ta.build_bm25_index(
            _df(spark, [d for d in DOCS_A + DOCS_B if d[0] != 10]), fresh
        )
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, fresh, q), q
        # re-add the retracted id AFTER compaction: searchable again
        ta.append_bm25_epoch(spark, inc, _df(spark, [DOCS_B[0]]), epoch=5)
        full = str(tmp_path / "full")
        ta.build_bm25_index(_df(spark, DOCS_A + DOCS_B), full)
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, full, q), q

    def test_retraction_between_epochs_fencepost(self, spark, tmp_path):
        """Append epoch 0, retract a base doc AND an epoch doc, compact,
        append epoch 1, retract again — every intermediate state scores
        bit-equal to a fresh build on the surviving docs."""
        inc = str(tmp_path / "inc")
        ta.build_bm25_index(_df(spark, DOCS_A), inc)
        ta.append_bm25_epoch(spark, inc, _df(spark, DOCS_B), epoch=0)
        ta.retract_from_bm25_index(
            spark, inc, spark.createDataFrame([(2,), (10,)], "doc_id long")
        )
        alive = [d for d in DOCS_A + DOCS_B if d[0] not in (2, 10)]
        f1 = str(tmp_path / "f1")
        ta.build_bm25_index(_df(spark, alive), f1)
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, f1, q), q
        ta.compact_bm25_index(spark, inc)
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, f1, q), q
        new_docs = [(20, "spark window rank over joins")]
        ta.append_bm25_epoch(spark, inc, _df(spark, new_docs), epoch=1)
        ta.retract_from_bm25_index(
            spark, inc, spark.createDataFrame([(3,)], "doc_id long")
        )
        alive2 = [d for d in alive + new_docs if d[0] != 3]
        f2 = str(tmp_path / "f2")
        ta.build_bm25_index(_df(spark, alive2), f2)
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, f2, q), q

    def test_resurfaced_ledger_after_compaction_is_inert(
        self, spark, tmp_path
    ):
        """Crash-window simulation: all three tables swapped (fenceposts
        carry the ledger's max __rseq) but the process died before the
        tombstones delete — search must not double-subtract and a
        compaction re-run must converge."""
        import shutil

        inc = str(tmp_path / "inc")
        ta.build_bm25_index(_df(spark, DOCS_A + DOCS_B), inc)
        ta.retract_from_bm25_index(
            spark, inc, spark.createDataFrame([(1,)], "doc_id long")
        )
        saved = str(tmp_path / "saved_ledger")
        shutil.copytree(f"{inc}/_tombstones", saved)
        before = {q: _results(spark, inc, q) for q in QUERIES}
        ta.compact_bm25_index(spark, inc)
        shutil.copytree(saved, f"{inc}/_tombstones")  # resurface
        for q in QUERIES:
            assert _results(spark, inc, q) == before[q], q
        assert ta.compact_bm25_index(spark, inc) == 0
        import os

        assert not os.path.exists(f"{inc}/_tombstones")
        for q in QUERIES:
            assert _results(spark, inc, q) == before[q], q

    def test_lossless_cast_guard(self, spark, tmp_path):
        import pytest as _pytest

        inc = str(tmp_path / "inc")
        ta.build_bm25_index(_df(spark, DOCS_A), inc)
        with _pytest.raises(ValueError, match="losslessly"):
            ta.retract_from_bm25_index(
                spark,
                inc,
                spark.createDataFrame([(1.5,)], "doc_id double"),
            )
        # exact-integer-valued double still retracts
        assert ta.retract_from_bm25_index(
            spark, inc, spark.createDataFrame([(2.0,)], "doc_id double")
        ) == 1
        f = str(tmp_path / "f")
        ta.build_bm25_index(
            _df(spark, [d for d in DOCS_A if d[0] != 2]), f
        )
        for q in QUERIES:
            assert _results(spark, inc, q) == _results(spark, f, q), q

    def test_legacy_artifact_rejected(self, spark, tmp_path):
        """Pre-__sum_dl artifacts cannot adjust stats: retract must
        refuse rather than corrupt."""
        import pytest as _pytest

        inc = str(tmp_path / "inc")
        ta.build_bm25_index(_df(spark, DOCS_A), inc)
        # strip __sum_dl to forge a round-6 artifact
        legacy = (
            spark.read.parquet(f"{inc}/stats").select("__n", "__avgdl")
        )
        legacy.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "legacy_stats")
        )
        import shutil

        shutil.rmtree(f"{inc}/stats")
        shutil.copytree(str(tmp_path / "legacy_stats"), f"{inc}/stats")
        with _pytest.raises(ValueError, match="rebuild it"):
            ta.retract_from_bm25_index(
                spark, inc, spark.createDataFrame([(1,)], "doc_id long")
            )
