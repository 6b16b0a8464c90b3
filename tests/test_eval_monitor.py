"""Streaming evaluation monitor (streaming.eval_monitor): per-micro-
batch confusion + AUC of a scored stream against gold labels. The
operational scenarios: a healthy batch reports a high AUC and no
alert; a regressed batch (labels decorrelated from scores) alerts on
the floor; a single-class batch is UNMEASURABLE and alerts rather than
passing silently; a replayed stream (fresh checkpoint, same files)
overwrites its own report partitions without duplication.
"""

from __future__ import annotations

import json

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from real_estate_bigdata_spark.streaming import eval_monitor as em

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("score", DoubleType()),
        StructField("label", IntegerType()),
    ]
)


def _write_jsonl(path, rows, start_id=0):
    with open(path, "w", encoding="utf-8") as f:
        for i, (s, y) in enumerate(rows):
            f.write(
                json.dumps({"id": start_id + i, "score": s, "label": y})
                + "\n"
            )


def _healthy_rows(n=60):
    # well-separated: positives score high with slight overlap
    return [((i % 10) / 10.0 + (0.45 if i % 2 else 0.0), i % 2) for i in range(n)]


def _regressed_rows(n=60):
    # labels decorrelated from scores: AUC ~ 0.5, accuracy ~ 0.5
    return [((i % 10) / 10.0, (i // 3) % 2) for i in range(n)]


def _run(spark, src, reports, ckpt, threshold=0.5, mfpt=1):
    q = em.run_eval_monitor(
        spark,
        str(src),
        str(reports),
        str(ckpt),
        "score",
        "label",
        SCHEMA,
        threshold=threshold,
        max_files_per_trigger=mfpt,
    )
    q.awaitTermination(120)


class TestEvalMonitor:
    def test_healthy_vs_regressed_batches(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        reports, ckpt = tmp_path / "reports", tmp_path / "ckpt"
        _write_jsonl(src / "b1.jsonl", _healthy_rows())
        _write_jsonl(src / "b2.jsonl", _regressed_rows(), start_id=1000)
        _run(spark, src, reports, ckpt)

        rep = em.read_eval_reports(spark, str(reports))
        rows = {r["ingest_batch"]: r for r in rep.collect()}
        assert len(rows) == 2
        aucs = sorted(r["auc"] for r in rows.values())
        assert aucs[0] < 0.65 < 0.85 < aucs[1]
        for r in rows.values():
            assert r["n"] == 60 == r["tp"] + r["fp"] + r["tn"] + r["fn"]

        alerts = em.eval_alerts(rep, min_auc=0.8).collect()
        assert len(alerts) == 1
        assert alerts[0]["reason"] == "auc_below_floor"
        assert rows[alerts[0]["ingest_batch"]]["auc"] == alerts[0]["auc"]

    def test_single_class_batch_is_unmeasurable_alert(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        reports, ckpt = tmp_path / "reports", tmp_path / "ckpt"
        _write_jsonl(src / "b1.jsonl", [(0.9, 1), (0.8, 1), (0.1, 1)])
        _run(spark, src, reports, ckpt)

        rep = em.read_eval_reports(spark, str(reports))
        row = rep.collect()[0]
        assert row["auc"] is None and row["n"] == 3
        alerts = em.eval_alerts(rep, min_auc=0.6).collect()
        assert len(alerts) == 1
        assert alerts[0]["reason"] == "auc_unmeasurable_single_class"
        # with no AUC floor requested, an unmeasurable AUC is not an alert
        assert em.eval_alerts(rep, min_auc=None).count() == 0

    def test_unlabeled_batch_reports_zero_and_alerts(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        reports, ckpt = tmp_path / "reports", tmp_path / "ckpt"
        with open(src / "b1.jsonl", "w", encoding="utf-8") as f:
            f.write(json.dumps({"id": 1, "score": 0.5, "label": None}) + "\n")
        _run(spark, src, reports, ckpt)

        rep = em.read_eval_reports(spark, str(reports))
        row = rep.collect()[0]
        assert row["n"] == 0 and row["auc"] is None
        alerts = em.eval_alerts(rep, min_auc=None).collect()
        assert len(alerts) == 1
        assert alerts[0]["reason"] == "too_few_labeled_rows"

    def test_replay_overwrites_own_partitions(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        reports = tmp_path / "reports"
        _write_jsonl(src / "b1.jsonl", _healthy_rows())
        _write_jsonl(src / "b2.jsonl", _regressed_rows(), start_id=1000)
        _run(spark, src, reports, tmp_path / "ckpt1")
        first = sorted(
            em.read_eval_reports(spark, str(reports)).collect(),
            key=lambda r: r["ingest_batch"],
        )
        # fresh checkpoint = full replay; dynamic overwrite must leave
        # exactly the same two report rows, not four
        _run(spark, src, reports, tmp_path / "ckpt2")
        second = sorted(
            em.read_eval_reports(spark, str(reports)).collect(),
            key=lambda r: r["ingest_batch"],
        )
        assert first == second

    def test_threshold_matches_batch_operator(self, spark, tmp_path):
        from real_estate_bigdata_spark.operators.evaluation import (
            confusion_at_threshold,
        )

        src = tmp_path / "drop"
        src.mkdir()
        reports, ckpt = tmp_path / "reports", tmp_path / "ckpt"
        rows = _healthy_rows()
        _write_jsonl(src / "b1.jsonl", rows)
        _run(spark, src, reports, ckpt, threshold=0.7)

        rep = em.read_eval_reports(spark, str(reports)).collect()[0]
        batch = spark.createDataFrame(
            [(float(s), int(y)) for s, y in rows], "score double, label int"
        )
        want = confusion_at_threshold(batch, "score", "label", 0.7).collect()[0]
        for k in ("tp", "fp", "tn", "fn", "accuracy", "f1"):
            assert rep[k] == want[k], k
