"""Streaming drift monitor: per-micro-batch PSI against a materialized
baseline histogram (streaming.drift_monitor — the continuous form of
quality.distribution_drift). The scenarios that matter operationally:
a planted shift in ONE source raises that source's PSI while the
healthy source stays flat; a source going silent is maximal drift, not
a non-event; replayed epochs overwrite their own report partition.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from real_estate_bigdata_spark.streaming import drift_monitor as dm

LO, HI, NBINS = 0.0, 600.0, 6


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, f"doc {i}", "en", src, n) for i, (src, n) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _write_jsonl(path, rows, start_id=1000):
    with open(path, "w", encoding="utf-8") as f:
        for i, (src, n) in enumerate(rows):
            f.write(
                json.dumps(
                    {
                        "doc_id": start_id + i,
                        "text": f"doc {start_id + i}",
                        "lang": "en",
                        "source": src,
                        "n_chars": n,
                    }
                )
                + "\n"
            )


def _baseline_rows():
    # both sources centered in [100, 300): bins 2-3 of six 100-wide bins
    return [("s1", 100 + (i * 7) % 200) for i in range(60)] + [
        ("s2", 100 + (i * 7) % 200) for i in range(60)
    ]


def _run(spark, src, baseline, reports, ckpt):
    q = dm.run_drift_monitor(
        spark,
        str(src),
        str(baseline),
        str(reports),
        str(ckpt),
        metric="n_chars",
        lo=LO,
        hi=HI,
        n_bins=NBINS,
        group_col="source",
    )
    q.awaitTermination(120)


class TestDriftMonitor:
    def test_planted_shift_isolated_to_its_source(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        baseline = tmp_path / "baseline_hist"
        reports, ckpt = tmp_path / "reports", tmp_path / "ckpt"

        dm.write_baseline_histogram(
            _docs(spark, _baseline_rows()), "n_chars", LO, HI,
            str(baseline), n_bins=NBINS, group_col="source",
        )
        # s1 unchanged (same generator); s2 shifted to [500, 550) = bin 6
        _write_jsonl(
            src / "b1.jsonl",
            [("s1", 100 + (i * 7) % 200) for i in range(60)]
            + [("s2", 500 + i % 50) for i in range(60)],
        )
        _run(spark, src, baseline, reports, ckpt)

        report = dm.read_drift_reports(spark, str(reports))
        psi = {
            r.source: r.psi
            for r in report.groupBy("source")
            .agg(F.round(F.sum("psi_contrib"), 6).alias("psi"))
            .collect()
        }
        assert psi["s2"] > 0.25, psi  # act-now drift on the broken feed
        assert psi["s1"] < 0.1, psi  # healthy feed stays flat
        alerts = dm.drift_alerts(report).collect()
        assert [(r.source, r.ingest_batch) for r in alerts] == [("s2", 0)]
        # per-bin attribution: the s2 mass moved INTO bin 6
        top_bin = (
            report.filter(F.col("source") == "s2")
            .orderBy(F.desc("psi_contrib"))
            .first()
        )
        assert top_bin.bin == 6 and top_bin.n_new == 60

    def test_silent_source_is_maximal_drift(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        baseline = tmp_path / "baseline_hist"
        reports, ckpt = tmp_path / "reports", tmp_path / "ckpt"

        dm.write_baseline_histogram(
            _docs(spark, _baseline_rows()), "n_chars", LO, HI,
            str(baseline), n_bins=NBINS, group_col="source",
        )
        # s2 sends nothing this batch: its report rows exist (from the
        # baseline side of the group set) with an all-smoothed uniform
        # on the batch side — a strong PSI, not an absent row
        _write_jsonl(
            src / "b1.jsonl", [("s1", 100 + (i * 7) % 200) for i in range(60)]
        )
        _run(spark, src, baseline, reports, ckpt)

        report = dm.read_drift_reports(spark, str(reports))
        rows = {r.source for r in report.select("source").distinct().collect()}
        assert rows == {"s1", "s2"}
        alerts = {r.source for r in dm.drift_alerts(report).collect()}
        assert alerts == {"s2"}

    def test_batches_land_in_own_partitions_and_baseline_rereads(
        self, spark, tmp_path
    ):
        src = tmp_path / "drop"
        src.mkdir()
        baseline = tmp_path / "baseline_hist"
        reports, ckpt = tmp_path / "reports", tmp_path / "ckpt"

        dm.write_baseline_histogram(
            _docs(spark, _baseline_rows()), "n_chars", LO, HI,
            str(baseline), n_bins=NBINS, group_col="source",
        )
        _write_jsonl(
            src / "b1.jsonl", [("s1", 100 + (i * 7) % 200) for i in range(30)]
        )
        _run(spark, src, baseline, reports, ckpt)
        # second drain: new file -> new epoch -> its own partition;
        # the first batch's report is untouched
        _write_jsonl(
            src / "b2.jsonl",
            [("s1", 500 + i % 50) for i in range(30)],
            start_id=2000,
        )
        _run(spark, src, baseline, reports, ckpt)

        report = dm.read_drift_reports(spark, str(reports))
        batches = {
            r.ingest_batch
            for r in report.select("ingest_batch").distinct().collect()
        }
        assert batches == {0, 1}
        # batch 0 healthy, batch 1 shifted — per-batch isolation
        alerts = dm.drift_alerts(report).collect()
        assert {(r.ingest_batch, r.source) for r in alerts} == {(1, "s1")} | {
            (b, "s2") for b in (0, 1)
        }
