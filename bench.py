"""Benchmark harness — runs the engine's query registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE SHORT JSON line:

    {"metric": "total_query_wall_time", "value": <total_sec>,
     "unit": "sec", "sf": <sf>, "n_queries": N,
     "n_regressions": R, "queries": {"<name>": <sec 2dp>, ...}}

The per-query map on stdout is compact (2-decimal values, no-space
separators) because the driver that records this line captures a
bounded tail of stdout — an overlong line loses its head and becomes
unparseable (this exact failure produced round 2's ``parsed: null``).
Full-precision timings and the regression report are written to disk
(``BENCH_DETAIL.json`` / ``BENCH_REGRESSIONS.json`` next to this file).

Contention defense: after one DISCARDED full warm-up pass (round 8 —
JIT, parquet footer caches, and Python worker pools all pay first
touch outside the measurement), every query is timed over THREE full
passes and the per-query MINIMUM is reported. A single contended pass
(another process hammering the host, cold page cache) inflates every
query by a uniform factor — the min across passes recovers the true
warm number, so one bad run can't fake a fleet-wide regression. The
total is the sum of per-query minima (i.e. best-case wall time, the
stable comparable quantity).

Session-state defense (round 7, after two consecutive rounds of
+5-11 % diffuse creep on unchanged plans): a long single-session bench
accumulates JVM garbage — localCheckpoint RDD blocks, torrent
broadcast pieces, shuffle metadata — that Spark's ContextCleaner only
frees on a JVM GC, and its periodic forced GC
(spark.cleaner.periodicGC.interval) defaults to 30 min: it never fires
inside a ~4-minute bench, so pass N runs under strictly more heap
pressure than pass 1. Between passes we now clearCache() and force a
JVM System.gc() so the ContextCleaner drains its reference queue, and
BENCH_DETAIL.json records PER-PASS timings (``per_pass``) so any
future drift is attributable to a specific pass shape instead of
guessed at.

Regression guard: when ``BENCH_BASELINE.json`` exists and its sf
matches this run, any query slower than 2x its baseline AND >1 s
absolute over it AND >2x after normalizing by the run's MEDIAN guard
ratio lands in BENCH_REGRESSIONS.json; stdout only carries the count.
The normalization (r15, VERDICT r14 task #5) separates a uniform
environment shift from a targeted regression: five same-code r14 runs
produced five different raw flag sets because the whole distribution
sat at 1.4-1.7x the all-time minima — under the normalized gate those
runs flag nothing, while a genuinely pathological query (the
q_label_agreement class: 8.9x raw against a 1.68 median) still trips
both bars. Guards stay all-time minima; BENCH_REGRESSIONS.json carries
both raw and normalized ratios plus the run median for attribution.
"""

from __future__ import annotations

import json
import os
import sys
import time

import __spark_entry__ as entry_mod
from real_estate_bigdata_spark.session import get_spark

N_PASSES = 3


def _session_gc(spark) -> None:
    """Drop cached blocks and force a JVM GC so the ContextCleaner frees
    accumulated localCheckpoint / broadcast blocks between passes (its
    own periodic GC never fires inside a short bench)."""
    try:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass  # cleanup is best-effort — never fail the bench over it

# The driver records a bounded tail of stdout (measured: exactly 2,000
# bytes in BENCH_r04.json).  A line longer than that window loses its
# HEAD — the {"metric":...,"value":... prefix — and the driver records
# ``parsed: null`` (this happened in rounds 2 and 4).  We therefore
# bound the emitted line BY CONSTRUCTION: if the full per-query map
# would push the line past the budget, the map is truncated to the
# slowest queries that fit and ``queries_truncated`` is set.  Full
# 4-decimal per-query timings always live in BENCH_DETAIL.json.
STDOUT_LINE_BUDGET = 1800


def build_stdout_line(
    total: float,
    sf_val,
    timings: dict[str, float],
    n_regressions: int,
) -> str:
    """Serialize the one-line stdout record, guaranteed <= budget bytes.

    Tested by ``tests/test_bench_contract.py`` at the LIVE registry size,
    so adding queries can never silently reproduce ``parsed: null``.
    """
    base = {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "n_regressions": n_regressions,
    }
    compact = {k: round(v, 2) for k, v in timings.items()}
    line = json.dumps({**base, "queries": compact}, separators=(",", ":"))
    if len(line) <= STDOUT_LINE_BUDGET:
        return line
    # Keep the slowest queries (the ones a reader of the line cares
    # about) while the serialized line still fits; deterministic order.
    kept: dict[str, float] = {}
    for k in sorted(compact, key=lambda q: (-compact[q], q)):
        trial = {**base, "queries_truncated": True, "queries": {**kept, k: compact[k]}}
        if len(json.dumps(trial, separators=(",", ":"))) > STDOUT_LINE_BUDGET:
            break
        kept[k] = compact[k]
    return json.dumps(
        {**base, "queries_truncated": True, "queries": kept},
        separators=(",", ":"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    # Silence the benign DAGScheduler "attempted to access non-existent
    # accumulator" race: accumulators from GC'd localCheckpoint stages can
    # report after their stage is cleaned, logging at ERROR (so
    # setLogLevel("ERROR") doesn't hide it) although the job result is
    # unaffected. It polluted the BENCH_r03 stderr tail; real failures
    # still surface as raised exceptions, not logs.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.OFF,
        )
    except Exception:
        pass  # log4j2 internals absent — noise tolerated, never fatal

    queries = entry_mod.queries()
    # Discarded FULL warm-up pass (round 8; a single-query warm-up left
    # every other query's pass-1 number carrying first-touch costs —
    # JIT, parquet footer cache, Python worker spin-up — so a contended
    # pass 2/3 could leave the cold pass 1 inside the min). Its
    # per-query timings are recorded in BENCH_DETAIL.json as
    # ``warmup_pass`` for attribution but never enter the min.
    warmup_pass: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        warmup_pass[name] = round(time.perf_counter() - t0, 4)

    timings: dict[str, float] = {}
    per_pass: dict[str, list[float]] = {name: [] for name in queries}
    for pass_idx in range(N_PASSES):
        _session_gc(spark)
        for name in sorted(queries):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 4)
            per_pass[name].append(dt)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    here = os.path.dirname(os.path.abspath(__file__))
    regressions: dict = {}
    baseline_path = os.path.join(here, "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as fh:
                base = json.load(fh)
        except (OSError, json.JSONDecodeError):
            base = None
        if base and base.get("sf") == sf_val:
            # Median guard ratio of THIS run = the session's uniform
            # environment factor (steal time / CPU frequency — r14
            # measured 1.4-1.7x on identical code). A real regression
            # must stand out of the run's own distribution, not just
            # the all-time minimum.
            ratios = sorted(
                cur / ref
                for name, cur in timings.items()
                for ref in [base.get("queries", {}).get(name)]
                if ref
            )
            med = ratios[len(ratios) // 2] if ratios else 1.0
            flagged = {}
            for name, cur in timings.items():
                ref = base.get("queries", {}).get(name)
                if not ref:
                    continue
                raw = cur / ref
                norm = raw / med if med > 0 else raw
                if raw > 2 and norm > 2 and cur - ref > 1.0:
                    flagged[name] = {
                        "baseline": ref,
                        "current": cur,
                        "raw_ratio": round(raw, 3),
                        "normalized_ratio": round(norm, 3),
                    }
            regressions = {
                "run_median_guard_ratio": round(med, 3),
                "gate": "raw>2 AND normalized>2 AND abs>1s",
                "flagged": flagged,
                # ADVICE r15 #2: the normalized gate cannot flag a
                # codewide slowdown — if EVERY query regresses ~3x the
                # run median absorbs it and per-query flags stay quiet.
                # Surface the whole-distribution shift separately so a
                # uniform regression is at least visible in this file;
                # adjudicating code-vs-environment still needs the
                # BENCH_GUARDS same-code re-measure protocol (host
                # steal alone produced 1.4-1.7x medians in r14).
                "uniform_shift_flag": med > 2.0,
            }

    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "passes": N_PASSES,
                "queries": timings,
                "per_pass": per_pass,
                "warmup_pass": warmup_pass,
            },
            fh,
            indent=1,
        )
    with open(os.path.join(here, "BENCH_REGRESSIONS.json"), "w") as fh:
        json.dump(regressions, fh, indent=1)

    n_flagged = len(regressions.get("flagged", {}))
    print(build_stdout_line(total, sf_val, timings, n_flagged))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
