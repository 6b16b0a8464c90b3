"""Benchmark harness — runs the engine's query registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is fully materialized through the no-op sink (computes every
output column, no driver collect), timed individually after a shared
session warm-up.

Round-over-round guard: when ``BENCH_BASELINE.json`` exists and its sf
matches this run, any query slower than 2x its baseline AND >1 s
absolute over it is reported in a ``regressions`` key (run-to-run load
variance on this host is ~±25%, so the absolute floor keeps sub-second
noise out). The output stays ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import __spark_entry__ as entry_mod
from real_estate_bigdata_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    # Warm up the JVM + parquet footer caches so per-query numbers measure
    # the queries, not first-touch costs.
    queries["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    out = {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as fh:
                base = json.load(fh)
        except (OSError, json.JSONDecodeError):
            base = None
        if base and base.get("sf") == sf_val:
            regressions = {}
            for name, cur in timings.items():
                ref = base.get("queries", {}).get(name)
                if ref is not None and cur > 2 * ref and cur - ref > 1.0:
                    regressions[name] = {"baseline": ref, "current": cur}
            out["regressions"] = regressions

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
