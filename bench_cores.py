"""Core-scaling probe (VERDICT r15 task #9): the sf0.1 bench cannot
measure parallelism — sub-second queries are scheduler/fixed-overhead
bound and the 8-core total BEAT the 32-core total in r15, proving
nothing about 100 TB behavior. This harness times the ten most
expensive CPU-bound queries on a 10x corpus (big enough that per-query
fixed cost stops dominating) at the core count in ``SPARK_GRAFT_CPUS``
and merges the result into ``BENCH_CORES.json``; run it once per core
count (a JVM's local[] master is fixed for its lifetime)::

    SPARK_GRAFT_CPUS=32 python bench_cores.py
    SPARK_GRAFT_CPUS=8  python bench_cores.py

The 10x corpus reuses ``bench_scale``'s injective-token-renaming
document synthesis (constant duplicate rate — the regime a real corpus
scales in) and extends it with a customer table whose copies take
offset keys and the matching ``Customer#%09d`` names (same length, same
digit structure, no cross-copy name collisions by construction), so
the fuzzy/geo/record-linkage family runs its real blocking shape.
Synthesis is cached via parquet ``_SUCCESS`` markers; timings are the
min of ``PASSES`` measured passes after one discarded warm-up, noop
sink, clearCache + GC between passes — the bench.py methodology.
Run it ALONE: a concurrent Spark job pollutes the ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

CORES_DIR = os.environ.get("SPARK_GRAFT_CORES_DIR", "/tmp/spark_graft_cores")
BASE_DIR = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
SCALE = 10
#: customer scales less than documents: the fuzzy/geo fixtures derive
#: coordinates from custkey into a FIXED city box, so point density —
#: and with it the radius-join's candidate and output volume — grows
#: quadratically in the copy factor; x3 (9x pair volume) keeps the
#: probe CPU-bound instead of output-materialization-bound, which is
#: what a core-scaling ratio should measure
CUST_SCALE = 3
PASSES = 2

#: the probe battery: the bench's most expensive CPU-bound query paths
#: (pair generators + their CC consumers) — the queries whose 100 TB
#: story depends on parallel speedup, reading only documents/customer
QUERIES = (
    "q_pair_set_quality",
    "q_record_linkage",
    "q_fuzzy_name_pairs",
    "q_geo_comps",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh",
    "q_cross_corpus_pairs",
    "q_best_survivors",
    "q_image_neardup",
)


def _committed(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def synthesize(spark) -> str:
    from pyspark.sql import functions as F

    import bench_scale as bs

    out = os.path.join(CORES_DIR, f"x{SCALE}")
    docs_p = os.path.join(out, "documents.parquet")
    cust_p = os.path.join(out, "customer.parquet")
    if not _committed(docs_p):
        docs = spark.read.parquet(os.path.join(BASE_DIR, "documents.parquet"))
        # union of copies 0..SCALE-1 (bench_scale's synthesize() shape:
        # _synth_documents emits ONE renamed copy per k)
        big = bs._synth_documents(docs, 0)
        for k in range(1, SCALE):
            big = big.unionByName(bs._synth_documents(docs, k))
        big.write.mode("overwrite").parquet(docs_p)
    if not _committed(cust_p):
        cust = spark.read.parquet(os.path.join(BASE_DIR, "customer.parquet"))
        n = cust.count()
        copies = []
        for k in range(CUST_SCALE):
            key = (F.col("c_custkey") + F.lit(k * n)).cast("long")
            copies.append(
                cust.select(
                    key.alias("c_custkey"),
                    F.format_string("Customer#%09d", key).alias("c_name"),
                    *[c for c in cust.columns if c not in ("c_custkey", "c_name")],
                )
            )
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(cust_p)
    return out


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as e
    from real_estate_bigdata_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # local[] mode: the driver JVM IS the executor — the 1g default
    # heap that comfortably holds the sf0.1 bench OOMs on the 10x
    # probe corpus (32 concurrent tasks share it). Sized for the probe
    # box (128 GiB sandbox), set before the JVM starts.
    spark = get_spark(
        app_name=f"bench_cores_c{cpus}",
        master=f"local[{cpus}]",
        extra_conf={"spark.driver.memory": "12g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = synthesize(spark)
    qs = e.queries()
    timings: dict[str, float] = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"bench_cores warmup {name}")
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for p in range(PASSES):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"bench_cores {name} pass {p}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"{name:28s} c{cpus}: {timings[name]:7.3f}s", flush=True)
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = os.path.join(here, "BENCH_CORES.json")
    merged: dict = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as fh:
                merged = json.load(fh)
        except (OSError, json.JSONDecodeError):
            merged = {}
    merged.setdefault("scale", SCALE)
    merged.setdefault("cust_scale", CUST_SCALE)
    merged.setdefault("base", BASE_DIR)
    merged.setdefault("passes", PASSES)
    merged[f"c{cpus}"] = timings
    lo, hi = merged.get("c8"), merged.get("c32")
    if lo and hi:
        merged["speedup_8_to_32"] = {
            q: round(lo[q] / hi[q], 2) for q in hi if q in lo and hi[q] > 0
        }
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(json.dumps({"cpus": int(cpus), "total": round(sum(timings.values()), 2)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
