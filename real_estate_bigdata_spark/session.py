"""SparkSession factory tuned for the engine.

The reference creates bare sessions (`spark_jobs/count_by_district.py:7-9`)
and relies on defaults. We pin the settings that matter at scale:

- AQE on (runtime partition coalescing, skew-join splitting) — at 100 TB
  the static shuffle-partition count is always wrong for some stage.
- Arrow on — every Pandas UDF / toPandas crossing is batched, not per-row.
- ``spark.sql.shuffle.partitions`` sized from the env (tests/local runs
  use the core count; a real cluster overrides to ~2-3x total cores).
- Parquet pushdown knobs left at defaults (on) — predicate pushdown and
  column pruning are load-bearing for the scan-heavy queries.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "real_estate_bigdata_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    On a real cluster, ``master`` comes from spark-submit and the shuffle
    partition count should be overridden; locally we default to
    ``local[$SPARK_GRAFT_CPUS]``.

    Session-conf contract (matters when EMBEDDING this package in an
    application that shares the session): this factory pins
    ``spark.sql.session.timeZone=UTC`` and the legacy parquet
    ``nanosAsLong`` conf at build time, and ``schema.load_table``
    RE-PINS both, permanently, on whatever session it is handed — the
    returned DataFrames are lazy and read the timezone at execution
    time, so restoring the conf after the call would corrupt their
    timestamp casts later (full rationale in ``schema.load_table``).
    A mixed-timezone application should therefore either run this
    package in its own session, or set its own timezone per-query via
    ``spark.conf.set`` AFTER materializing this package's results —
    there is deliberately no opt-out, because a non-UTC session would
    silently shift every timestamp the engine reads.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # LIMIT-k+1 probe collects (the bounded fast paths in
        # connected_components / pagerank / dawid_skene / bradley_terry /
        # train_bpe_batched) execute as incremental take(): the first
        # round scans ONE partition, so a probe over a computed pipeline
        # serializes the whole projection on a single core before the
        # 4x scale-up rounds kick in (SPARK-40211's knob; measured the
        # q_domain_authority_cap edge probe at 0.57 s single-task vs
        # ~0.1 s wide). Start take() at the session's parallelism —
        # each task still stops after emitting its bounded row share,
        # so tiny limits on huge tables stay cheap.
        .config(
            "spark.sql.limit.initialNumPartitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # Some testdata generations encode events.ts as parquet
        # TIMESTAMP(NANOS), which the vectorized reader rejects; with this
        # conf the column surfaces as raw int64 nanos and schema.load_table
        # truncates to micros (exactly DuckDB's behavior). load_table also
        # re-pins this defensively for sessions built elsewhere. Harmless
        # for MICROS-encoded data (conf only affects NANOS columns).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The normalization layer targets permissive casts (try_cast /
        # try_to_date); ANSI off keeps plain casts null-on-error too, which
        # matches the reference's swallow-malformed-rows semantics
        # (mapper.py:29-40) and DuckDB's TRY_CAST oracle behavior.
        .config("spark.sql.ansi.enabled", "false")
        # InferFiltersFromGenerate rewrites `Project[expr AS a] -> explode(a)`
        # into a pre-Generate Filter whose predicate inlines `expr` — and
        # every array subscript inside the filter then re-evaluates the full
        # nested higher-order expression, turning O(len) shingle builds into
        # O(len^2) per row (measured 25x slowdown on the dedup operators).
        # The rule only helps when exploding STORED arrays with many
        # empties; this engine explodes computed arrays, so exclude it.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
