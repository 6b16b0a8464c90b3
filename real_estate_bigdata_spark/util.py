"""Small cross-cutting helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "ensure_min_parallelism",
    "is_missing_path_error",
    "with_run_metrics",
]


def is_missing_path_error(exc) -> bool:
    """True iff ``exc`` is Spark's missing-input-path error. Checks the
    STABLE error-class API first (``getCondition`` in PySpark 4,
    ``getErrorClass`` before it) so a Spark release rewording the
    message can't wedge a caller probing an optional path; the message
    substrings remain only as a last-resort fallback. Shared by the
    streaming store readers and the persisted-ANN-artifact readers."""
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(exc, attr, None)
        if fn is None:
            continue
        try:
            cls = fn()
        except Exception:
            continue
        if cls is not None:
            return cls == "PATH_NOT_FOUND"
    return "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc)


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism IF the input
    has fewer partitions — otherwise return the input untouched.

    Expensive map stages (shingle builds, per-row scoring) run at the
    SCAN's partition count until the first exchange; a small or
    single-file input pins them to 1-3 cores (measured ~2x on the text
    operators at sf0.1). On a real many-file 100 TB input the partition
    count already exceeds parallelism and this is a no-op — the check
    makes the repartition safe to bake into operators without taxing
    the large-scale path with a gratuitous full shuffle.

    The partition estimate comes from the file listing — driver-side
    metadata already cached by the file index — NOT ``df.rdd`` (which
    forces analysis + RDD conversion on every operator construction).
    Files >= parallelism means the scan is already parallel (each file
    is at least one partition) — no-op with zero further work. With
    FEWER files the scan may still be wide (few huge files split at
    ``spark.sql.files.maxPartitionBytes``), so the few files are
    stat'ed (cheap: count < parallelism by construction) and the
    split-based partition estimate decides — a 4-file 40 GB table is
    ~320 scan partitions and must NOT be repartitioned down to 32.
    Non-file sources (memory relations) estimate as 1 and rebalance,
    which is exactly the local/test case that needs it.
    """
    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # non-file plans (streaming, pure-local) — assume narrow
        files = []
    if len(files) >= parallelism:
        return df
    if files:
        try:
            jvm = spark.sparkContext._jvm
            jsc = spark.sparkContext._jsc
            max_bytes = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
            )
            est_splits = 0
            for f in files:
                hpath = jvm.org.apache.hadoop.fs.Path(f)
                fs = hpath.getFileSystem(jsc.hadoopConfiguration())
                size = fs.getFileStatus(hpath).getLen()
                est_splits += max(1, -(-size // max(max_bytes, 1)))
            if est_splits >= parallelism:
                return df
        except Exception:  # FS probe failed — fall through to rebalance
            pass
    return df.repartition(parallelism)


def with_run_metrics(df, name: str = "run_metrics", count_col: str | None = None):
    """Attach an Observation collecting row count (and an optional
    non-null count) as the query runs — the engine's replacement for the
    reference's driver-side telemetry counters (`len(data_list)`,
    `success_count`; SURVEY A5), which each cost a separate action.
    Observation metrics ride along with whatever action executes the
    DataFrame: zero extra jobs, zero extra scans.

    Returns (df, observation); read ``observation.get`` AFTER an action.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if count_col is not None:
        metrics.append(F.count(count_col).alias(f"n_{count_col}_nonnull"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
