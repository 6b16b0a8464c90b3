"""Small cross-cutting helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_parallelism", "with_run_metrics"]


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

    The partition estimate is ``len(df.inputFiles())`` — a driver-side
    listing already cached by the file index — NOT ``df.rdd`` (which
    forces analysis + RDD conversion on every operator construction).
    Files >= parallelism means the scan is already parallel (each file
    is at least one partition). Few-but-huge files under-estimate
    (128 MB splits would raise the real count), which only costs this
    rebalance an unnecessary shuffle, never a correctness change; the
    non-file sources (memory relations) estimate as 1 and rebalance,
    which is exactly the local/test case that needs it.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file plans (streaming, pure-local) — assume narrow
        n_files = 0
    if max(n_files, 1) < parallelism:
        return df.repartition(parallelism)
    return df


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
