"""Count-Min sketch — bounded-memory frequency estimation at corpus
scale (NEW r14; north-star ABSENT category: the reference counts by
full groupBy — `mapreduce/reducer.py:8-15`-class exact aggregation —
which carries state proportional to the key CARDINALITY; at 100 TB a
token/URL/n-gram frequency pass wants a sketch whose state is a fixed
``depth x width`` grid regardless of how many distinct keys exist;
Cormode & Muthukrishnan 2005).

Spark-first shape:

* :func:`count_min_sketch` — ONE aggregation: each row fans out to its
  ``depth`` (row, bucket) cells via ``posexplode`` and the groupBy's
  map-side partial aggregation collapses every task's contribution to
  at most ``depth x width`` cells before the shuffle, so shuffle volume
  is bounded by the SKETCH size times the task count, never by the
  corpus or its cardinality. The sketch itself is a DataFrame of
  ``(d, bucket, cnt)`` cells — persistable as parquet like every other
  index artifact in this engine.
* :func:`cms_estimate` — point-frequency lookups for a (small) query
  set: the sketch (<= depth x width rows) broadcasts, each query joins
  its ``depth`` cells, and the estimate is the MIN over them; absent
  cells count 0. One broadcast join + one bounded aggregate; the query
  frame never shuffles whole.

Estimates are deterministic upper bounds: ``est >= true`` always (no
deletions), with the classic (eps = e/width, delta = e^-depth) error
bound. Hashing is the engine's PORTABLE md5-prefix convention
(``conv(substr(md5(value || ':' || d),1,15),16,10) % width`` — the
bloom-screen precedent), so an ANSI oracle rebuilds the sketch
BIT-IDENTICALLY and the driver query carries a full DuckDB hash check
(`q_cms_token_counts`) — a sketch with a full oracle, like the bloom
screen.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "count_min_sketch",
    "cms_estimate",
    "cms_bucket",
    "CmsIndex",
    "save_cms",
    "load_cms",
]


def cms_bucket(value: Column, d: int, width: int) -> Column:
    """Portable bucket of ``value`` for hash row ``d``: 60-bit
    md5-prefix of ``value:<d>`` mod ``width`` (non-negative, so ``%``
    and ``pmod`` agree across engines)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("", value.cast("string"), F.lit(f":{d}"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(width))


def _validate(width: int, depth: int) -> None:
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    if not 1 <= depth <= 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")


def count_min_sketch(
    df: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(d, bucket, cnt)`` cells, one row per
    non-empty cell (absent cell = 0). NULL values are skipped — a NULL
    key has no frequency, matching every counting operator here.
    ``weight_col`` accumulates a weight (e.g. token counts already
    aggregated per document) instead of 1 per row."""
    _validate(width, depth)
    value = F.col(col)
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1)
    cells = F.array(*[cms_bucket(value, d, width) for d in range(depth)])
    return (
        df.where(value.isNotNull())
        .select(F.posexplode(cells).alias("d", "bucket"), w.alias("__w"))
        .groupBy("d", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


@dataclass(frozen=True)
class CmsIndex:
    """A loaded sketch artifact: the cells plus the geometry they were
    built with. ``cms_estimate`` probes must hash with the SAME
    width/depth as the build — mismatched geometry silently produces
    garbage (an absent probe cell reads 0, breaking even the
    overestimate guarantee) — so the persisted form carries its
    geometry as a meta tier (the IVF/BM25 index-lifecycle pattern) and
    the serve path can never drift from the build."""

    cells: DataFrame
    width: int
    depth: int

    def estimate(self, queries: DataFrame, col: str, out_col: str = "est"):
        return cms_estimate(
            self.cells, queries, col,
            width=self.width, depth=self.depth, out_col=out_col,
        )


def save_cms(
    sketch: DataFrame, path: str, width: int, depth: int
) -> None:
    """Persist a sketch built by :func:`count_min_sketch` at
    ``width``/``depth``: cells as parquet (bounded at depth x width
    rows) + a one-row meta tier recording the geometry."""
    _validate(width, depth)
    spark = sketch.sparkSession
    sketch.coalesce(1).write.mode("overwrite").parquet(f"{path}/cells")
    spark.createDataFrame(
        [(int(width), int(depth))], "width int, depth int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_cms(spark, path: str) -> CmsIndex:
    """Load a persisted sketch with its geometry; the cells stay a lazy
    scan (they broadcast at estimate time)."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    return CmsIndex(
        cells=spark.read.parquet(f"{path}/cells"),
        width=int(meta.width),
        depth=int(meta.depth),
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 4,
    out_col: str = "est",
) -> DataFrame:
    """Point-frequency estimates for the DISTINCT non-NULL values of
    ``queries[col]``: min over the value's ``depth`` cells, 0 for a
    cell the sketch never touched. ``width``/``depth`` must match the
    build (the sketch frame is just cells — it cannot re-derive its own
    geometry; persist them next to the parquet like the IVF meta tier).
    Returns ``(col, out_col)``. The sketch side is forced broadcast —
    bounded at ``depth x width`` rows by construction."""
    _validate(width, depth)
    if out_col == col:
        raise ValueError(f"out_col {out_col!r} collides with the key column")
    value = F.col(col)
    cells = F.array(*[cms_bucket(value, d, width) for d in range(depth)])
    probes = (
        queries.where(value.isNotNull())
        .select(value.alias(col))
        .distinct()
        .select(col, F.posexplode(cells).alias("d", "bucket"))
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )
