"""Bounded-memory sketches — Count-Min (frequency) and HyperLogLog
(cardinality) at corpus scale (NEW r14; north-star ABSENT category:
the reference counts by full groupBy — `mapreduce/reducer.py:8-15`-class
exact aggregation — which carries state proportional to the key
CARDINALITY; at 100 TB a token/URL/n-gram frequency or distinct-count
pass wants a sketch whose state is fixed regardless of how many
distinct keys exist; Cormode & Muthukrishnan 2005; Flajolet et al.
2007).

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
* :func:`hll_registers` — ONE aggregation: each value hashes once, the
  low ``p`` bits pick a register and the remaining 60-p bits yield the
  leading-zero rank rho; ``groupBy(bucket).max(rho)`` collapses every
  task's contribution to at most ``m = 2^p`` registers BEFORE the
  shuffle (map-side combine), so a distinct-count over any cardinality
  shuffles at most ``m`` rows per task. Per-group sketches via
  ``group_cols`` (distinct users per domain — the 100 TB workhorse).
* :func:`hll_estimate` — the Flajolet HLL readout over the register
  frame. The harmonic sum is computed in INTEGER space
  (``sum(2^(S - rho))`` as bigint, exact in both engines) so the
  estimate is one deterministic double division — no order-dependent
  float accumulation — and the small-range linear-counting branch
  selects on identical doubles in any engine.
* :func:`hll_merge` — register-wise MAX: sketches of shards union into
  the sketch of the union (the mergeability that makes HLL a
  cluster-scale operator).

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
    "hll_registers",
    "hll_estimate",
    "hll_merge",
    "hll_overlap_estimate",
    "HllIndex",
    "save_hll",
    "load_hll",
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


# --------------------------------------------------------------------------
# HyperLogLog — bounded-memory cardinality estimation (Flajolet et al. 2007)
# --------------------------------------------------------------------------

#: md5-prefix hashes carry 60 bits; with ``p`` of them spent on the
#: register index, the rank rho ranges over [1, 60 - p + 1].
_HLL_HASH_BITS = 60


def _hll_validate(p: int) -> None:
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias-correction constant (exact literal —
    inlined into both the Spark plan and any oracle, so the estimate
    arithmetic is engine-identical)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 11,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build the HLL register frame for the distinct non-NULL values of
    ``df[col]``: one row per TOUCHED register, ``(bucket, max_rho)``
    (an absent bucket is register value 0). With ``group_cols``, one
    independent sketch per group — ``(*group_cols, bucket, max_rho)``,
    the distinct-users-per-domain shape.

    Portable hashing (the bloom/CMS md5-prefix convention): the 60-bit
    hash's LOW ``p`` bits index the register and the HIGH ``60 - p``
    bits ``w`` give ``rho = (60 - p) - bitlen(w) + 1`` (``w == 0`` ->
    ``60 - p + 1``) — ``bitlen`` via the exact base-2 STRING length, no
    float log anywhere, so an ANSI oracle (``bin()`` / ``>>`` / ``&``)
    rebuilds the registers BIT-IDENTICALLY.

    Scale shape: one hash projection + one groupBy whose map-side
    combine bounds each task's shuffle contribution at ``2^p`` rows per
    group — corpus cardinality never reaches the exchange."""
    _hll_validate(p)
    m = 1 << p
    tail_bits = _HLL_HASH_BITS - p
    value = F.col(col)
    h = F.conv(
        F.substring(F.md5(value.cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits) - F.length(F.conv(w.cast("string"), 10, 2)) + 1
    )
    keys = list(group_cols or [])
    return (
        df.where(value.isNotNull())
        .select(
            *keys,
            h.bitwiseAND(m - 1).alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME ``p`` (and group columns):
    register-wise max, so ``merge(sketch(A), sketch(B)) ==
    sketch(A UNION B)`` exactly — shard locally, merge globally."""
    if not register_frames:
        raise ValueError("hll_merge needs at least one register frame")
    out = register_frames[0]
    for other in register_frames[1:]:
        out = out.unionByName(other)
    keys = [c for c in out.columns if c != "max_rho"]
    return out.groupBy(*keys).agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(
    registers: DataFrame,
    p: int,
    group_cols: list[str] | None = None,
    out_col: str = "est",
) -> DataFrame:
    """Cardinality estimate from a register frame built at the same
    ``p`` (geometry must match the build — persist it via the meta
    tier, :class:`HllIndex`). Returns one row per group (a single row
    without ``group_cols``) with the rounded estimate in ``out_col``.

    Determinism across engines: the harmonic sum ``sum(2^-rho)`` over
    all ``m`` registers is accumulated as the EXACT integer
    ``sum(2^(S - rho))`` with ``S = 61 - p`` (max term ``2^(60-p)``
    times ``2^p`` registers < 2^63 — no overflow, no float
    accumulation order), untouched registers contributing ``2^S``
    each; the estimate is then a single double expression. The
    small-range branch (raw <= 2.5 m with empty registers) uses
    linear counting ``m * ln(m / V)``; branch selection compares
    doubles derived from exact integers, so every engine takes the
    same branch."""
    _hll_validate(p)
    m = 1 << p
    s_bits = _HLL_HASH_BITS + 1 - p
    alpha = _hll_alpha(m)
    keys = list(group_cols or [])
    if out_col in keys:
        raise ValueError(f"out_col {out_col!r} collides with a group column")
    agg = registers.groupBy(*keys).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {s_bits} - max_rho)")
        ).alias("__hsum"),
        F.count("*").alias("__nz"),
    )
    # An EMPTY ungrouped frame (all-NULL or zero-row input) reaches the
    # global aggregate as one row with sum=NULL/count=0; coalescing the
    # sum to 0 makes zeros == m drive the linear-counting branch to
    # m*ln(m/m) = 0 instead of propagating NULL (ADVICE r14).
    zeros = F.lit(m) - F.col("__nz")
    hsum = (
        F.coalesce(F.col("__hsum"), F.lit(0))
        + zeros * F.lit(float(2**s_bits))
    ).cast("double")
    raw = F.lit(alpha * m * m * float(2**s_bits)) / hsum
    small = (raw <= F.lit(2.5 * m)) & (zeros > 0)
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.round(F.when(small, linear).otherwise(raw), 6)
    return agg.select(*keys, est.alias(out_col))


@dataclass(frozen=True)
class HllIndex:
    """A loaded HLL artifact: registers plus the precision they were
    built with (the CMS geometry-meta-tier pattern — estimating at a
    different ``p`` than the build silently produces garbage, so the
    persisted form carries ``p`` and the serve path can never drift)."""

    registers: DataFrame
    p: int
    group_cols: tuple[str, ...] = ()

    def estimate(self, out_col: str = "est") -> DataFrame:
        return hll_estimate(
            self.registers, self.p,
            group_cols=list(self.group_cols), out_col=out_col,
        )


def save_hll(
    registers: DataFrame, path: str, p: int,
    group_cols: list[str] | None = None,
) -> None:
    """Persist registers (bounded at ``2^p`` rows per group) + a
    one-row meta tier recording the geometry."""
    _hll_validate(p)
    spark = registers.sparkSession
    registers.write.mode("overwrite").parquet(f"{path}/registers")
    spark.createDataFrame(
        [(int(p), ",".join(group_cols or []))], "p int, group_cols string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_hll(spark, path: str) -> HllIndex:
    """Load a persisted sketch with its geometry; registers stay a lazy
    scan."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    cols = tuple(c for c in meta.group_cols.split(",") if c)
    return HllIndex(
        registers=spark.read.parquet(f"{path}/registers"),
        p=int(meta.p),
        group_cols=cols,
    )


def hll_overlap_estimate(
    regs_a: DataFrame,
    regs_b: DataFrame,
    p: int,
    label_a: str = "a",
    label_b: str = "b",
) -> DataFrame:
    """Audience-overlap readout from two UNGROUPED register frames
    built at the same ``p``: one row with ``est_a``, ``est_b``,
    ``est_union`` (the merge's estimate — exact sketch algebra, since
    ``merge(A, B) == sketch(A UNION B)``) and ``est_intersection`` by
    inclusion-exclusion, plus the labels. The classic two-sketch
    question ("distinct users in BOTH audiences") answered without
    ever joining the raw sets.

    Intersection has no sketch of its own — inclusion-exclusion
    differences two noisy estimates, so its error is the UNION of the
    operands' (and a small true overlap can read slightly negative;
    returned as computed, not clamped — a clamped 0 would hide the
    noise floor the caller should see). All arithmetic is over the
    round-6 estimates in a fixed order, so an ANSI oracle reproduces
    it bit-for-bit."""
    _hll_validate(p)
    ea = hll_estimate(regs_a, p, out_col="est_a")
    eb = hll_estimate(regs_b, p, out_col="est_b")
    eu = hll_estimate(hll_merge(regs_a, regs_b), p, out_col="est_union")
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            F.lit(label_a).alias("label_a"),
            F.lit(label_b).alias("label_b"),
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 6
            ).alias("est_intersection"),
        )
    )
