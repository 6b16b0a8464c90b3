"""Distribution-relative quality filtering: keep rows above (or below)
a global quantile of a metric — "drop the bottom decile by quality
score", the corpus-cleaning step that adapts to the corpus instead of
hard-coding thresholds. North-star training-pipeline operator (the
reference repo — `map_reduce/mapper.py`, `kafka_cc/` — has no
analogue); composes with `text_analysis.doc_quality_profile` /
`repetition_metrics` for the metric itself.

Plan shape: one aggregate to a single-row cutoff + a broadcast
crossJoin filter — the Q15/Q22 scalar-subquery shape; no driver
collect, no second scan beyond the two the semantics require (one to
rank the distribution, one to filter).

Scale note: `F.percentile` is the EXACT quantile — a full sort of the
metric per aggregate. That is the oracle-checkable formulation; at
100 TB swap in ``approx=True`` (`approx_percentile`, t-digest-style
mergeable sketch, one pass, no sort) — same plan shape, bounded rank
error instead of exactness. The cutoff is rounded to 6 decimals on
both engines so a last-bit interpolation difference can't flip an
integer metric sitting on the boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantile_floor"]


def quantile_floor(
    df: DataFrame,
    metric: Column | str,
    q: float = 0.1,
    keep: str = "above",
    approx: bool = False,
) -> DataFrame:
    """Rows whose ``metric`` is >= (``keep="above"``) or <=
    (``keep="below"``) the global ``q``-quantile of ``metric``,
    original schema. Rows with a NULL metric are dropped (a missing
    score can't clear a floor), and never contribute to the quantile.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    m = F.col(metric) if isinstance(metric, str) else metric
    with_m = df.withColumn("__m", m)
    pct = (
        F.percentile_approx("__m", F.lit(q))
        if approx
        else F.percentile("__m", F.lit(q))
    )
    cutoff = with_m.agg(F.round(pct, 6).alias("__cutoff"))
    cond = (
        F.col("__m") >= F.col("__cutoff")
        if keep == "above"
        else F.col("__m") <= F.col("__cutoff")
    )
    return (
        with_m.crossJoin(F.broadcast(cutoff))
        .filter(cond)
        .drop("__m", "__cutoff")
    )
