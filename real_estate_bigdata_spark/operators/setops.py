"""Set operations (SURVEY §2.7 — ABSENT in the reference; Spark
union/intersect/except semantics are the spec).

At scale: INTERSECT/EXCEPT plan as aggregates/semi-anti-joins on the full
row — project to the minimal key columns first so the shuffle carries
keys, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["nation_coverage", "union_all_tagged"]


def nation_coverage(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """Classify nation keys by which side references them:
    'both' (intersect), 'customer_only' (except), 'supplier_only'.

    Projects to the key column before the set ops, so each leg is a
    distinct-aggregate on ints.
    """
    c = customer.select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = supplier.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = c.intersect(s).withColumn("coverage", F.lit("both"))
    c_only = c.exceptAll(s).withColumn("coverage", F.lit("customer_only"))
    s_only = s.exceptAll(c).withColumn("coverage", F.lit("supplier_only"))
    return both.unionByName(c_only).unionByName(s_only)


def union_all_tagged(dfs: dict[str, DataFrame]) -> DataFrame:
    """UNION ALL by name with a provenance tag column — the engine's
    multi-source merge (reference's source registry X1,
    scheduler_runner.py:28-31, generalized)."""
    out = None
    for tag, df in dfs.items():
        tagged = df.withColumn("source_tag", F.lit(tag))
        out = tagged if out is None else out.unionByName(tagged)
    if out is None:
        raise ValueError("union_all_tagged: no inputs")
    return out
