"""Skew mitigation: salted aggregation and salted broadcast-less joins.

AQE's skew-join splitting (on in ``session.get_spark``) handles most
runtime skew, but two shapes still need explicit salting at 100 TB:

- **salted aggregation** — one ultra-hot group key (a viral listing's
  district, an empty-string event type) lands an entire reducer on one
  task. Salting splits each key into ``n_salts`` sub-groups for the
  partial aggregate, then merges the partials in a second (tiny)
  aggregate keyed on the true key. Two shuffles, but the first is
  balanced and the second moves only ``keys x salts`` rows.
- **salted join** — a shuffled join where ONE side's hot keys dominate:
  salt the skewed (fact) side randomly, explode the other (dim) side
  across all salt values, join on (key, salt). The dim side replicates
  ``n_salts``x — use only when the dim side is too big to broadcast but
  far smaller than the fact side.

Salts are deterministic functions of stable columns where possible
(reproducible runs); the aggregation path uses a random salt because it
never affects the result, only the partition balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg_count", "salted_join"]


def salted_agg_count(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    measure: str | None = None,
) -> DataFrame:
    """Group-by count (and optional sum of ``measure``) with two-stage
    salted aggregation: same groups and totals as
    ``df.groupBy(key).agg(count(*) AS n [, round(sum(measure), 2) AS
    sum_<measure>])``, with a balanced shuffle under any key skew.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial_aggs = [F.count("*").alias("__n")]
    if measure is not None:
        partial_aggs.append(F.sum(measure).alias("__s"))
    partials = salted.groupBy(key, "__salt").agg(*partial_aggs)
    final_aggs = [F.sum("__n").alias("n")]
    if measure is not None:
        final_aggs.append(F.round(F.sum("__s"), 2).alias(f"sum_{measure}"))
    return partials.groupBy(key).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffled equi-join with the fact side salted and the dim side
    exploded across all salts — each hot fact key spreads over
    ``n_salts`` tasks instead of one. Semantically identical to
    ``fact.join(dim, fact[fact_key] == dim[dim_key], how)`` ONLY for
    fact-side-preserving joins (the dim replication is keyed, so
    matches never duplicate — but each unmatched dim row would surface
    once per salt under right/full joins, so those are rejected).
    """
    allowed = ("inner", "left", "left_outer", "left_semi", "left_anti")
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {allowed}; {how!r} would emit each "
            "unmatched dim row once per salt"
        )
    salted_fact = fact.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    exploded_dim = dim.withColumn(
        "__dsalt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (salted_fact[fact_key] == exploded_dim[dim_key]) & (
        salted_fact["__salt"] == exploded_dim["__dsalt"]
    )
    return salted_fact.join(exploded_dim, cond, how).drop("__salt", "__dsalt")
