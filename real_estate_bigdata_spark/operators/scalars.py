"""Scalar-function gallery (SURVEY §2.8 ABSENT tail: string/date/math
beyond the normalization cluster).

One projection exercising the cross-engine-portable scalar surface —
string manipulation, calendar extraction, math — so scalar semantics
(incl. engine quirks like day-of-week numbering) are oracle-pinned in
one place. Map-only; the modulo filter keeps the oracle diff small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scalar_function_gallery"]


def scalar_function_gallery(orders: DataFrame) -> DataFrame:
    return orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        # Spark dayofweek: 1=Sunday..7; oracle (DuckDB dow): 0=Sunday..6
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("o_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.round(F.pow("o_totalprice", F.lit(0.25)), 6).alias("price_qroot"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("price_k"),
        (F.col("o_totalprice") % 100).alias("price_mod"),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )
