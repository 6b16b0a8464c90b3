"""Join operators over the star schema (SURVEY §2.3 — ABSENT in the
reference; Spark semantics are the spec; shapes follow classic TPC-H
query patterns adapted to the driver testdata).

Scale strategy, applied uniformly:

- **Broadcast the dimension chain.** region (5) / nation (25) /
  supplier (10k at sf1) are broadcast; only the fact tables shuffle.
  `F.broadcast` hints make this explicit rather than relying on the
  10 MB autoBroadcast threshold estimate surviving a 1000x scale-up.
- **Join order: facts joined to facts on their natural key** (orders ⋈
  lineitem on orderkey) so the big shuffle happens once on a high-NDV
  key; dimension lookups hang off as broadcast hash joins with no
  exchange.
- Filters are applied BEFORE joins so they push into the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "shipping_priority",
    "local_supplier_volume",
    "returned_items",
    "customer_order_profile",
    "customers_without_orders",
    "active_segment_customers",
]

def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k undelivered orders by revenue for a segment.

    customer is filtered to ~1/5 then broadcast; orders ⋈ lineitem is the
    one real shuffle (orderkey). TakeOrdered caps the result driver-side.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    items = lineitem.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        items.join(F.broadcast(ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)),
                   items.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def local_supplier_volume(
    tables: dict[str, DataFrame],
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier share
    the nation, for one region and one order-date year.

    The whole dimension side (region -> nation -> supplier) broadcasts;
    lineitem ⋈ orders shuffles once on orderkey; the c_nationkey =
    s_nationkey equality is enforced via broadcast lookups, so no extra
    exchange.
    """
    region = tables["region"].filter(F.col("r_name") == region_name)
    nation = tables["nation"].join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supplier = tables["supplier"].join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey")
    customer = tables["customer"].select("c_custkey", "c_nationkey")
    orders = tables["orders"].filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = tables["lineitem"].select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(tables["nation"].select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


def returned_items(
    tables: dict[str, DataFrame],
    date_from: str = "1996-10-01",
    date_to: str = "1997-01-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by lost revenue on returned items
    in one quarter."""
    orders = tables["orders"].filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = tables["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = tables["customer"].select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = tables["nation"].select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def customer_order_profile(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-outer join profile: every customer with order count + spend
    (zero-filled). The aggregate runs on orders BEFORE the join, so the
    outer join is customer ⋈ (pre-aggregated orders) — shuffle carries one
    row per customer, not one per order."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
    )
    return (
        customer.select("c_custkey", "c_name", "c_nationkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total_spend"), F.lit(0.0)).alias("total_spend"),
        )
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join: customers that never ordered."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def active_segment_customers(
    customer: DataFrame,
    orders: DataFrame,
    segment: str = "AUTOMOBILE",
    year: int = 1995,
) -> DataFrame:
    """Semi join: customers of a segment with >= 1 order in a year."""
    yr = orders.filter(F.year("o_orderdate") == year)
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(yr, customer.c_custkey == yr.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )
