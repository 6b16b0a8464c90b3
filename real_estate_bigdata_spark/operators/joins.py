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
    "order_priority_checking",
    "volume_shipping",
    "market_share",
    "product_type_profit",
    "customer_distribution",
    "promo_revenue",
    "small_quantity_parts",
    "disjunctive_revenue",
    "waiting_suppliers",
    "sales_opportunity",
    "priority_line_counts",
    "supplier_variety",
    "important_part_values",
    "potential_promotion_suppliers",
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


def order_priority_checking(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q4 shape: orders per priority with >= 1 slow lineitem.

    The driver testdata has no commit/receipt dates (TESTDATA.md), so
    "slow" is l_shipdate > o_orderdate + late_days — same correlated-
    EXISTS structure as Q4. Planned as a left-semi join with a non-equi
    residual; the quarter filter prunes orders before the join.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    # timestamp + interval, NOT date_add (which truncates time-of-day to
    # DATE and would diverge from the oracle on non-midnight timestamps)
    slow = ords.join(
        li,
        (ords.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > ords.o_orderdate + F.make_interval(days=F.lit(late_days))
        ),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def priority_line_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 shape: high/low-priority line counts per lineitem class.

    The driver testdata has no l_shipmode / l_commitdate / l_receiptdate
    (TESTDATA.md), so l_returnflag stands in as the group key and the
    l_shipdate year-window as the receipt filter — same join + conditional
    aggregation structure as Q12.

    Plan: the shipdate window pushes into the lineitem scan; the
    orderkey equi-join is the one fact-sized exchange; the conditional
    counts compile to one partial+final hash aggregate over 3 groups
    (count-FILTER, not sum-of-CASE, so no post-agg cast is needed).
    """
    items = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    ords = orders.select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
    )


def supplier_variety(
    part: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    excluded_brand: str = "Brand#45",
) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per part attribute.

    Adapted to the driver testdata (no partsupp table / comment columns):
    lineitem supplies the (partkey, suppkey) relation, one brand is
    excluded, and suppliers with negative account balance play Q16's
    "customer complaints" blacklist via an anti join.

    Plan: the blacklist (handful of rows) broadcasts into an anti join on
    the lineitem scan; the pruned part table broadcasts for the attribute
    lookup; the only fact-sized exchange is the distinct aggregation's
    expand+shuffle on (brand, type, size) — one pass over lineitem at
    any scale.
    """
    blacklist = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(F.col("p_brand") != excluded_brand).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(blacklist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def volume_shipping(
    tables: dict[str, DataFrame],
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_7",
    year_from: int = 1996,
    year_to: int = 1997,
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by direction
    and ship year.

    Both nation lookups broadcast (25 rows); lineitem ⋈ orders is the one
    real shuffle. The (supp_nation, cust_nation) pair filter is applied
    as soon as both sides are bound.
    """
    nat = tables["nation"].filter(F.col("n_name").isin(nation_a, nation_b))
    supp = tables["supplier"].join(
        F.broadcast(nat.select(F.col("n_nationkey"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust = tables["customer"].join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    li = tables["lineitem"].filter(
        (F.year("l_shipdate") >= year_from) & (F.year("l_shipdate") <= year_to)
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    return (
        li.join(tables["orders"].select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def market_share(
    tables: dict[str, DataFrame],
    region_name: str = "ASIA",
    part_type: str = "PROMO",
    share_nation: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q8 shape: a nation's share of one part type's revenue within
    one region's customer market, per order year.

    part is filtered then broadcast (it gates everything); region ->
    nation -> customer restricts the customer side; the conditional
    numerator (share nation only) and the total run in ONE aggregate pass
    — no second scan, no self-join.
    """
    part = tables["part"].filter(F.col("p_type") == part_type).select("p_partkey")
    region = tables["region"].filter(F.col("r_name") == region_name)
    cust_nat = tables["nation"].join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    cust = tables["customer"].join(
        F.broadcast(cust_nat), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    supp = tables["supplier"].join(
        F.broadcast(tables["nation"].select(F.col("n_nationkey").alias("sn_key"),
                                            F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    li = tables["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(tables["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey, "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == share_nation, vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def product_type_profit(
    tables: dict[str, DataFrame],
    name_like: str = "%red%",
    cost_factor: float = 0.6,
) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year for a
    part-name family.

    The testdata has no partsupp, so supply cost is approximated as
    ``cost_factor * p_retailprice`` per unit — structure preserved:
    5-table join gated by a part-name LIKE, two-level grouping. part
    (filtered) and the nation-keyed supplier side broadcast; lineitem ⋈
    orders shuffles once on orderkey.
    """
    part = tables["part"].filter(F.col("p_name").like(name_like)).select(
        "p_partkey", "p_retailprice"
    )
    supp = tables["supplier"].join(
        F.broadcast(tables["nation"].select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    li = tables["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * cost_factor
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(tables["orders"].select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


def customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by order count (including
    the zero-order bucket via left outer join).

    Two aggregates, two shuffles — but the second groups on n_orders
    (tiny domain) over one row per customer, so shuffle #2 is noise.
    """
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


def promo_revenue(
    lineitem: DataFrame, part: DataFrame, year: int = 1997
) -> DataFrame:
    """TPC-H Q14 shape: promo part types' share of revenue per ship month.

    part prunes to (partkey, type) and broadcasts; conditional numerator
    and denominator in one pass, like :func:`market_share`.
    """
    li = lineitem.filter(F.year("l_shipdate") == year).select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = part.select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.month("l_shipdate").cast("long").alias("l_month"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def small_quantity_parts(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#3", factor: float = 0.5
) -> DataFrame:
    """TPC-H Q17 shape: yearly-average revenue lost to small-quantity
    orders of one brand's parts.

    The per-part average quantity (Q17's correlated scalar subquery) is
    computed as a pre-aggregate over ONLY the brand's lineitems and
    broadcast-joined back — lineitem is scanned once for the aggregate
    and once for the probe, both scans pruned by the broadcast part
    filter; no window over the full fact table.
    """
    p = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * factor).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd (brand, size, quantity)
    predicate branches — the classic disjunctive-pushdown test.

    The join is a plain equi-join on partkey with the disjunction as a
    residual; Catalyst extracts the common l_quantity bounds and the
    per-branch part predicates so both scans still prune.
    """
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = part.select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def waiting_suppliers(
    tables: dict[str, DataFrame], late_days: int = 90, k: int = 25
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    finalized multi-supplier order.

    No commit/receipt dates in the testdata, so "late" is l_shipdate >
    o_orderdate + late_days. Structure preserved: semi join ("another
    supplier shipped on this order") + anti join ("no OTHER supplier was
    late") + count per supplier. The l2/l3 probes project only
    (orderkey, suppkey[, shipdate]) so the extra scans are narrow.
    """
    li = tables["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    ords = tables["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l1 = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        # timestamp + interval, not date_add (DATE truncation diverges
        # from the oracle off-midnight)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.make_interval(days=F.lit(late_days))
        )
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key"))
    exists_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2_key")) & (F.col("l_suppkey") != F.col("s2_key")),
        "left_semi",
    )
    # the NOT-EXISTS probe is l1 itself (Q21 requires the SAME late set);
    # reusing the plan keeps them identical and lets exchange reuse
    # deduplicate the subtree
    l3 = l1.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    only_late = exists_other.join(
        l3,
        (F.col("l_orderkey") == F.col("o3_key")) & (F.col("l_suppkey") != F.col("s3_key")),
        "left_anti",
    )
    supp = tables["supplier"].select("s_suppkey", "s_name")
    return (
        only_late.join(F.broadcast(supp), only_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(k)
    )


def sales_opportunity(
    customer: DataFrame, orders: DataFrame, inactive_since: str = "1999-01-01"
) -> DataFrame:
    """TPC-H Q22 shape: per nation, the count + balance of above-average-
    balance customers with no recent orders.

    The global average (Q22's scalar subquery) is a one-row aggregate
    joined in as a broadcast cross join — evaluated once, streamed past
    every row; the no-recent-orders test is a left-anti join against the
    date-pruned orders scan.
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = (
        customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(inactive_since).cast("timestamp")
    ).select("o_custkey")
    return (
        rich.join(recent, rich.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
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


def important_part_values(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_9",
    mean_multiple: float = 2.0,
) -> DataFrame:
    """TPC-H Q11 shape: per-part value held by one nation's suppliers,
    kept only when it exceeds ``mean_multiple`` x the nation's MEAN
    per-part value — a grouped aggregate filtered by a GLOBAL scalar
    subquery over the same aggregate (the HAVING-scalar-subquery
    optimizer shape the rest of the join battery lacked; VERDICT r10
    task #3).

    Adapted to the driver testdata (no partsupp): "stock value" is
    sum(l_extendedprice * (1 - l_discount)) of the nation's shipments
    per part — same two-level plan, different fact. The threshold is a
    multiple of the MEAN rather than Q11's fraction-of-total because a
    fixed fraction deselects everything as the part count grows (TPC-H
    itself rescales the fraction by 1/SF); the mean-relative form is
    scale-free while keeping the identical scalar-subquery plan.

    Plan: nation (1 row after the filter) broadcasts into supplier
    (bounded) which broadcasts into the lineitem scan; ONE shuffle
    aggregates per part. The scalar threshold re-aggregates the
    per-part frame (already shuffled once — the second agg is a
    single-stage rollup of the first's output, not a second pass over
    the fact) and binds as a broadcast one-row cross join.
    """
    nat = nation.filter(F.col("n_name") == nation_name).select("n_nationkey")
    supp = (
        supplier.join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select("s_suppkey")
    )
    per_part = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "__val"
            )
        )
    )
    threshold = per_part.agg(
        (F.avg("__val") * F.lit(mean_multiple)).alias("__thr")
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("__val") > F.col("__thr"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("__val", 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("partkey"))
    )


def potential_promotion_suppliers(
    tables: dict[str, DataFrame],
    name_prefix: str = "small",
    nation_name: str = "NATION_9",
    window_start: str = "1999-01-01",
    window_end: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation holding excess stock of
    parts with a given name prefix — the nested correlated semi-join
    chain (supplier IN (... part IN (...) AND qty > correlated scalar
    ...)) the join battery lacked (VERDICT r10 task #3).

    Adapted to the driver testdata (no partsupp.availqty): the "stock"
    of a (part, supplier) pair is the quantity it shipped BEFORE the
    promotion window (the supply-catalog proxy), and the correlated
    scalar is Q20's 0.5 * sum(l_quantity) inside the window. A pair
    with no in-window shipments is excluded, exactly like Q20's
    sum-over-empty NULL comparison.

    Plan: the part-name filter broadcasts as a semi join into the
    pre-window catalog aggregate; both grouped aggregates shuffle on
    the SAME (partkey, suppkey) key so AQE plans their join without a
    third exchange; the surviving pair set (tiny) broadcasts into the
    supplier semi join, and nation (1 row) broadcasts last.
    """
    li = tables["lineitem"].select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    wanted_parts = (
        tables["part"]
        .filter(F.col("p_name").startswith(name_prefix))
        .select("p_partkey")
    )
    start = F.lit(window_start).cast("timestamp")
    end = F.lit(window_end).cast("timestamp")
    catalog = (
        li.filter(F.col("l_shipdate") < start)
        .join(
            F.broadcast(wanted_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("avail_qty"))
    )
    shipped = (
        li.filter((F.col("l_shipdate") >= start) & (F.col("l_shipdate") < end))
        .groupBy(
            F.col("l_partkey").alias("w_partkey"),
            F.col("l_suppkey").alias("w_suppkey"),
        )
        .agg(F.sum("l_quantity").alias("window_qty"))
    )
    excess = (
        catalog.join(
            shipped,
            (F.col("l_partkey") == F.col("w_partkey"))
            & (F.col("l_suppkey") == F.col("w_suppkey")),
        )
        .filter(F.col("avail_qty") > F.lit(0.5) * F.col("window_qty"))
        .select("l_suppkey")
    )
    nat = tables["nation"].filter(F.col("n_name") == nation_name).select(
        "n_nationkey"
    )
    return (
        tables["supplier"]
        .join(F.broadcast(excess), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )
