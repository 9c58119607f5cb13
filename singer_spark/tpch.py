"""Adapted TPC-H query suite over the TESTDATA tables.

The reference engine has no relational operators (SURVEY.md §2.7); this
module exercises the full join/aggregate/subquery surface Catalyst provides,
shaped after the classic TPC-H queries but adapted to the simplified
TESTDATA schema (no partsupp; no l_commitdate/l_receiptdate/l_shipmode; no
c_phone) — date-lag predicates substitute for commit/receipt semantics.

Scale notes (100 TB target):
- nation/region are constant-size: always broadcast.
- part/supplier/customer grow with SF: broadcast only *filtered* subsets
  that stay bounded (a 1/25 brand slice, a single-quarter revenue table);
  otherwise rely on shuffle joins + AQE.
- every filter is applied before its join so it reaches the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from singer_spark.functions import qround


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier per part).  No partsupp table:
    the observed unit cost min(l_extendedprice / l_quantity) per
    (part, supplier) stands in for ps_supplycost.  Region-filtered suppliers
    (ASIA), PROMO parts; per part keep the cheapest supplier (ties → lowest
    suppkey) via a window over the small per-(part,supp) cost table —
    lineitem is reduced by partial aggregation BEFORE any join, and the
    supplier⋈nation⋈region dimension chain is broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = (supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
          .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    costs = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    scoped = (costs.join(F.broadcast(part), costs.l_partkey == part.p_partkey)
              .join(sn, costs.l_suppkey == sn.s_suppkey))
    w = Window.partitionBy("l_partkey").orderBy(F.col("unit_cost").asc(), F.col("s_suppkey").asc())
    return (
        scoped.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal"), "s_name", "n_name",
            F.col("l_partkey").alias("p_partkey"), "p_brand",
            qround(F.col("unit_cost"), 4).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey"))
        .limit(100)
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification).  partsupp value is
    adapted to shipped value: per part, sum(l_extendedprice) over lineitems
    whose supplier sits in NATION_1; keep parts above 0.1% of the nation's
    total.  The scalar total is a 1-row broadcast; the supplier set is a
    broadcast semi-join reaching the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat_supp = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey) \
                   .select("s_suppkey")
    scoped = li.join(F.broadcast(nat_supp), li.l_suppkey == nat_supp.s_suppkey, "left_semi")
    per_part = scoped.groupBy("l_partkey").agg(F.sum("l_extendedprice").alias("value"))
    total = per_part.agg(F.sum("value").alias("grand_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("grand_total") * 0.001)
        .select(F.col("l_partkey").alias("p_partkey"), F.round(F.col("value"), 2).alias("value"))
        .orderBy(F.col("value").desc(), F.col("p_partkey"))
    )


def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship).  The part↔supplier
    relation comes from lineitem pairs; the excluded-supplier subquery
    (complaints in the original) is adapted to s_acctbal < 0.  Distinct
    (part, supp) pairs reduce lineitem first; the exclusion list is a
    broadcast anti-join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_size") <= 25)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion).  availqty is adapted to a
    dominance test on 1996 shipments: a supplier qualifies if, for some
    'red' part, it shipped more than half that part's total 1996 quantity.
    Both aggregates partial-combine map-side; the per-part total joins the
    per-(part,supp) table on the already-shuffled part key."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    scoped = li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
    per_ps = scoped.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("supp_qty"))
    per_part = per_ps.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    dominant = (per_ps.join(per_part, "l_partkey")
                .filter(F.col("supp_qty") > F.col("part_qty") * 0.5)
                .select("l_suppkey").distinct())
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi join). Late-line predicate adapted:
    l_shipdate > o_orderdate + 30 days stands in for commitdate<receiptdate."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01")) & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; all three predicates push to the
    parquet reader, the shuffle carries a single partial sum."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair volume. nation is constant-size →
    broadcast twice; fact join stays shuffle-free on the dimension side."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = _t(spark, sf_dir, "nation")
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation.filter(F.col("n_name").isin(n1, n2))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation.filter(F.col("n_name").isin(n1, n2))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("supp_nation", "cust_nation", F.col("l_year").cast("bigint").alias("l_year"), "revenue")
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of PROMO-part volume sold to ASIA
    customers, per year. Conditional aggregation over a snowflake join."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    sup_nation = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup_nation), li.l_suppkey == sup_nation.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .select(F.col("o_year").cast("bigint").alias("o_year"), "mkt_share")
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, year). No partsupp table →
    cost adapted to 0.5 * p_retailprice * l_quantity. Part filter ('red'
    parts) is a bounded slice → broadcast."""
    nation = _t(spark, sf_dir, "nation")
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .select("nation", F.col("o_year").cast("bigint").alias("o_year"), "sum_profit")
        .orderBy("nation", F.col("o_year").desc())
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one quarter.
    customer scales with SF → shuffle join (AQE may still broadcast at small
    SF); nation broadcast."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode → grouped by o_orderpriority):
    conditional counts of lines shipped >60 days after order date."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late = (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast("bigint")
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), F.sum(late).alias("n_late"))
        .orderBy("o_orderpriority")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, left outer join
    keeps 0-order customers. Two aggregations, second one tiny."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage-of-total conditional aggregate over one month."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("promo_revenue")
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue.  The max is a
    1-row aggregate broadcast back onto the per-supplier frame (the
    engine's scalar-broadcast shape) — NOT a global window: the revenue
    CTE is one row PER SUPPLIER, and `max().over(Window.partitionBy())`
    would funnel all of them through a single WindowExec task (caught by
    plan_audit's n_global_window counter, r11)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    best = revenue.crossJoin(F.broadcast(mx))
    sup = _t(spark, sf_dir, "supplier")
    return (
        best.filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue"))
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: avg yearly revenue from small-quantity orders of one brand.
    The per-part average is computed over *all* lineitems of the part
    (correlated scalar subquery → pre-aggregated join), brand slice broadcast."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_limit"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 250 (group-having over
    the fact table, then join back to orders+customer)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicates — Catalyst pushes
    the common join key and evaluates the OR post-join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no receipt/commit dates → shipdate): suppliers who
    were the *sole latest* shipper on multi-supplier 'F' orders. The
    EXISTS/NOT-EXISTS pair becomes two window aggregates over one shuffle."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").join(
        orders, F.col("l_orderkey") == orders.o_orderkey, "left_semi"
    ).select("l_orderkey", "l_suppkey", "l_shipdate")
    w = Window.partitionBy("l_orderkey")
    annotated = li.withColumn("max_ship", F.max("l_shipdate").over(w)).withColumn(
        "n_supps", F.size(F.collect_set("l_suppkey").over(w))
    )
    latest = annotated.filter(
        (F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supps") > 1)
    )
    sole = (
        latest.groupBy("l_orderkey")
        .agg(F.collect_set("l_suppkey").alias("latest_supps"))
        .filter(F.size("latest_supps") == 1)
        .select("l_orderkey", F.element_at("latest_supps", 1).alias("suppkey"))
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        sole.join(F.broadcast(sup), sole.suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no c_phone → grouped by market segment): customers
    with above-average positive balance and no *recent* orders — scalar
    subquery (broadcast as a 1-row cross join) + anti join. The recent-order
    filter pushes to the orders scan before the anti join."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )
