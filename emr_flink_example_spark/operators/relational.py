"""Relational operator surface (SURVEY.md §2 Part B).

The reference implements no joins/aggregations/windows (it is an ingestion
pipeline — verified in SURVEY.md §2), so this module exposes the standard
relational categories through Spark built-ins: every query is a declarative
DataFrame/SQL plan, leaving join-strategy choice, partial aggregation,
predicate pushdown and column pruning to Catalyst + AQE.

Scale notes (100 TB posture):
  * fixed-size dims (region 5 rows, nation 25 rows) are explicitly
    `broadcast()` — no shuffle regardless of fact-side size;
  * fact-fact joins (orders⋈lineitem) rely on sort-merge + AQE skew handling;
  * per-group top-k uses rank-over-window + filter, which Spark rewrites to
    per-partition top-k (WindowGroupLimit) — no global sort;
  * global top-k (`orderBy().limit()`) is executed as TakeOrderedAndProject —
    no full sort/shuffle of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import portable_hash_sql_duckdb
from ..io import load


def _r2(c):  # money-ish sums: 2 decimals on both engines
    return F.round(c, 2)


def _r4(c):  # averages/ratios: 4 decimals
    return F.round(c, 4)


# ---------------------------------------------------------------------------
# Scans, filters, projections
# ---------------------------------------------------------------------------


def q_filter_pushdown(spark: SparkSession, sf: str) -> DataFrame:
    """Predicates =, BETWEEN, IN, LIKE, AND — all pushed into the parquet scan."""
    part = load(spark, sf, "part")
    return (
        part.where(
            (F.col("p_size").between(10, 20))
            & (F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
            & (F.col("p_name").like("%a%"))
        )
        .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
    )


def q_projection_compute(spark: SparkSession, sf: str) -> DataFrame:
    """Computed columns / rename (≙ A4/A6: derived cols + DATE_FORMAT projections)."""
    orders = load(spark, sf, "orders")
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("logday"),
        _r2(F.col("o_totalprice") * (1 - 0.04)).alias("net_price"),
        F.upper("o_orderstatus").alias("status_uc"),
    )


def q_json_extract_props(spark: SparkSession, sf: str) -> DataFrame:
    """JSON field extraction (≙ A2/A3 json parsing) — get_json_object, JVM-side."""
    events = load(spark, sf, "events")
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("n_events"),
            _r2(F.sum("value")).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


def q_join_inner(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            _r2(F.sum("o_totalprice")).alias("segment_revenue"),
        )
    )


def q_join_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer with null-preserving agg — customers with zero orders kept."""
    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


def q_join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer join of two per-nation aggregates."""
    cust = (
        load(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


def q_join_right_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Right outer: every customer kept even with zero orders; order-side
    aggregates null-tolerant."""
    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "right")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            _r2(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("segment_revenue"),
        )
    )


def q_join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi: customers that have at least one urgent order."""
    customer = load(spark, sf, "customer")
    urgent = load(spark, sf, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def q_join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti: customers with no orders at all."""
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_join_theta(spark: SparkSession, sf: str) -> DataFrame:
    """Non-equi (theta) join: ordered nation pairs within the same region.

    Equi part (n_regionkey) hash-joins; the `<` residual filters — tiny dims,
    broadcast on both sides.
    """
    n1 = F.broadcast(load(spark, sf, "nation")).alias("n1")
    n2 = F.broadcast(load(spark, sf, "nation")).alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .select(
            F.col("n1.n_regionkey").alias("regionkey"),
            F.col("n1.n_name").alias("nation_a"),
            F.col("n2.n_name").alias("nation_b"),
        )
    )


def q_join_multiway_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: 3-way join + agg + top-10."""
    customer = load(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders").where(F.col("o_orderdate") < "1998-01-01")
    lineitem = load(spark, sf, "lineitem").where(F.col("l_shipdate") > "1998-01-01")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_join_regional_revenue_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5-style: 6-way join; revenue per region/nation where the
    supplier and customer share a nation. Dims broadcast; facts sort-merge."""
    region = F.broadcast(load(spark, sf, "region"))
    nation = F.broadcast(load(spark, sf, "nation"))
    customer = load(spark, sf, "customer")
    supplier = load(spark, sf, "supplier")
    orders = load(spark, sf, "orders")
    lineitem = load(spark, sf, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


def q_top_customers_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10-style: returned-item revenue per customer over one year —
    fact-fact join with a date-window pushdown on orders and the returnflag
    pushdown on lineitem, nation broadcast, then a customer rollup and a
    top-20 TakeOrderedAndProject (never a global sort). Ties break on
    c_custkey so the LIMIT boundary is deterministic in both engines."""
    nation = F.broadcast(load(spark, sf, "nation"))
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1999-01-01") & (F.col("o_orderdate") < "2000-01-01")
    )
    lineitem = load(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation_name"))
        .agg(
            _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_large_orders_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18-style: large-volume customers — the aggregate-then-semi-
    join pattern (HAVING subquery): per-order quantity totals filtered
    above a threshold, joined back to orders + customer, top-100 by order
    value. The order-key aggregate is combine-friendly (map-side partial
    sums), the qualifying-key set is a tiny fraction of orders so the
    join back prunes the fact scan, and the top-100 is a
    TakeOrderedAndProject with an o_orderkey tie-break."""
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    lineitem = load(spark, sf, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            _r2(F.col("sum_qty")).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q_order_priority_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4-style order-priority checking: count orders per priority
    that have at least one late lineitem (shipped >90 days after the order
    date — the fixture has no commit/receipt dates, so lateness is restated
    against o_orderdate). The EXISTS becomes a LEFT SEMI join with a
    non-equi residual: the quarter window pushes into the orders scan, the
    semi join deduplicates order keys without materializing match
    multiplicity, and the final groupBy is 5 groups — combine-friendly."""
    orders = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1999-01-01") & (F.col("o_orderdate") < "1999-04-01")
    )
    lineitem = load(spark, sf, "lineitem")
    late = orders.join(
        lineitem,
        (orders.o_orderkey == lineitem.l_orderkey)
        & (lineitem.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_volume_shipping_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7-style volume shipping between two nations: revenue per
    (supplier nation, customer nation, ship year) for the NATION_3/NATION_7
    pair in either direction. Both nation dims are pre-filtered to the two
    names BEFORE joining (so the broadcast hash joins also act as
    semi-filters on the fact stream); the cross-pair OR residual only has
    to exclude the two same-nation combinations that survive."""
    pair = ("NATION_3", "NATION_7")
    n1 = F.broadcast(
        load(spark, sf, "nation")
        .where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        load(spark, sf, "nation")
        .where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    )
    supplier = load(spark, sf, "supplier")
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    lineitem = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1999-01-01") & (F.col("l_shipdate") < "2001-01-01")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(n1, supplier.s_nationkey == F.col("s_nkey"))
        .join(n2, customer.c_nationkey == F.col("c_nkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_market_share_q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8-style national market share: NATION_5 suppliers' share of
    PROMO-part revenue sold into ASIA customers, per order year. The share
    is a conditional-sum ratio inside one aggregate pass; supplier-nation
    attribution joins nation a second time (aliased), all dims broadcast,
    and only the two fact tables shuffle."""
    region = F.broadcast(load(spark, sf, "region").where(F.col("r_name") == "ASIA"))
    n_cust = F.broadcast(
        load(spark, sf, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
        )
    )
    n_supp = F.broadcast(
        load(spark, sf, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    part = F.broadcast(load(spark, sf, "part").where(F.col("p_type") == "PROMO"))
    supplier = load(spark, sf, "supplier")
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1999-01-01") & (F.col("o_orderdate") < "2001-01-01")
    )
    lineitem = load(spark, sf, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(n_cust, customer.c_nationkey == F.col("cn_key"))
        .join(region, F.col("cn_region") == region.r_regionkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(n_supp, supplier.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _r4(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(0.0))
                / F.sum(volume)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q_customer_distribution_q13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT OUTER join
    with a predicate in the ON clause (priority filter must NOT push below
    the outer join — customers with only excluded orders count as zero),
    then a two-level aggregate: per-customer order counts, then the
    histogram of those counts. Both groupBys are combine-friendly and the
    second one runs over at most |customers| rows."""
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    counts = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return (
        counts.groupBy("order_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("order_count").desc())
    )


def q_promo_revenue_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14-style promotion effect: percentage of one month's revenue
    that came from PROMO-type parts — a conditional-sum ratio in a single
    aggregate pass over the month's lineitems, part dim broadcast."""
    part = F.broadcast(load(spark, sf, "part"))
    lineitem = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1999-09-01") & (F.col("l_shipdate") < "1999-10-01")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .agg(
            _r4(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", volume).otherwise(0.0))
                / F.sum(volume)
            ).alias("promo_revenue_pct")
        )
    )


def q_top_supplier_q15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15-style top supplier: per-supplier revenue over a quarter,
    then the supplier(s) whose revenue equals the global maximum. Revenue
    is rounded to cents BEFORE the max comparison so the equality is exact
    in both engines. The scalar max rides a one-row broadcast cross join —
    no second scan of the fact table, no collect."""
    supplier = load(spark, sf, "supplier")
    lineitem = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1999-01-01") & (F.col("l_shipdate") < "1999-04-01")
    )
    revenue = lineitem.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, F.col("supplier_no") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_small_qty_revenue_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: yearly revenue lost if
    Brand#11 orders below 20% of that part's average quantity were not
    taken. The correlated AVG subquery becomes an aggregate + self-join on
    the brand-filtered slice; the threshold test is restated in INTEGER
    arithmetic (qty < 0.2*avg  ⟺  5*qty*cnt < sum, quantities are
    integral) so the boundary is bit-exact in both engines. The per-part
    stats frame is tiny (one brand) and broadcast."""
    part = F.broadcast(
        load(spark, sf, "part").where(F.col("p_brand") == "Brand#11").select("p_partkey")
    )
    lineitem = load(spark, sf, "lineitem")
    li_p = (
        lineitem.join(part, lineitem.l_partkey == F.col("p_partkey"))
        .select(
            "p_partkey",
            F.col("l_quantity").cast("bigint").alias("qty"),
            "l_extendedprice",
        )
    )
    stats = li_p.groupBy("p_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("cnt")
    )
    return (
        li_p.join(F.broadcast(stats), "p_partkey")
        .where(F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty"))
        .agg(_r2(F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


def q_global_sales_q22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22-style dormant high-balance customers: per market segment,
    customers whose balance exceeds the positive-balance average and who
    placed no order since 2001-06-01. The scalar-average filter is restated
    in INTEGER CENTS (bal > avg ⟺ cents*n > sum_cents — balances are
    exact cents in the fixture) riding a one-row broadcast cross join; the
    "no recent orders" EXISTS becomes a LEFT ANTI join against the
    date-pruned orders scan."""
    customer = load(spark, sf, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    pos = customer.where(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("sum_cents"), F.count("*").alias("n_pos")
    )
    recent = (
        load(spark, sf, "orders")
        .where(F.col("o_orderdate") >= "2001-06-01")
        .select("o_custkey")
    )
    return (
        customer.crossJoin(F.broadcast(pos))
        .where(cents * F.col("n_pos") > F.col("sum_cents"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            _r2(F.sum("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q_min_cost_supplier_q2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier (restated: the fixture has no
    partsupp table, so a supplier's "cost" for a part is its observed
    average unit sell price over lineitem — computed in exact integer
    cents with ONE double division sum(cents)/sum(qty)/100, which is
    bit-identical across engines because both operands are exact
    integers). For STANDARD parts with size < 10, return the EUROPE
    supplier(s) whose cost equals the per-part minimum. The correlated
    MIN subquery becomes a groupBy-min + equality join on the rounded
    cost (the Q15 pattern); supplier⋈nation⋈region is a tiny frame and
    broadcast, so only lineitem shuffles (once, to the (part, supplier)
    grain)."""
    part = F.broadcast(
        load(spark, sf, "part")
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") < 10))
        .select("p_partkey", "p_name")
    )
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    supp = F.broadcast(
        load(spark, sf, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load(spark, sf, "lineitem")
    ec = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    cost = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            _r2(
                F.sum(ec) / F.sum(F.col("l_quantity").cast("bigint")) / F.lit(100.0)
            ).alias("cost")
        )
    )
    min_cost = cost.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        cost.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("mk")) & (F.col("cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey").asc(), F.col("s_name").asc())
        .limit(100)
    )


def q_product_profit_q9(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9-style product-type profit (restated: no partsupp, so
    supply cost is modeled as 60% of the part's retail price — a
    deterministic column function). Profit per (supplier nation, order
    year) over parts whose name contains 'red': sum(volume −
    0.6·p_retailprice·qty). Part and nation dims broadcast; the two fact
    tables join on orderkey once."""
    part = F.broadcast(
        load(spark, sf, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    nation = F.broadcast(
        load(spark, sf, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    )
    supplier = load(spark, sf, "supplier")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(_r2(F.sum(profit)).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


def q_important_value_q11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11-style important parts (restated: no partsupp, so a
    part's "stock value" held by ASIA suppliers is its discounted
    lineitem revenue, and the fixed 1%-of-total fraction — which no part
    reaches once the slice grows — becomes the scale-free "more than 2×
    the mean part value", mirroring Q11's intent of flagging
    disproportionately valuable parts at any SF). The scalar-subquery
    threshold is an EXACT integer comparison: volume in 1e-4 dollars is
    cents(extprice)·(100−cents(discount)) — both integers — so
    value·n_parts > 2·total is free of float-boundary flutter across
    engines. The one-row stats frame rides a broadcast cross join (no
    second scan: both aggregates reuse the same (part)-grain frame)."""
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").where(F.col("r_name") == "ASIA")
    supp = F.broadcast(
        load(spark, sf, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    li = load(spark, sf, "lineitem")
    ec = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    dc = F.round(F.col("l_discount") * 100, 0).cast("bigint")
    vol_e4 = ec * (F.lit(100) - dc)
    per_part = (
        li.join(supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(vol_e4).alias("value_e4"))
    )
    stats = per_part.agg(
        F.sum("value_e4").alias("total_e4"), F.count("*").alias("n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(stats))
        .where(F.col("value_e4") * F.col("n_parts") > 2 * F.col("total_e4"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            _r2(F.col("value_e4") / F.lit(10000.0)).alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("p_partkey").asc())
    )


def q_late_lines_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12-style shipping-priority check (restated: the fixture has
    no l_shipmode/commitdate, so the grouping key is l_linestatus and
    "late" means shipped more than 60 days after the order date). For
    1999 shipments, count critical-priority (1-URGENT/2-HIGH) vs other
    orders per line status. One orderkey join, 2-3 result groups,
    combine-friendly conditional counts."""
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1999-01-01") & (F.col("l_shipdate") < "2000-01-01")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q_supplier_cnt_q16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16-style parts/supplier relationship (restated: the
    part-supplier relation is the DISTINCT (l_partkey, l_suppkey) pairs
    observed in lineitem, and the excluded-supplier complaint filter is
    restated as a negative account balance). Distinct supplier count per
    (brand, type, size) for non-Brand#11, non-PROMO parts in a size
    list; the NOT IN becomes a LEFT ANTI against a tiny broadcast frame.
    The distinct pair projection collapses lineitem once on exactly the
    columns needed — no wider shuffle."""
    bad_supp = F.broadcast(
        load(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    part = F.broadcast(
        load(spark, sf, "part").where(
            (F.col("p_brand") != "Brand#11")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
    )
    pairs = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(bad_supp, pairs.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


def q_brand_qty_revenue_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19-style discounted revenue under a disjunction of three
    brand/quantity/size conjunctions (restated: the fixture has no
    shipmode/container, so each arm predicates on brand + quantity band +
    size band). The OR-of-ANDs is left whole for Catalyst: common
    sub-predicates are extracted and pushed to both scans, the rest is a
    join residual over the broadcast part dim. One row out."""
    part = F.broadcast(
        load(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    )
    li = load(spark, sf, "lineitem")
    qty = F.col("l_quantity")
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & qty.between(1, 11)
        & F.col("p_size").between(1, 5)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#21")
        & qty.between(10, 20)
        & F.col("p_size").between(1, 10)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3")
        & qty.between(20, 30)
        & F.col("p_size").between(1, 15)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(arm1 | arm2 | arm3)
        .agg(
            _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


def q_promotion_suppliers_q20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20-style promotion-candidate suppliers (restated: no
    partsupp availability, so a supplier qualifies when some 'small…'
    part it shipped during 1999 exceeded 50 total units). The nested
    IN-subqueries become: broadcast part filter → (supplier, part)
    aggregate → HAVING → DISTINCT supplier keys → LEFT SEMI into the
    EUROPE supplier dim. Quantities are integral, so the >50 threshold
    compares exact BIGINTs."""
    part = F.broadcast(
        load(spark, sf, "part").where(F.col("p_name").like("small%")).select("p_partkey")
    )
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1999-01-01") & (F.col("l_shipdate") < "2000-01-01")
    )
    qualifying = (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .where(F.col("sum_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    supp = (
        load(spark, sf, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q_waiting_supplier_q21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21-style suppliers who kept orders waiting (restated: no
    commit/receipt dates, so "late" is shipped more than 60 days after
    the order date). For completed ('F') orders: suppliers with a late
    line in a multi-supplier order where EXISTS another supplier's line
    (semi join with a suppkey-inequality residual) and NOT EXISTS another
    supplier's LATE line (anti join, same residual). Both self-joins
    shuffle on orderkey only; the supplier dim resolves names via
    broadcast at the end."""
    orders = (
        load(spark, sf, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    base = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    supplier = F.broadcast(load(spark, sf, "supplier").select("s_suppkey", "s_name"))
    return (
        base.join(supplier, base.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


def q_pricing_summary_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1: the flagship aggregate — partial+final HashAggregate,
    map-side combine, 6 aggregates over 2 grouping keys."""
    lineitem = load(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= "2001-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r2(F.sum(disc_price)).alias("sum_disc_price"),
            _r2(F.sum(charge)).alias("sum_charge"),
            _r4(F.avg("l_quantity")).alias("avg_qty"),
            _r4(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_forecast_revenue_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: selective filter + single global aggregate (scan-heavy)."""
    lineitem = load(spark, sf, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(_r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


def q_agg_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-column exact distinct counts per group.

    Plan: Spark's canonical multi-count-distinct — one Expand (gid per
    distinct aggregate) into a two-phase HashAggregate with a SINGLE
    exchange on the group key; both distinct columns and the plain count
    ride the same shuffle.

    Bench note (r6, VERDICT r5 item 4): the r2->r5 "regression"
    (0.44 s -> 0.84 s at sf0.1) is harness-level, not plan-level —
    re-measured 2026-08-14 in one session: 5 adjacent noop-sink runs spread
    0.57-1.40 s with an unchanged plan (verified via explain("formatted"):
    same Expand + single hashpartitioning exchange as r2). At 150k input
    rows the runtime is dominated by fixed task-scheduling overhead on
    local[32], which swings with ambient load; there is nothing plan-shaped
    to fix."""
    orders = load(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_distinct_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


def q_agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL++ approximate distinct — sketch-based, no exact-distinct shuffle.

    Oracle-checkable via the sketch_kmv_distinct pattern (textstats.py):
    DuckDB's approx_count_distinct is a different sketch, so the raw HLL
    estimate can never hash-match — instead the result carries the exact
    counts plus booleans asserting the estimate landed within a relative
    error bound (rsd=0.02, checked at 5%), and the oracle computes the same
    exact counts and claims TRUE. If Spark's estimate ever drifted outside
    the bound, the boolean flips and the driver's hash catches it — a real
    differential check on the sketch's accuracy contract, where round 1
    recorded rows-only.
    """
    lineitem = load(spark, sf, "lineitem")
    est_parts = F.approx_count_distinct("l_partkey", 0.02)
    est_orders = F.approx_count_distinct("l_orderkey", 0.02)
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        (F.abs(est_parts / F.countDistinct("l_partkey") - 1) <= 0.05).alias(
            "parts_est_within_5pct"
        ),
        (F.abs(est_orders / F.countDistinct("l_orderkey") - 1) <= 0.05).alias(
            "orders_est_within_5pct"
        ),
    )


def q_agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    """min/max/avg/stddev/percentile in one grouped pass."""
    orders = load(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        _r2(F.min("o_totalprice")).alias("min_price"),
        _r2(F.max("o_totalprice")).alias("max_price"),
        _r4(F.avg("o_totalprice")).alias("avg_price"),
        _r4(F.stddev_samp("o_totalprice")).alias("std_price"),
        _r2(F.expr("percentile(o_totalprice, 0.5)")).alias("median_price"),
        F.count("*").alias("n_orders"),
    )


def q_agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        _r2(F.sum("o_totalprice")).alias("total"),
        # grouping() flags disambiguate subtotal rows from genuine NULL keys
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


def q_agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    lineitem = load(spark, sf, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), _r2(F.sum("l_quantity")).alias("sum_qty"))
    )


def q_agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_agg_having(spark: SparkSession, sf: str) -> DataFrame:
    lineitem = load(spark, sf, "lineitem")
    return (
        lineitem.groupBy("l_partkey")
        .agg(F.count("*").alias("n_lines"), _r2(F.sum("l_quantity")).alias("sum_qty"))
        .where(F.col("n_lines") >= 40)
    )


def q_conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    """CASE WHEN inside aggregates (manual pivot)."""
    events = load(spark, sf, "events")
    is_type = lambda t: F.when(F.col("event_type") == t, F.col("value"))  # noqa: E731
    return events.groupBy("user_id").agg(
        _r2(F.sum(is_type("click"))).alias("click_value"),
        _r2(F.sum(is_type("purchase"))).alias("purchase_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.count("*").alias("n_events"),
    )


def q_pivot_event_type(spark: SparkSession, sf: str) -> DataFrame:
    """Relational pivot (wide layout) — explicit value list keeps a single pass."""
    events = load(spark, sf, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types]
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


def q_window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 orders per customer — rank-over-window + filter; Spark plans a
    WindowGroupLimit (per-partition top-k), not a global sort."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", _r2(F.col("o_totalprice")).alias("o_totalprice"), "rk")
    )


def q_window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Running revenue per customer (ROWS UNBOUNDED PRECEDING frame)."""
    orders = load(spark, sf, "orders")
    w_order = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_frame = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _r2(F.sum("o_totalprice").over(w_frame)).alias("running_total"),
        F.row_number().over(w_order).alias("order_seq"),
    )


def q_window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame (value-based, peers included): per priority, how many
    orders fall within $1000 below each order's price."""
    orders = load(spark, sf, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").asc())
        .rangeBetween(-1000, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        _r2(F.col("o_totalprice")).alias("o_totalprice"),
        F.count("*").over(w).alias("n_within_1000"),
        _r2(F.sum("o_totalprice").over(w)).alias("sum_within_1000"),
    )


def q_unpivot_stack(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (wide -> long) via the stack generator: per-status priority
    counts melted into (o_orderstatus, priority_class, n) rows."""
    orders = load(spark, sf, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("urgent"),
        F.sum(F.when(F.col("o_orderpriority") == "2-HIGH", 1).otherwise(0)).alias("high"),
        F.sum(
            F.when(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
        ).alias("other"),
    )
    return wide.select(
        "o_orderstatus",
        F.expr("stack(3, 'urgent', urgent, 'high', high, 'other', other)").alias(
            "priority_class", "n"
        ),
    )


def q_window_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    """lag/lead analytics: per-user inter-event gap in seconds."""
    events = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    return events.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("ts_epoch"),
        (
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.unix_timestamp(prev_ts.cast("timestamp"))
        ).alias("gap_seconds"),
        F.lead("event_type").over(w).alias("next_type"),
    )


def q_window_rank_dense_ntile(spark: SparkSession, sf: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank over a global ordering."""
    customer = load(spark, sf, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return customer.select(
        "c_custkey",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        _r4(F.percent_rank().over(w)).alias("pct_rank"),
        _r4(F.cume_dist().over(w)).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------


def q_global_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-100 — TakeOrderedAndProject (heap per partition + merge),
    never a full sort of the fact table."""
    orders = load(spark, sf, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", _r2(F.col("o_totalprice")).alias("o_totalprice"))
    )


def q_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over nation-key sets, tagged and unioned."""
    cust_n = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_n = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cust_n.intersect(supp_n).withColumn("set_op", F.lit("intersect"))
    only_cust = cust_n.exceptAll(supp_n).withColumn("set_op", F.lit("except"))
    all_keys = cust_n.union(supp_n).distinct().withColumn("set_op", F.lit("union"))
    return both.unionByName(only_cust).unionByName(all_keys)


# ---------------------------------------------------------------------------
# Scalar function gallery
# ---------------------------------------------------------------------------


def q_scalar_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    part = load(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_uc"),
        F.lower("p_brand").alias("brand_lc"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.ltrim(F.rtrim("p_type")).alias("type_trim"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devowel"),
        F.split("p_type", " ").getItem(0).alias("type_first_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


def q_scalar_date_funcs(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yy"),
        F.month("o_orderdate").alias("mm"),
        F.dayofmonth("o_orderdate").alias("dd"),
        F.quarter("o_orderdate").alias("qq"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
    )


def q_scalar_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    lineitem = load(spark, sf, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_v"),
        F.ceil("l_quantity").alias("ceil_q"),
        F.floor("l_quantity").alias("floor_q"),
        _r4(F.sqrt("l_extendedprice")).alias("sqrt_p"),
        _r4(F.ln(F.col("l_extendedprice") + 1)).alias("ln_p"),
        _r4(F.pow(F.col("l_tax") + 1, 2)).alias("pow_tax"),
        (F.col("l_partkey") % 7).alias("mod_7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


def q_scalar_array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Array + map higher-order surface: build token arrays, then size /
    distinct / contains / sort / slice / join, plus map construction and
    key extraction — all JVM-side (no Python UDF)."""
    from .textstats import TOKENS

    docs = load(spark, sf, "documents").withColumn("tokens", F.expr(TOKENS))
    meta = F.create_map(
        F.lit("chars"),
        F.length("text").cast("bigint"),
        F.lit("words"),
        F.size("tokens").cast("bigint"),
    )
    return docs.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_uniq"),
        F.array_contains("tokens", "the").alias("has_the"),
        F.when(
            F.size("tokens") > 0, F.element_at(F.sort_array(F.array_distinct("tokens")), 1)
        ).alias("first_token_sorted"),
        F.array_join(F.slice(F.sort_array("tokens"), 1, 3), ",").alias("top3_sorted"),
        F.element_at(meta, "words").alias("map_words"),
    )


def q_json_variant_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: parse_json into
    a variant, typed variant_get extraction, grouped rollup. VARIANT keeps
    the parsed tree in a binary columnar form, so repeated path accesses skip
    re-parsing the JSON text — the modern path for schema-on-read columns
    (the A2/A3 json surface, minus a fixed schema)."""
    events = load(spark, sf, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        events.select(k.alias("k"), "value")
        .groupBy(F.pmod(F.col("k"), F.lit(7)).alias("k_mod7"))
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("k").alias("n_distinct_k"),
            _r2(F.sum("value")).alias("sum_value"),
        )
    )


def q_scalar_map_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Map-function surface: build a per-user event_type -> count map from an
    aggregate (map_from_entries over a sorted entry list), then interrogate
    it with size / map_keys / map_values+aggregate / map_contains_key /
    map_filter / try_element_at — all JVM-side builtins. try_element_at, not
    element_at: Spark 4 runs ANSI mode, where element_at on a missing key
    throws instead of returning NULL."""
    events = load(spark, sf, "events")
    # a NULL event_type cannot be a map key (ANSI NULL_MAP_KEY) — such
    # rows are excluded in both engines
    per_type = (
        events.where(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    m = F.map_from_entries(F.sort_array(F.collect_list(F.struct("event_type", "cnt"))))
    per_user = per_type.groupBy("user_id").agg(m.alias("m"))
    return per_user.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.array_join(F.map_keys("m"), ",").alias("types_sorted"),
        F.aggregate(F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "total_events"
        ),
        F.map_contains_key("m", "purchase").alias("has_purchase"),
        F.size(F.map_filter("m", lambda k, v: v >= 3)).alias("n_hot_types"),
        F.try_element_at("m", F.lit("purchase")).alias("purchase_cnt"),
    )


N_SALTS = 16


def q_agg_two_phase_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase (salted) aggregation for skewed keys: phase 1 aggregates
    (key, salt) so a hot key's rows spread over N_SALTS reducers; phase 2
    merges the partials per key. Result is identical to a direct groupBy —
    the point is the shuffle shape: no single reducer ever receives a hot
    key's full row set. (Spark's partial aggregation covers this for
    algebraic aggs; the explicit pattern is for when map-side combine can't
    help — high-cardinality-input aggs like collect/distinct merges.)"""
    lineitem = load(spark, sf, "lineitem")
    salted = lineitem.withColumn(
        "salt", F.pmod(F.col("l_orderkey") * 31 + F.col("l_linenumber"), F.lit(N_SALTS))
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.sum("l_quantity").alias("p_qty"),
        F.count("*").alias("p_cnt"),
        F.max("l_extendedprice").alias("p_max_price"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            _r2(F.sum("p_qty")).alias("sum_qty"),
            F.sum("p_cnt").alias("n_rows"),
            _r2(F.max("p_max_price")).alias("max_price"),
        )
    )


def q_agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact continuous percentiles (quartiles) per group — a full-sort-per-
    group aggregate; at scale prefer approx_percentile (t-digest sketch,
    map-side combinable) at a declared error bound."""
    orders = load(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        _r4(F.expr("percentile(o_totalprice, 0.25)")).alias("p25"),
        _r4(F.expr("percentile(o_totalprice, 0.5)")).alias("p50"),
        _r4(F.expr("percentile(o_totalprice, 0.75)")).alias("p75"),
        F.count("*").alias("n_orders"),
    )


def q_window_first_last_nth(spark: SparkSession, sf: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit full-partition
    frame. The (o_orderdate, o_orderkey) ordering is a deterministic total
    order — last_value over the default frame (up to CURRENT ROW) would just
    echo the current row, so the frame is widened to the whole partition."""
    orders = load(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


def q_agg_corr_covar(spark: SparkSession, sf: str) -> DataFrame:
    """Bivariate aggregates: Pearson correlation and sample/population
    covariance of quantity vs extended price per return flag."""
    lineitem = load(spark, sf, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        _r4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        _r4(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar_s"),
        _r4(F.covar_pop("l_quantity", "l_extendedprice")).alias("covar_p"),
        F.count("*").alias("n_rows"),
    )


def q_agg_argmin_argmax(spark: SparkSession, sf: str) -> DataFrame:
    """Argmin/argmax aggregates: which order is each priority's cheapest /
    priciest. o_totalprice is continuous, but ties are still broken
    deterministically by taking min(orderkey) among the extreme rows, so the
    result is well-defined in both engines."""
    orders = load(spark, sf, "orders")
    extremes = orders.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    o = load(spark, sf, "orders")
    lo = o.join(
        F.broadcast(extremes),
        (o["o_orderpriority"] == extremes["o_orderpriority"])
        & (o["o_totalprice"] == extremes["min_price"]),
    ).groupBy(extremes["o_orderpriority"].alias("o_orderpriority")).agg(
        F.min("o_orderkey").alias("cheapest_orderkey"),
        F.min("min_price").alias("min_price"),
    )
    hi = o.join(
        F.broadcast(extremes),
        (o["o_orderpriority"] == extremes["o_orderpriority"])
        & (o["o_totalprice"] == extremes["max_price"]),
    ).groupBy(extremes["o_orderpriority"].alias("o_orderpriority")).agg(
        F.min("o_orderkey").alias("priciest_orderkey"),
        F.min("max_price").alias("max_price"),
    )
    return lo.join(hi, "o_orderpriority")


#: replication factor for the salted-join demo
JOIN_SALT_BUCKETS = 8


def q_join_skew_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Manually salted fact-fact join: lineitem rows carry a salt derived
    from a non-join column, orders rows are replicated once per salt value,
    and the join key becomes (orderkey, salt) — splitting any hot orderkey's
    rows across JOIN_SALT_BUCKETS reducers.

    The result is identical to the plain join (the oracle IS the plain
    join), which is the point: salting is a physical rewrite only. AQE's
    skew-join splitting does this automatically per-partition; the manual
    form is for key-level skew AQE can't split (a single key bigger than a
    partition) and costs a JOIN_SALT_BUCKETS-times replication of the
    smaller side — use it surgically, on the skewed keys only."""
    lineitem = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    salted_fact = lineitem.withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(JOIN_SALT_BUCKETS))
    )
    replicated = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALT_BUCKETS - 1))).alias("salt"),
    )
    return (
        salted_fact.join(
            replicated,
            (salted_fact["l_orderkey"] == replicated["o_orderkey"])
            & (salted_fact["salt"] == replicated["salt"]),
            "inner",
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            _r2(F.sum("l_extendedprice")).alias("revenue"),
        )
    )


#: equi-width histogram bucket size for o_totalprice (constant bounds keep
#: the bucket edges engine-exact; data-derived min/max edges would put rows
#: on float boundaries that Spark and DuckDB could floor differently)
HIST_BUCKET_WIDTH = 25_000


def q_histogram_equiwidth(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width histogram of order totals: one map-side bucket assignment
    (floor division by a constant) + one groupBy — the distributed histogram
    shape; never a sort."""
    orders = load(spark, sf, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / HIST_BUCKET_WIDTH).alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            _r2(F.min("o_totalprice")).alias("bucket_min"),
            _r2(F.max("o_totalprice")).alias("bucket_max"),
        )
    )


HIST_EQD_K = 20  # equi-depth bucket count


def q_histogram_equidepth(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of order totals: 20 buckets of
    ~N/20 orders each, with per-bucket min/max — the optimizer-statistics
    histogram shape (selectivity estimation wants equal-mass buckets, not
    equal-width ones).

    Scale shape: a naive NTILE would sort ALL rows through one unpartitioned
    window. Instead the exact global position decomposes as
    pos = |{rows with smaller value}| + rank within the tie group:
    (1) groupBy value -> per-value counts (bounded by |distinct values|,
    cents-grained prices, NOT row count), (2) ONE ordered window over that
    small aggregate for cumulative counts, (3) join back and row_number
    within each value partition (keyed window — scales), so no global
    row-level sort ever happens. bucket = ((pos-1)*K) div N is pure integer
    arithmetic — bit-equal on both engines, NTILE-style near-equal depths."""
    # complete-case: a NULL price has no depth position (the engines sort
    # NULLs on opposite ends, shifting every bucket boundary) — dirty-
    # orders sweep, r12; oracle mirrored
    orders = load(spark, sf, "orders").where(F.col("o_totalprice").isNotNull())
    per_v = orders.groupBy("o_totalprice").agg(F.count("*").alias("c"))
    wcum = Window.orderBy("o_totalprice").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_v.select(
        "o_totalprice", "c", (F.sum("c").over(wcum) - F.col("c")).alias("below")
    )
    n = orders.groupBy().agg(F.count("*").alias("n"))
    wtie = Window.partitionBy("o_totalprice").orderBy("o_orderkey")
    pos = (
        orders.select("o_orderkey", "o_totalprice")
        .join(cum, "o_totalprice")
        .crossJoin(F.broadcast(n))
        .select(
            "o_totalprice",
            (F.col("below") + F.row_number().over(wtie)).alias("pos"),
            "n",
        )
    )
    return (
        pos.select(
            F.expr(f"cast(((pos - 1) * {HIST_EQD_K}) div n as int)").alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("bucket_min"),
            F.max("o_totalprice").alias("bucket_max"),
        )
    )


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------


def q_subquery_scalar(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_big_orders
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        GROUP BY o_orderpriority
        """
    )


def q_subquery_exists(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
        )
        GROUP BY o_orderstatus
        """
    )


def q_subquery_in(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "part").createOrReplaceTempView("part")
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_parts
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        GROUP BY p_brand
        """
    )


def q_subquery_correlated_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2's shape on these fixtures: each customer's cheapest order(s)
    via a correlated scalar aggregate subquery. Catalyst decorrelates it
    into an aggregate + equi-join (no per-row re-execution) — the
    decorrelation path the simple scalar/EXISTS/IN queries don't exercise.
    Revenue-style doubles compare by equality safely: o_totalprice carries
    2 decimals, exactly representable and untouched by arithmetic."""
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders o
        WHERE o_totalprice = (
            SELECT min(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


def q_filter_disjunctive_pushdown(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19's shape: revenue under an OR-of-ANDs predicate mixing both
    join sides (brand x quantity-band x size). Exercises disjunctive
    pushdown (the lineitem scan still receives the OR of quantity ranges)
    and common-condition factoring. The float sum is order-independent
    EXACTLY: extendedprice (2dp) x discount-complement (2dp) products are
    4dp values far inside double's 53-bit window, so every partial sum is
    exact regardless of partitioning — same argument as Q6."""
    load(spark, sf, "part").createOrReplaceTempView("part")
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
        """
    )


#: recursive date-spine length: each recursion level executes as its own
#: Spark job (~0.4 s), so the spine stays short — and well under Spark's
#: default recursion level limit of 100
SPINE_DAYS = 30


def q_recursive_cte_date_spine(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive CTE (Spark 4): a SPINE_DAYS-day date spine generated by
    recursion from min(o_orderdate), left-joined to per-day order counts
    with zero-filled gaps — the dense-calendar shape reporting queries need
    and non-recursive SQL has to fake with sequence()/explode. The
    recursion itself is driver-side tiny (one row per day); the per-day
    aggregate is one combine-friendly shuffle over orders."""
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        WITH RECURSIVE bounds AS (
            SELECT CAST(min(o_orderdate) AS DATE) AS d0 FROM orders
        ), spine(d) AS (
            SELECT d0 FROM bounds
            UNION ALL
            SELECT date_add(d, 1) FROM spine, bounds
            WHERE d < date_add(d0, {SPINE_DAYS - 1})
        ), per_day AS (
            SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS cnt,
                   round(sum(o_totalprice), 2) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        )
        SELECT spine.d AS order_date,
               coalesce(cnt, 0) AS n_orders,
               coalesce(rev, 0.0) AS revenue
        FROM spine LEFT JOIN per_day ON per_day.d = spine.d
        """
    )


def q_agg_regr_linear(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group simple linear regression via SQL:2016 REGR_* aggregates:
    slope/intercept/R² of extended price vs quantity per return flag.
    Single partial+final HashAggregate pass — the moments (sums, sums of
    squares, co-moments) are map-side combinable, so at 100 TB this is one
    scan plus a |groups|-row shuffle, same cost as any sum()."""
    lineitem = load(spark, sf, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        _r4(F.regr_slope("l_extendedprice", "l_quantity")).alias("slope"),
        _r4(F.regr_intercept("l_extendedprice", "l_quantity")).alias("intercept"),
        _r4(F.regr_r2("l_extendedprice", "l_quantity")).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
        _r4(F.regr_avgx("l_extendedprice", "l_quantity")).alias("avg_x"),
        _r4(F.regr_avgy("l_extendedprice", "l_quantity")).alias("avg_y"),
    )


#: hash-sample keep percentage + salt for the sampled-quantile sketch
QUANTILE_SAMPLE_PCT = 10
QUANTILE_SAMPLE_SALT = "qsample-v1"


def q_sketch_quantile_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile estimation from a deterministic 10% hash sample, WITH its
    exact answer and relative error — the 100 TB pattern for percentiles:
    a salted-hash Bernoulli sample is partitioning-independent and
    re-runnable (same rows every time, unlike rdd.sample), and the
    full-sort percentile then runs over 10% of the data. The exact side is
    computed here only to value-check the estimator; at scale you would
    ship the sampled side alone. Both sides are one scan each; rel_error
    is a ratio of already-rounded doubles, so engines agree bit-for-bit."""
    from ..functions.hashing import portable_hash

    li = load(spark, sf, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
        F.lit(QUANTILE_SAMPLE_SALT),
    )
    sampled = li.where(portable_hash(key) % 100 < QUANTILE_SAMPLE_PCT)
    est = sampled.groupBy("l_returnflag").agg(
        _r4(F.expr("percentile(l_extendedprice, 0.5)")).alias("est_p50"),
        F.count("*").alias("n_sampled"),
    )
    exact = li.groupBy("l_returnflag").agg(
        _r4(F.expr("percentile(l_extendedprice, 0.5)")).alias("exact_p50"),
        F.count("*").alias("n_rows"),
    )
    return est.join(exact, "l_returnflag").select(
        "l_returnflag",
        "est_p50",
        "exact_p50",
        "n_sampled",
        "n_rows",
        _r4(F.abs(F.col("est_p50") - F.col("exact_p50")) / F.col("exact_p50")).alias(
            "rel_error"
        ),
    )


def q_agg_mode_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-group mode (most frequent l_quantity per return
    flag, smallest value on count ties) via count + one row_number window
    over the small (group, value) aggregate — NOT the engine's mode()
    builtin, whose tie-breaking is engine-private and would never match
    across engines. The windowed aggregate is |groups x distinct values|
    rows, so the window is cheap at any corpus size."""
    li = load(spark, sf, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("modal_quantity"),
            F.col("cnt").alias("mode_count"),
        )
    )


def q_agg_boolean_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """SQL:2023-style boolean/conditional aggregates per group: count_if,
    bool_and / bool_or (EVERY / ANY), and the derived fraction — all
    combine-friendly single-pass moments (deterministic by construction;
    max_by/min_by are deliberately NOT used here because their tie-breaking
    on non-unique values is engine-private)."""
    li = load(spark, sf, "lineitem")
    discounted = F.col("l_discount") > F.lit(0.05)
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count_if(discounted).alias("n_discounted"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        _r4(F.count_if(discounted) / F.count("*")).alias("frac_discounted"),
    )


QUERIES = {
    "filter_pushdown": q_filter_pushdown,
    "projection_compute": q_projection_compute,
    "json_extract_props": q_json_extract_props,
    "join_inner": q_join_inner,
    "join_left_outer": q_join_left_outer,
    "join_full_outer": q_join_full_outer,
    "join_right_outer": q_join_right_outer,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_theta": q_join_theta,
    "join_multiway_q3": q_join_multiway_q3,
    "join_regional_revenue_q5": q_join_regional_revenue_q5,
    "pricing_summary_q1": q_pricing_summary_q1,
    "forecast_revenue_q6": q_forecast_revenue_q6,
    "agg_count_distinct": q_agg_count_distinct,
    "agg_approx_distinct": q_agg_approx_distinct,
    "agg_stats": q_agg_stats,
    "agg_rollup": q_agg_rollup,
    "agg_cube": q_agg_cube,
    "agg_grouping_sets": q_agg_grouping_sets,
    "agg_having": q_agg_having,
    "conditional_agg": q_conditional_agg,
    "pivot_event_type": q_pivot_event_type,
    "window_topk_per_group": q_window_topk_per_group,
    "window_running_sum": q_window_running_sum,
    "window_range_frame": q_window_range_frame,
    "unpivot_stack": q_unpivot_stack,
    "window_lag_lead": q_window_lag_lead,
    "window_rank_dense_ntile": q_window_rank_dense_ntile,
    "global_topk": q_global_topk,
    "set_ops": q_set_ops,
    "scalar_string_funcs": q_scalar_string_funcs,
    "scalar_date_funcs": q_scalar_date_funcs,
    "scalar_math_funcs": q_scalar_math_funcs,
    "scalar_array_funcs": q_scalar_array_funcs,
    "scalar_map_funcs": q_scalar_map_funcs,
    "json_variant_extract": q_json_variant_extract,
    "agg_two_phase_salted": q_agg_two_phase_salted,
    "agg_percentiles": q_agg_percentiles,
    "subquery_scalar": q_subquery_scalar,
    "subquery_exists": q_subquery_exists,
    "subquery_in": q_subquery_in,
    "subquery_correlated_scalar": q_subquery_correlated_scalar,
    "filter_disjunctive_pushdown": q_filter_disjunctive_pushdown,
    "window_first_last_nth": q_window_first_last_nth,
    "agg_corr_covar": q_agg_corr_covar,
    "agg_argmin_argmax": q_agg_argmin_argmax,
    "histogram_equiwidth": q_histogram_equiwidth,
    "join_skew_salted": q_join_skew_salted,
    # appended last (new r5 surface) so the existing driver-checked prefix
    # composition shifts as little as possible
    "recursive_cte_date_spine": q_recursive_cte_date_spine,
    "agg_regr_linear": q_agg_regr_linear,
    "sketch_quantile_hash_sample": q_sketch_quantile_hash_sample,
    "agg_mode_per_group": q_agg_mode_per_group,
    "agg_boolean_aggs": q_agg_boolean_aggs,
    # appended last (new r7 surface): TPC-H Q10 returned-item revenue and
    # Q18 large-volume customers
    "top_customers_q10": q_top_customers_q10,
    "large_orders_q18": q_large_orders_q18,
    # appended last (late-r7 surface): the remaining TPC-H shapes the
    # trimmed fixture schema can express (no partsupp / commitdate /
    # shipmode / phone columns -> Q2/Q9/Q11/Q12/Q16/Q19/Q20/Q21 restated
    # or out of scope; lateness/inactivity predicates adapted, documented
    # per-query)
    "order_priority_q4": q_order_priority_q4,
    "volume_shipping_q7": q_volume_shipping_q7,
    "market_share_q8": q_market_share_q8,
    "customer_distribution_q13": q_customer_distribution_q13,
    "promo_revenue_q14": q_promo_revenue_q14,
    "top_supplier_q15": q_top_supplier_q15,
    "small_qty_revenue_q17": q_small_qty_revenue_q17,
    "global_sales_q22": q_global_sales_q22,
    # appended last (r7 continuation): the final TPC-H shapes, each
    # restated for the trimmed fixture schema (no partsupp / commitdate /
    # shipmode / container — restatements documented per-query). With
    # these, all 22 TPC-H query shapes have a fixture-expressible stand-in.
    "min_cost_supplier_q2": q_min_cost_supplier_q2,
    "product_profit_q9": q_product_profit_q9,
    "important_value_q11": q_important_value_q11,
    "late_lines_q12": q_late_lines_q12,
    "supplier_cnt_q16": q_supplier_cnt_q16,
    "brand_qty_revenue_q19": q_brand_qty_revenue_q19,
    "promotion_suppliers_q20": q_promotion_suppliers_q20,
    "waiting_supplier_q21": q_waiting_supplier_q21,
    # appended (r7 continuation): equi-depth histogram without a global
    # row-level sort
    "histogram_equidepth": q_histogram_equidepth,
}

ORACLES = {
    "filter_pushdown": """
        SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
        FROM part
        WHERE p_size BETWEEN 10 AND 20
          AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND p_name LIKE '%a%'
    """,
    "projection_compute": """
        SELECT o_orderkey AS order_id,
               year(o_orderdate) AS o_year,
               month(o_orderdate) AS o_month,
               strftime(o_orderdate, '%Y-%m-%d') AS logday,
               round(o_totalprice * (1 - 0.04), 2) AS net_price,
               upper(o_orderstatus) AS status_uc
        FROM orders
    """,
    "json_extract_props": """
        SELECT (json_extract_string(props, '$.k')::INT) % 10 AS k_mod,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1
    """,
    "join_inner": """
        SELECT c_mktsegment, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS segment_revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "join_left_outer": """
        WITH per_cust AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        )
        SELECT n_orders, count(*) AS n_customers FROM per_cust GROUP BY n_orders
    """,
    "join_full_outer": """
        WITH cust AS (
            SELECT c_nationkey AS nationkey, count(*) AS n_customers
            FROM customer GROUP BY 1
        ), supp AS (
            SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
            FROM supplier GROUP BY 1
        )
        SELECT coalesce(cust.nationkey, supp.nationkey) AS nationkey,
               coalesce(n_customers, 0) AS n_customers,
               coalesce(n_suppliers, 0) AS n_suppliers
        FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
    "join_right_outer": """
        SELECT c_mktsegment, count(o_orderkey) AS n_orders,
               count(DISTINCT c_custkey) AS n_customers,
               round(coalesce(sum(o_totalprice), 0), 2) AS segment_revenue
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "join_semi": """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
    """,
    "join_anti": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "join_theta": """
        SELECT n1.n_regionkey AS regionkey, n1.n_name AS nation_a, n2.n_name AS nation_b
        FROM nation n1 JOIN nation n2
          ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
    "join_multiway_q3": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "join_regional_revenue_q5": """
        SELECT r_name AS region_name, n_name AS nation_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "pricing_summary_q1": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "forecast_revenue_q6": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "agg_count_distinct": """
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_distinct_customers,
               count(DISTINCT o_orderpriority) AS n_priorities,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    # the exact columns are a true differential; the TRUE literals assert
    # Spark's HLL++ estimate stayed inside the 5% bound (see the builder)
    "agg_approx_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts_exact,
               count(DISTINCT l_orderkey) AS n_orders_exact,
               TRUE AS parts_est_within_5pct,
               TRUE AS orders_est_within_5pct
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_stats": """
        SELECT o_orderpriority,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price,
               round(avg(o_totalprice), 4) AS avg_price,
               round(stddev_samp(o_totalprice), 4) AS std_price,
               round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_rollup": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total,
               GROUPING(o_orderstatus)::INT AS g_status,
               GROUPING(o_orderpriority)::INT AS g_priority
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "agg_cube": """
        SELECT l_returnflag, l_linestatus, count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "agg_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "agg_having": """
        SELECT l_partkey, count(*) AS n_lines, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY l_partkey HAVING count(*) >= 40
    """,
    "conditional_agg": """
        SELECT user_id,
               round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click_value,
               round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase_value,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
               count(*) AS n_events
        FROM events GROUP BY user_id
    """,
    "pivot_event_type": """
        SELECT user_id,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        FROM events GROUP BY user_id
    """,
    "window_topk_per_group": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rk
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
            FROM orders
        ) WHERE rk <= 3
    """,
    "window_running_sum": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER w, 2) AS running_total,
               row_number() OVER w AS order_seq
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "window_range_frame": """
        SELECT o_orderkey, o_orderpriority,
               round(o_totalprice, 2) AS o_totalprice,
               count(*) OVER w AS n_within_1000,
               round(sum(o_totalprice) OVER w, 2) AS sum_within_1000
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC
                     RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
    """,
    "unpivot_stack": """
        WITH wide AS (
            SELECT o_orderstatus,
                   sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS urgent,
                   sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)::BIGINT AS high,
                   sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT AS other
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, 'urgent' AS priority_class, urgent AS n FROM wide
        UNION ALL
        SELECT o_orderstatus, 'high', high FROM wide
        UNION ALL
        SELECT o_orderstatus, 'other', other FROM wide
    """,
    "window_lag_lead": """
        SELECT user_id, event_id,
               floor(epoch(ts))::BIGINT AS ts_epoch,
               floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT AS gap_seconds,
               lead(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    "window_rank_dense_ntile": """
        SELECT c_custkey,
               row_number() OVER w AS rn,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 4) AS pct_rank,
               round(cume_dist() OVER w, 4) AS cume
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    "global_topk": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    "set_ops": """
        WITH cust_n AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
             supp_n AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        SELECT nationkey, 'intersect' AS set_op FROM (SELECT * FROM cust_n INTERSECT SELECT * FROM supp_n)
        UNION ALL
        SELECT nationkey, 'except' AS set_op FROM (SELECT * FROM cust_n EXCEPT ALL SELECT * FROM supp_n)
        UNION ALL
        SELECT nationkey, 'union' AS set_op FROM (SELECT * FROM cust_n UNION SELECT * FROM supp_n)
    """,
    "scalar_string_funcs": """
        SELECT p_partkey,
               upper(p_name) AS name_uc,
               lower(p_brand) AS brand_lc,
               length(p_name) AS name_len,
               substr(p_name, 1, 5) AS name_pfx,
               concat_ws('|', p_brand, p_type) AS brand_type,
               ltrim(rtrim(p_type)) AS type_trim,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
               string_split(p_type, ' ')[1] AS type_first_word,
               lpad(p_size::VARCHAR, 4, '0') AS size_padded
        FROM part
    """,
    "scalar_date_funcs": """
        SELECT o_orderkey,
               year(o_orderdate) AS yy,
               month(o_orderdate) AS mm,
               day(o_orderdate) AS dd,
               quarter(o_orderdate) AS qq,
               date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
               strftime(o_orderdate, '%Y-%m') AS ym,
               datediff('day', o_orderdate::DATE, DATE '2002-01-01') AS days_to_2002
        FROM orders
    """,
    "scalar_math_funcs": """
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05) AS abs_v,
               ceil(l_quantity)::BIGINT AS ceil_q,
               floor(l_quantity)::BIGINT AS floor_q,
               round(sqrt(l_extendedprice), 4) AS sqrt_p,
               round(ln(l_extendedprice + 1), 4) AS ln_p,
               round(pow(l_tax + 1, 2), 4) AS pow_tax,
               l_partkey % 7 AS mod_7,
               greatest(l_discount, l_tax) AS max_rate,
               least(l_discount, l_tax) AS min_rate
        FROM lineitem WHERE l_orderkey % 100 = 0
    """,
    "scalar_array_funcs": """
        WITH tok AS (
            SELECT doc_id, text, regexp_extract_all(text, '[a-zA-Z0-9]+') AS tokens
            FROM documents
        )
        SELECT doc_id,
               len(tokens) AS n_tokens,
               len(list_distinct(tokens)) AS n_uniq,
               list_contains(tokens, 'the') AS has_the,
               CASE WHEN len(tokens) > 0
                    THEN list_sort(list_distinct(tokens))[1] END AS first_token_sorted,
               coalesce(array_to_string(list_sort(tokens)[1:3], ','), '')
                   AS top3_sorted,
               MAP(['chars', 'words'],
                   [length(text)::BIGINT, len(tokens)::BIGINT])['words'][1] AS map_words
        FROM tok
    """,
    "json_variant_extract": """
        SELECT json_extract(props, '$.k')::INT % 7 AS k_mod7,
               count(*) AS n_events,
               count(DISTINCT json_extract(props, '$.k')::INT) AS n_distinct_k,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1
    """,
    "scalar_map_funcs": """
        WITH per_type AS (
            SELECT user_id, event_type, count(*)::BIGINT AS cnt
            FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT user_id,
               count(*)::INT AS n_types,
               string_agg(event_type, ',' ORDER BY event_type) AS types_sorted,
               sum(cnt)::BIGINT AS total_events,
               bool_or(event_type = 'purchase') AS has_purchase,
               (count(*) FILTER (WHERE cnt >= 3))::INT AS n_hot_types,
               max(cnt) FILTER (WHERE event_type = 'purchase') AS purchase_cnt
        FROM per_type
        GROUP BY user_id
    """,
    "agg_two_phase_salted": """
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n_rows,
               round(max(l_extendedprice), 2) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "agg_percentiles": """
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    "subquery_scalar": """
        SELECT o_orderpriority, count(*) AS n_big_orders
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        GROUP BY o_orderpriority
    """,
    "subquery_exists": """
        SELECT o_orderstatus, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
        )
        GROUP BY o_orderstatus
    """,
    "subquery_in": """
        SELECT p_brand, count(*) AS n_parts
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        GROUP BY p_brand
    """,
    "subquery_correlated_scalar": """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders o
        WHERE o_totalprice = (
            SELECT min(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
    """,
    "filter_disjunctive_pushdown": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
    "window_first_last_nth": """
        SELECT o_custkey, o_orderkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice) OVER w AS last_price,
               nth_value(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "agg_corr_covar": """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
               round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_argmin_argmax": """
        WITH extremes AS (
            SELECT o_orderpriority, min(o_totalprice) AS min_price,
                   max(o_totalprice) AS max_price
            FROM orders GROUP BY o_orderpriority
        ), lo AS (
            SELECT e.o_orderpriority, min(o_orderkey) AS cheapest_orderkey,
                   min(min_price) AS min_price
            FROM orders o JOIN extremes e
              ON o.o_orderpriority = e.o_orderpriority AND o.o_totalprice = e.min_price
            GROUP BY e.o_orderpriority
        ), hi AS (
            SELECT e.o_orderpriority, min(o_orderkey) AS priciest_orderkey,
                   min(max_price) AS max_price
            FROM orders o JOIN extremes e
              ON o.o_orderpriority = e.o_orderpriority AND o.o_totalprice = e.max_price
            GROUP BY e.o_orderpriority
        )
        SELECT o_orderpriority, cheapest_orderkey, min_price,
               priciest_orderkey, max_price
        FROM lo JOIN hi USING (o_orderpriority)
    """,
    "join_skew_salted": """
        SELECT o_orderstatus, count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
    "histogram_equiwidth": f"""
        SELECT floor(o_totalprice / {HIST_BUCKET_WIDTH})::BIGINT AS bucket,
               count(*) AS n_orders,
               round(min(o_totalprice), 2) AS bucket_min,
               round(max(o_totalprice), 2) AS bucket_max
        FROM orders GROUP BY 1
    """,
    "recursive_cte_date_spine": f"""
        WITH RECURSIVE bounds AS (
            SELECT CAST(min(o_orderdate) AS DATE) AS d0 FROM orders
        ), spine(d) AS (
            SELECT d0 FROM bounds
            UNION ALL
            SELECT d + 1 FROM spine, bounds
            WHERE d < d0 + {SPINE_DAYS - 1}
        ), per_day AS (
            SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS cnt,
                   round(sum(o_totalprice), 2) AS rev
            FROM orders GROUP BY CAST(o_orderdate AS DATE)
        )
        SELECT spine.d AS order_date,
               coalesce(cnt, 0) AS n_orders,
               coalesce(rev, 0.0) AS revenue
        FROM spine LEFT JOIN per_day ON per_day.d = spine.d
    """,
    "agg_regr_linear": """
        SELECT l_returnflag,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
               regr_count(l_extendedprice, l_quantity) AS n_pairs,
               round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
               round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_y
        FROM lineitem GROUP BY l_returnflag
    """,
    "sketch_quantile_hash_sample": f"""
        WITH sampled AS (
            SELECT l_returnflag, l_extendedprice FROM lineitem
            WHERE ({portable_hash_sql_duckdb("l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR || 'qsample-v1'")} % 100) < 10
        ), est AS (
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS est_p50,
                   count(*) AS n_sampled
            FROM sampled GROUP BY l_returnflag
        ), exact AS (
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, est_p50, exact_p50, n_sampled, n_rows,
               round(abs(est_p50 - exact_p50) / exact_p50, 4) AS rel_error
        FROM est JOIN exact USING (l_returnflag)
    """,
    "agg_boolean_aggs": """
        SELECT l_returnflag,
               count(*) AS n_rows,
               count_if(l_discount > 0.05)::BIGINT AS n_discounted,
               bool_and(l_quantity > 0) AS all_positive_qty,
               bool_or(l_tax > 0.07) AS any_high_tax,
               round(count_if(l_discount > 0.05)::DOUBLE / count(*), 4) AS frac_discounted
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_mode_per_group": """
        WITH counts AS (
            SELECT l_returnflag, l_quantity, count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_quantity
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY l_returnflag ORDER BY cnt DESC, l_quantity ASC) AS rn
            FROM counts
        )
        SELECT l_returnflag, l_quantity AS modal_quantity, cnt AS mode_count
        FROM ranked WHERE rn = 1
    """,
    "top_customers_q10": """
        SELECT c_custkey, c_name, c_acctbal, n_name AS nation_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1999-01-01'
          AND o_orderdate < TIMESTAMP '2000-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "large_orders_q18": """
        WITH big AS (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum_qty, 2) AS sum_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "order_priority_q4": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01'
          AND o_orderdate < TIMESTAMP '1999-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "volume_shipping_q7": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_3', 'NATION_7')
          AND n2.n_name IN ('NATION_3', 'NATION_7')
          AND n1.n_name <> n2.n_name
          AND l_shipdate >= TIMESTAMP '1999-01-01'
          AND l_shipdate < TIMESTAMP '2001-01-01'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "market_share_q8": """
        SELECT year(o_orderdate) AS o_year,
               round(sum(CASE WHEN sn.n_name = 'NATION_5'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1999-01-01'
          AND o_orderdate < TIMESTAMP '2001-01-01'
        GROUP BY 1
        ORDER BY 1
    """,
    "customer_distribution_q13": """
        SELECT order_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS order_count
            FROM customer
            LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        )
        GROUP BY order_count
        ORDER BY custdist DESC, order_count DESC
    """,
    "promo_revenue_q14": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4)
               AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1999-09-01'
          AND l_shipdate < TIMESTAMP '1999-10-01'
    """,
    "top_supplier_q15": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1999-01-01'
              AND l_shipdate < TIMESTAMP '1999-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "small_qty_revenue_q17": """
        WITH pf AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
        lp AS (
            SELECT p_partkey, CAST(l_quantity AS BIGINT) AS qty,
                   l_extendedprice
            FROM lineitem JOIN pf ON l_partkey = p_partkey
        ),
        st AS (
            SELECT p_partkey AS pk, sum(qty) AS sum_qty, count(*) AS cnt
            FROM lp GROUP BY p_partkey
        )
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lp JOIN st ON p_partkey = pk
        WHERE 5 * qty * cnt < sum_qty
    """,
    "global_sales_q22": """
        WITH pos AS (
            SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS sum_cents,
                   count(*) AS n_pos
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c_mktsegment, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer, pos
        WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * n_pos > sum_cents
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2001-06-01')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "min_cost_supplier_q2": """
        WITH supp AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), cost AS (
            SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
                   round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                         / sum(CAST(l_quantity AS BIGINT)) / 100.0, 2) AS cost
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supp ON l_suppkey = s_suppkey
            WHERE p_type = 'STANDARD' AND p_size < 10
            GROUP BY 1, 2, 3, 4, 5, 6
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
        FROM cost c
        WHERE cost = (SELECT min(cost) FROM cost c2
                      WHERE c2.p_partkey = c.p_partkey)
        ORDER BY s_acctbal DESC, p_partkey ASC, s_name ASC
        LIMIT 100
    """,
    "product_profit_q9": """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY nation ASC, o_year DESC
    """,
    "important_value_q11": """
        WITH per_part AS (
            SELECT l_partkey,
                   sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                   AS value_e4
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY l_partkey
        ), stats AS (
            SELECT sum(value_e4) AS total_e4, count(*) AS n_parts
            FROM per_part
        )
        SELECT l_partkey AS p_partkey,
               round(value_e4 / 10000.0, 2) AS value
        FROM per_part, stats
        WHERE value_e4 * n_parts > 2 * total_e4
        ORDER BY value DESC, p_partkey ASC
    """,
    "late_lines_q12": """
        SELECT l_linestatus,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1999-01-01'
          AND l_shipdate < TIMESTAMP '2000-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "supplier_cnt_q16": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
    """,
    "brand_qty_revenue_q19": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
               AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#21' AND l_quantity BETWEEN 10 AND 20
               AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
               AND p_size BETWEEN 1 AND 15)
    """,
    "promotion_suppliers_q20": """
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'small%'
                AND l_shipdate >= TIMESTAMP '1999-01-01'
                AND l_shipdate < TIMESTAMP '2000-01-01'
              GROUP BY l_suppkey, l_partkey
              HAVING sum(CAST(l_quantity AS BIGINT)) > 50)
        ORDER BY s_name
    """,
    "waiting_supplier_q21": """
        WITH late AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT s_name, count(*) AS numwait
        FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (
                  SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
                  SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
    """,
    # exact-rank equi-depth histogram (value-histogram decomposition)
    "histogram_equidepth": """
        WITH per_v AS (
            SELECT o_totalprice, count(*)::BIGINT AS c
            FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
        ), cum AS (
            SELECT o_totalprice, c,
                   (sum(c) OVER (ORDER BY o_totalprice
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
                     - c AS below
            FROM per_v
        ), n AS (
            SELECT count(*)::BIGINT AS n FROM orders
            WHERE o_totalprice IS NOT NULL
        ), pos AS (
            SELECT o.o_totalprice,
                   cum.below
                     + row_number() OVER (PARTITION BY o.o_totalprice
                                          ORDER BY o.o_orderkey) AS pos,
                   n.n
            FROM orders o JOIN cum USING (o_totalprice) CROSS JOIN n
        )
        SELECT (((pos - 1) * 20) // n)::INT AS bucket,
               count(*)::BIGINT AS n_orders,
               min(o_totalprice) AS bucket_min,
               max(o_totalprice) AS bucket_max
        FROM pos GROUP BY 1
    """,
}


#: lateral top-N: orders kept per customer
LATERAL_TOP_N = 2


def q_join_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL correlated subquery (SQL:1999; Spark 3.2+ lateral join):
    each customer picks its top-LATERAL_TOP_N orders by (totalprice,
    orderkey) through a correlated LIMIT — the per-entity top-N shape
    analysts write naturally as LATERAL, here proven equivalent to the
    engine's WindowGroupLimit execution. Restricted to BUILDING-segment
    customers so the correlation actually prunes.

    Spark plans the decorrelated form as a rank window; the pin asserts
    the rank-limit runs PARTIALLY below the exchange (WindowGroupLimit),
    so even a mega-customer forwards at most N rows per task — the
    lateral syntax costs nothing over the hand-written window at scale.

    Determinism: ordering is the (price desc, orderkey) total order;
    money rounds once."""
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT c.c_custkey, c.c_name, t.o_orderkey,
               round(t.o_totalprice, 2) AS o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT {LATERAL_TOP_N}
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


def q_join_null_safe_eq(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (<=> in Spark, IS NOT DISTINCT FROM in
    standard SQL): joining on a NULLABLE derived key where NULL must
    match NULL — the semantics plain `=` silently drops (NULL = NULL is
    NULL, so those rows vanish; the classic silent-data-loss bug in CDC
    merge keys). The derived key here is NULL for every order without a
    priority digit, non-null otherwise, and the query counts matches per
    key INCLUDING the NULL-NULL group, value-proving the three-valued-
    logic difference: the same join under `=` reports a hash-checked
    zero for the NULL group.

    Scale shape: both sides aggregate to key-level BEFORE the join (the
    null-safe comparator hashes NULL like any value, so the join stays a
    hash join); the eq-vs-safe-eq comparison rides the same two tiny
    frames."""
    orders = load(spark, sf, "orders")
    key = F.expr(
        "case when o_orderpriority like '%URGENT%' then null"
        " else substring(o_orderpriority, 1, 1) end"
    )
    a = orders.select(key.alias("k")).groupBy("k").agg(
        F.count("*").alias("n_a")
    )
    b = orders.select(key.alias("k")).groupBy("k").agg(
        F.count("*").alias("n_b")
    )
    safe = a.alias("a").join(
        b.alias("b"), F.expr("a.k <=> b.k")
    ).select(
        F.col("a.k").alias("k"),
        "n_a",
        "n_b",
        (F.col("n_a") * F.col("n_b")).alias("n_pairs_null_safe"),
    )
    plain = (
        a.alias("a2")
        .join(b.alias("b2"), F.expr("a2.k = b2.k"))
        .select(F.col("a2.k").alias("k"), (F.col("n_a") * F.col("n_b")).alias("n_pairs_plain_eq"))
    )
    return (
        safe.join(plain, "k", "left")
        .na.fill({"n_pairs_plain_eq": 0})
        .orderBy(F.col("k").asc_nulls_first())
    )


def q_window_cumulative_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Running DISTINCT user count per day — the cumulative-reach metric
    (DAU -> cumulative uniques) that naive count(DISTINCT) OVER cannot
    express (Spark and most engines reject DISTINCT in a running frame).
    The standard rewrite: mark each user's FIRST day (min aggregate, not
    a row_number over events), aggregate first-appearances per day, and
    running-sum that tiny per-day table — the same sorted-aggregate
    discipline as the Mann-Whitney ranks, so nothing event-sized is
    windowed.

    Each day also reports its plain distinct actives next to the
    cumulative reach, so the result value-proves new-vs-returning
    decomposition: actives - new = returning, and cumulative reach only
    grows."""
    events = load(spark, sf, "events")
    per_day = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count_distinct("user_id").alias("n_active_users")
    )
    first_day = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    new_per_day = first_day.groupBy("day").agg(
        F.count("*").alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_day.join(new_per_day, "day", "left")
        .na.fill({"n_new_users": 0})
        .withColumn("n_cumulative_users", F.sum("n_new_users").over(w))
        .select(
            "day",
            "n_active_users",
            "n_new_users",
            (F.col("n_active_users") - F.col("n_new_users")).alias(
                "n_returning_users"
            ),
            "n_cumulative_users",
        )
        .orderBy("day")
    )


QUERIES["join_lateral_topn"] = q_join_lateral_topn
QUERIES["join_null_safe_eq"] = q_join_null_safe_eq
QUERIES["window_cumulative_distinct"] = q_window_cumulative_distinct

ORACLES["join_lateral_topn"] = f"""
    SELECT c.c_custkey, c.c_name, t.o_orderkey,
           round(t.o_totalprice, 2) AS o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT {LATERAL_TOP_N}
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
"""

ORACLES["join_null_safe_eq"] = """
    WITH keyed AS (
        SELECT CASE WHEN o_orderpriority LIKE '%URGENT%' THEN NULL
                    ELSE substring(o_orderpriority, 1, 1) END AS k
        FROM orders
    ), a AS (SELECT k, count(*)::BIGINT AS n_a FROM keyed GROUP BY k),
    b AS (SELECT k, count(*)::BIGINT AS n_b FROM keyed GROUP BY k),
    safe AS (
        SELECT a.k, a.n_a, b.n_b, (a.n_a * b.n_b)::BIGINT AS n_pairs_null_safe
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ), plain AS (
        SELECT a.k, (a.n_a * b.n_b)::BIGINT AS n_pairs_plain_eq
        FROM a JOIN b ON a.k = b.k
    )
    SELECT s.k, s.n_a, s.n_b, s.n_pairs_null_safe,
           coalesce(p.n_pairs_plain_eq, 0)::BIGINT AS n_pairs_plain_eq
    FROM safe s LEFT JOIN plain p ON s.k IS NOT DISTINCT FROM p.k
    ORDER BY s.k ASC NULLS FIRST
"""

ORACLES["window_cumulative_distinct"] = """
    WITH per_day AS (
        SELECT ts::DATE AS day, count(DISTINCT user_id)::BIGINT AS n_active_users
        FROM events GROUP BY 1
    ), first_day AS (
        SELECT user_id, min(ts::DATE) AS day FROM events GROUP BY user_id
    ), new_per_day AS (
        SELECT day, count(*)::BIGINT AS n_new_users FROM first_day GROUP BY day
    )
    SELECT p.day, p.n_active_users,
           coalesce(n.n_new_users, 0)::BIGINT AS n_new_users,
           (p.n_active_users - coalesce(n.n_new_users, 0))::BIGINT AS n_returning_users,
           (sum(coalesce(n.n_new_users, 0)) OVER (ORDER BY p.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
               AS n_cumulative_users
    FROM per_day p LEFT JOIN new_per_day n USING (day)
    ORDER BY p.day
"""


def q_agg_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact weighted median per group: the price point at which half
    the QUANTITY (not half the line items) has been sold — the
    inventory-weighted location statistic plain percentile_cont cannot
    express. Per l_returnflag: the smallest price whose running quantity
    weight reaches half the group total (the standard lower weighted
    median), plus the total weight and the reached cumulative weight as
    hash-checked witnesses.

    Determinism: prices and quantities are exact integers (cents /
    integer quantities); the cut compares 2 * cum_weight >= total
    (integer cross-multiplication, no halving division); the per-group
    minimum over qualifying rows is a total order.

    Scale shape: one combine-friendly (group, price) aggregate FIRST
    (the corpus-sized scan), then the running-weight window over the
    AGGREGATED distinct-price table (the Mann-Whitney sorted-aggregate
    discipline — |distinct prices| per group, never line items), then a
    1-row-per-group min fold."""
    li = load(spark, sf, "lineitem")
    by_price = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").alias(
            "price_cents"
        ),
    ).agg(F.sum(F.expr("cast(l_quantity as bigint)")).alias("w"))
    win = Window.partitionBy("grp").orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.partitionBy("grp")
    cum = by_price.withColumn("cum_w", F.sum("w").over(win)).withColumn(
        "total_w", F.sum("w").over(wtot)
    )
    return (
        cum.where(2 * F.col("cum_w") >= F.col("total_w"))
        .groupBy("grp")
        .agg(
            F.min(F.struct("price_cents", "cum_w")).alias("m"),
            F.max("total_w").alias("total_weight"),
        )
        .select(
            "grp",
            F.col("m.price_cents").alias("weighted_median_cents"),
            F.col("m.cum_w").alias("cum_weight_at_median"),
            "total_weight",
        )
        .orderBy("grp")
    )


ORACLES["agg_weighted_median"] = """
    WITH by_price AS (
        SELECT l_returnflag AS grp,
               floor(l_extendedprice * 100 + 0.5)::BIGINT AS price_cents,
               sum(l_quantity::BIGINT)::BIGINT AS w
        FROM lineitem GROUP BY 1, 2
    ), cum AS (
        SELECT grp, price_cents, w,
               sum(w) OVER (PARTITION BY grp ORDER BY price_cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS cum_w,
               sum(w) OVER (PARTITION BY grp)::BIGINT AS total_w
        FROM by_price
    ), qual AS (
        SELECT * FROM cum WHERE 2 * cum_w >= total_w
    )
    SELECT grp,
           min(price_cents)::BIGINT AS weighted_median_cents,
           min(cum_w)::BIGINT AS cum_weight_at_median,
           max(total_w)::BIGINT AS total_weight
    FROM qual GROUP BY grp
    ORDER BY grp
"""
QUERIES["agg_weighted_median"] = q_agg_weighted_median


#: moving-median frame width (rows): current row + the 4 preceding
MOVING_MEDIAN_WINDOW = 5


def q_window_moving_median(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user moving median of event value over the last
    MOVING_MEDIAN_WINDOW events — the robust rolling center (a rolling
    MEAN follows one outlier; the rolling median ignores it), the
    windowed companion to agg_weighted_median / outlier_robust_mad.

    Spark has no median window function, so the frame's values ride a
    collect_list over the bounded ROWS frame, sort_array picks the two
    middle elements, and the result is reported DOUBLED (lo + hi) so an
    even frame's half-step median stays an exact integer — no doubles
    anywhere (the Mann-Whitney doubled-rank discipline applied to a
    window). The frame is hard-bounded at MOVING_MEDIAN_WINDOW rows, so
    the per-row array is O(1) — this is the documented safe use of
    collect_list (the hub-precap discipline: never over an unbounded
    group). DuckDB's native median() over the same ROWS frame, doubled,
    is the independent oracle (it computes the even-frame average as
    exact .5 halves, so 2x is integer-exact).

    Scale shape: one user-keyed exchange shared with every other
    clickstream window op, a per-partition sort by (ts, event_id), and
    a map-side bounded-frame window — no global sort, no second
    shuffle. Output is row-per-event, the doc_fingerprint convention."""
    ev = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-(MOVING_MEDIAN_WINDOW - 1), 0)
    )
    # complete-case: a NULL value has no median contribution, and an
    # all-NULL frame would make the median rank index 0 (ANSI error);
    # DuckDB's median() skips NULLs asymmetrically — excluded in both
    vals = ev.where(F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        F.expr("cast(floor(value * 1000 + 0.5) as bigint)").alias("v_milli"),
        F.col("ts"),
    )
    arr = vals.withColumn(
        "frame", F.sort_array(F.collect_list("v_milli").over(w))
    )
    lo = F.element_at("frame", F.expr("cast((size(frame) + 1) / 2 as int)"))
    hi = F.element_at("frame", F.expr("cast(size(frame) / 2 + 1 as int)"))
    return arr.select(
        "user_id",
        "event_id",
        "v_milli",
        F.size("frame").alias("frame_len"),
        (lo + hi).alias("med_milli_x2"),
    )


QUERIES["window_moving_median"] = q_window_moving_median
ORACLES["window_moving_median"] = f"""
    WITH vals AS (
        SELECT user_id, event_id, ts,
               floor(value * 1000 + 0.5)::BIGINT AS v_milli
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, event_id, v_milli,
           count(*) OVER w AS frame_len,
           (2 * median(v_milli) OVER w)::BIGINT AS med_milli_x2
    FROM vals
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN {MOVING_MEDIAN_WINDOW - 1} PRECEDING
                          AND CURRENT ROW)
"""


def q_window_percent_rank_cume(spark: SparkSession, sf: str) -> DataFrame:
    """percent_rank / cume_dist over customer account balances per market
    segment — the normalized-position window pair (rank_dense_ntile
    covers the ordinal family; these two are the [0,1]-normalized family
    analysts quote as percentiles).

    Both are exact rationals of integer window primitives —
    percent_rank = (rank-1)/(n-1), cume_dist = |rows <= current|/n — so
    rather than compare raw doubles across engines, the result is
    quantized to micros with the exact integer-division identities
    (2e6*(r-1) + (n-1)) div (2*(n-1)) and (2e6*c + n) div (2n): no
    doubles anywhere, bit-equal by construction.

    Scale shape: one segment-keyed exchange + per-partition sort shared
    by both functions (one Window spec); output row-per-customer."""
    cust = load(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)").asc(),
        F.col("c_custkey").asc(),
    )
    ranked = cust.select(
        "c_mktsegment",
        "c_custkey",
        F.expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)").alias(
            "acctbal_cents"
        ),
        F.rank().over(w).alias("r"),
        F.count("*").over(Window.partitionBy("c_mktsegment")).alias("n"),
        F.cume_dist().over(w).alias("_cd_raw"),
    )
    return ranked.select(
        "c_mktsegment",
        "c_custkey",
        "acctbal_cents",
        F.expr(
            "case when n > 1 then"
            " (2000000 * (cast(r as bigint) - 1) + (n - 1)) div (2 * (n - 1))"
            " else cast(0 as bigint) end"
        ).alias("pct_rank_micro"),
        # cume_dist's numerator (#peers <= current) is re-derived exactly
        # from the native function: cd * n is an exact integer by window
        # semantics, so round-tripping through the double is lossless
        F.expr(
            "(2000000 * cast(round(_cd_raw * n) as bigint) + n) div (2 * n)"
        ).alias("cume_dist_micro"),
    )


QUERIES["window_percent_rank_cume"] = q_window_percent_rank_cume
ORACLES["window_percent_rank_cume"] = """
    WITH ranked AS (
        SELECT c_mktsegment, c_custkey,
               floor(c_acctbal * 100 + 0.5)::BIGINT AS acctbal_cents,
               rank() OVER w AS r,
               count(*) OVER (PARTITION BY c_mktsegment) AS n,
               cume_dist() OVER w AS cd_raw
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY floor(c_acctbal * 100 + 0.5)::BIGINT ASC,
                              c_custkey ASC)
    )
    SELECT c_mktsegment, c_custkey, acctbal_cents,
           CASE WHEN n > 1 THEN (2000000 * (r - 1) + (n - 1)) // (2 * (n - 1))
                ELSE 0 END::BIGINT AS pct_rank_micro,
           ((2000000 * round(cd_raw * n)::BIGINT + n) // (2 * n))::BIGINT
               AS cume_dist_micro
    FROM ranked
"""
