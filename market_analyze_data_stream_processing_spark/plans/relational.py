"""Relational surface over the synthetic star schema (SURVEY.md §2.3/2.4/
2.6/2.7/2.8 generalized operators): joins (broadcast/semi/anti), grouped
and distinct aggregation, rollup, window rank, top-k, set ops, scalar
functions.

Scale notes (100 TB): every query here is declarative DataFrame code —
Catalyst pushes filters/projections into the parquet scan, small dims
(region/nation/customer at their natural sizes) are broadcast explicitly,
orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k +
driver merge, no global sort), and AQE picks shuffle partition counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalars import (
    decimal_to_double_split,
    decimal_to_double_split_sql,
    grid_long,
    grid_sum_parts,
    grid_sum_value,
    money2,
    money_round,
    one_minus_rate,
    one_plus_rate,
    qty1,
    stable_round,
)
from ..sources.tables import load_tables
from .registry import register


@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(4,1))), 2) AS DOUBLE)                                            AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)                                       AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)                    AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)      AS sum_charge,
           floor({decimal_to_double_split_sql('sum(CAST(l_quantity AS DECIMAL(4,1)))')}
                 / count(l_quantity) * 10000 + 0.5) / 10000                     AS avg_qty,
           floor({decimal_to_double_split_sql('sum(CAST(l_extendedprice AS DECIMAL(12,2)))')}
                 / count(l_extendedprice) * 10000 + 0.5) / 10000                AS avg_price,
           floor({decimal_to_double_split_sql('sum(CAST(l_discount AS DECIMAL(4,2)))')}
                 / count(l_discount) * 1000000 + 0.5) / 1000000                 AS avg_disc,
           count(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary (agg A1-family). Full scan + partial agg; "
    "map-side combine makes this shuffle O(groups), not O(rows). Money/qty "
    "sums accumulate as split LONG integer grids (grid_sum_parts — exact "
    "and order-independent like the DECIMAL form it replaced, without the "
    ">18-digit BigDecimal buffer); means divide the split-cast exact "
    "numerator (decimal_to_double_split, portable past |v|·10^s > 2^53) "
    "by count(col), preserving AVG's null-ignoring semantics.",
)
def q01_pricing_summary(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    l = t.lineitem.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
    u_qty = grid_long("l_quantity", 1)
    u_price = grid_long("l_extendedprice")
    u_disc = grid_long("l_discount")
    u_dp = u_price * (F.lit(100) - u_disc)
    u_ch = u_dp * (F.lit(100) + grid_long("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            *grid_sum_parts(u_qty, "qty", 1),
            *grid_sum_parts(u_price, "price", 2),
            *grid_sum_parts(u_dp, "dp", 4),
            *grid_sum_parts(u_ch, "ch", 6),
            *grid_sum_parts(u_disc, "disc", 2),
            F.count("l_quantity").alias("__n_qty"),
            F.count("l_extendedprice").alias("__n_price"),
            F.count("l_discount").alias("__n_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            money_round(grid_sum_value("qty", 1)).alias("sum_qty"),
            money_round(grid_sum_value("price", 2)).alias("sum_base_price"),
            money_round(grid_sum_value("dp", 4)).alias("sum_disc_price"),
            money_round(grid_sum_value("ch", 6)).alias("sum_charge"),
            # means: exact numerator → split-cast double (identical on
            # both engines past the plain-cast 2^53 bound), divided by
            # the NON-NULL count (AVG semantics), then snapped
            stable_round(
                decimal_to_double_split(grid_sum_value("qty", 1))
                / F.col("__n_qty"),
                4,
            ).alias("avg_qty"),
            stable_round(
                decimal_to_double_split(grid_sum_value("price", 2))
                / F.col("__n_price"),
                4,
            ).alias("avg_price"),
            stable_round(
                decimal_to_double_split(grid_sum_value("disc", 2))
                / F.col("__n_disc"),
                6,
            ).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q03_shipping_priority",
    """
    SELECT l.l_orderkey AS o_key,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_key
    LIMIT 10
    """,
    doc="TPC-H Q3-style: filtered 3-way join + top-10 by revenue. customer is "
    "broadcast (small dim); orderBy+limit → TakeOrderedAndProject.",
)
def q03_shipping_priority(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    c = t.customer.where(F.col("c_mktsegment") == "BUILDING")
    o = t.orders.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    l = t.lineitem.where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_round(F.sum(money2("l_extendedprice") * one_minus_rate("l_discount"))).alias("revenue"))
        .select(
            F.col("l_orderkey").alias("o_key"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.desc("revenue"), "o_key")
        .limit(10)
    )


@register(
    "q05_regional_revenue",
    """
    SELECT n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    doc="TPC-H Q5-style: 6-way join, local-supplier co-nation condition. All dims "
    "broadcast; only orders⋈lineitem shuffles (on orderkey).",
)
def q05_regional_revenue(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    r = t.region.where(F.col("r_name") == "EUROPE")
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = (
        t.lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            F.broadcast(t.supplier),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"))
        .agg(
            money_round(F.sum(money2("l_extendedprice") * one_minus_rate("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@register(
    "q_mktsegment_sales",
    f"""
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_sales,
           floor({decimal_to_double_split_sql('sum(CAST(o.o_totalprice AS DECIMAL(12,2)))')}
                 / count(o.o_totalprice) * 10000 + 0.5) / 10000 AS avg_sale
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
    doc="Broadcast dim join (J2 generalized) + grouped agg. The money "
    "mean divides the split-cast exact numerator by count(col) — AVG "
    "null-ignoring semantics, portable past |v|·10^s > 2^53.",
)
def q_mktsegment_sales(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_round(F.sum(money2("o_totalprice"))).alias("total_sales"),
            stable_round(
                decimal_to_double_split(F.sum(money2("o_totalprice")))
                / F.count("o_totalprice"),
                4,
            ).alias("avg_sale"),
        )
        .orderBy("segment")
    )


@register(
    "q_top_orders_per_customer",
    """
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY c.c_custkey
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    )
    WHERE rn <= 3
    """,
    doc="Window rank per key (T2/T5 generalized): top-3 orders per customer. "
    "Single shuffle on custkey; rank prunes before any downstream work.",
)
def q_top_orders_per_customer(spark, sf_dir):
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


@register(
    "q_order_priority_semi",
    """
    SELECT o.o_orderpriority AS priority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
    doc="TPC-H Q4-style semi join (EXISTS): orders having a late-shipped item.",
)
def q_order_priority_semi(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    late = t.lineitem.select("l_orderkey", "l_shipdate")
    o = t.orders
    return (
        o.join(
            late,
            (o.o_orderkey == late.l_orderkey) & (late.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority")
    )


@register(
    "q_parts_never_ordered",
    """
    SELECT count(*) AS n_unordered
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
    doc="Anti join (J3 generalized — the reference's seen-id skip).",
)
def q_parts_never_ordered(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.part.join(t.lineitem, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_unordered"))
    )


@register(
    "q_set_nation_overlap",
    """
    SELECT 'both' AS side, n_nationkey
    FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
          INTERSECT
          SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS side, n_nationkey
    FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
          EXCEPT
          SELECT DISTINCT s_nationkey FROM supplier)
    ORDER BY side, n_nationkey
    """,
    doc="Set ops (§2.7): INTERSECT / EXCEPT / UNION ALL over nation keys.",
)
def q_set_nation_overlap(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    cn = t.customer.select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    sn = t.supplier.select(F.col("s_nationkey").alias("n_nationkey")).distinct()
    both = cn.intersect(sn).select(F.lit("both").alias("side"), "n_nationkey")
    conly = cn.exceptAll(sn).select(F.lit("customer_only").alias("side"), "n_nationkey")
    return both.unionByName(conly).orderBy("side", "n_nationkey")


@register(
    "q_rollup_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(4,1))), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP grouping sets (free from Spark; absent in reference).",
)
def q_rollup_lineitem(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(money_round(F.sum(qty1("l_quantity"))).alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@register(
    "q_distinct_agg",
    """
    SELECT o_orderpriority AS priority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    doc="Distinct aggregation (expand + two-phase agg in Spark).",
)
def q_distinct_agg(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("priority")
    )


@register(
    "q_having_guard",
    """
    SELECT l_partkey, count(*) AS n_items, CAST(round(sum(CAST(l_quantity AS DECIMAL(4,1))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 5
    ORDER BY l_partkey
    """,
    doc="Count-guarded aggregation (A9: the reference's len(hist)>=n gates).",
)
def q_having_guard(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_items"), money_round(F.sum(qty1("l_quantity"))).alias("sum_qty"))
        .where(F.col("n_items") >= 5)
        .orderBy("l_partkey")
    )


@register(
    "q_scalar_string_date",
    """
    SELECT o_orderkey,
           concat_ws('_', 'ORD', cast(o_orderkey AS VARCHAR),
                     strftime(o_orderdate, '%Y-%m-%d')) AS synth_id,
           substring(o_orderpriority, 1, 1) AS prio_code,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
    ORDER BY o_orderkey
    """,
    doc="Scalar functions F1/F7/F10: id synthesis (concat_ws), substring "
    "truncation, date part extraction/formatting.",
)
def q_scalar_string_date(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.orders.where(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            F.concat_ws(
                "_", F.lit("ORD"), F.col("o_orderkey").cast("string"),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
            ).alias("synth_id"),
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q_dq_checks",
    """
    SELECT
        (SELECT count(*) FROM orders) AS n_orders,
        (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS null_custkey,
        (SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS nonpositive_price,
        (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS dup_orderkeys,
        (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lineitems,
        (SELECT count(*) FROM lineitem
          WHERE l_discount < 0 OR l_discount > 1) AS bad_discount
    """,
    doc="Deequ-style data-quality audit in one pass family: completeness "
    "(null keys), domain (non-positive prices, discount out of [0,1]), "
    "uniqueness (duplicate order keys), and referential integrity "
    "(orphan lineitems via anti join). Each check is an aggregate or "
    "broadcast anti join — the publish gate a pipeline runs before "
    "exposing a table; at scale every term is one map-side-combined "
    "scan, and the orphan check is the only shuffle.",
)
def q_dq_checks(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o_stats = t.orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_custkey"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("nonpositive_price"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_orderkeys"),
    )
    orphans = (
        t.lineitem.join(
            t.orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    bad_disc = t.lineitem.agg(
        F.sum(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0))
        .cast("long")
        .alias("bad_discount")
    )
    return o_stats.crossJoin(F.broadcast(orphans)).crossJoin(F.broadcast(bad_disc))
