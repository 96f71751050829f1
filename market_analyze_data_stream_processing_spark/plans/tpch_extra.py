"""TPC-H Q4/Q7/Q8/Q9/Q11/Q12/Q16/Q20/Q21 over the synthetic star schema.

The driver's schema is TPC-H-shaped but simplified: no ``partsupp``
table, and lineitem carries only ``l_shipdate`` (no
commitdate/receiptdate/shipmode). Queries whose classic text needs those
columns are adapted IN SHAPE — the operator structure that makes each
query interesting (correlated EXISTS, double-correlated NOT EXISTS,
CASE-aggregation, group-vs-global scalar thresholds, NOT IN
decorrelation) is preserved over the available columns, which is what
the engine must demonstrate at 100 TB.

Scale notes: as in relational.py — dims broadcast, filters pushed to the
scan, semi/anti joins instead of materialized EXISTS, and every
correlated subquery expressed as an aggregate join Catalyst can plan
without nested-loop execution.
"""

from __future__ import annotations

from pyspark.sql import Window
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
    qty1,
    stable_round,
)
from ..sources.tables import load_tables
from .registry import register


@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS → left-semi join on orderkey "
    "(late-ship condition adapted to l_shipdate > o_orderdate; no "
    "commitdate in this schema), then priority counts.",
)
def q04_order_priority(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = t.lineitem.select("l_orderkey", "l_shipdate")
    sem = o.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q07_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: bi-directional nation-pair trade volume by ship year. "
    "nation joined twice under different roles (both broadcast); the "
    "disjunctive pair predicate applies after both enrichments.",
)
def q07_volume_shipping(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    l = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        l.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            money_round(F.sum(money2("l_extendedprice") * one_minus_rate("l_discount"))).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q08_market_share",
    f"""
    WITH all_nations AS (
        SELECT year(o.o_orderdate) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2))
                      - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n2.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'EUROPE'
          AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           floor({decimal_to_double_split_sql("sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)")}
                 / {decimal_to_double_split_sql("sum(volume)")} * 1000000 + 0.5) / 1000000
               AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8: national market share within a region/part-type slice — "
    "conditional-sum ratio per year. Supplier nation drives the numerator; "
    "customer nation+region restrict the denominator population.",
)
def q08_market_share(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = t.part.where(F.col("p_type") == "PROMO")
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = t.region.where(F.col("r_name") == "EUROPE")
    j = (
        t.lineitem.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n2_region"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
    )
    vol = money2("l_extendedprice") * one_minus_rate("l_discount")
    zero = F.lit("0").cast("decimal(5,4)")
    return (
        j.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
        .groupBy("o_year")
        .agg(
            # exact decimal numerator/denominator, split-cast to double
            # (portable past |v|·10^4 > 2^53 where DuckDB's wide-decimal
            # cast double-rounds — round-11 advisory), one identical
            # IEEE division, floor-form snap — deterministic share
            stable_round(
                decimal_to_double_split(
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_1",
                            F.col("volume"),
                        ).otherwise(zero)
                    )
                )
                / decimal_to_double_split(F.sum("volume")),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q09_product_profit",
    """
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: product-line profit by supplier nation and year "
    "(no partsupp/supplycost in this schema, so profit = discounted "
    "revenue). Part-name LIKE filter pushes below every join.",
)
def q09_product_profit(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    p = t.part.where(F.col("p_name").like("%red%"))
    j = (
        t.lineitem.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    u4 = grid_long("l_extendedprice") * (F.lit(100) - grid_long("l_discount"))
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(*grid_sum_parts(u4, "profit", 4))
        .select(
            "nation",
            "o_year",
            money_round(grid_sum_value("profit", 4)).alias("profit"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_parts",
    """
    WITH pv AS (
        SELECT l.l_partkey AS partkey,
               sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * CAST(l.l_quantity AS DECIMAL(4,1))) AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY l.l_partkey
    )
    SELECT partkey, CAST(round(value, 2) AS DOUBLE) AS value
    FROM pv
    WHERE value > (SELECT sum(value) * CAST(0.001 AS DECIMAL(4,3)) FROM pv)
    ORDER BY value DESC, partkey
    """,
    doc="TPC-H Q11 shape: per-part traded value for one nation vs a global "
    "scalar threshold (group agg compared to a fraction of the grand "
    "total — the same agg reused, not recomputed; no partsupp in this "
    "schema so value = extendedprice*quantity).",
)
def q11_important_parts(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    n = t.nation.where(F.col("n_name") == "NATION_3")
    pv = (
        t.lineitem.join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(money2("l_extendedprice") * qty1("l_quantity")).alias("value"))
    )
    # exact decimal group values AND an exact decimal threshold: the
    # group-vs-global comparison is deterministic at any SF (a DOUBLE
    # threshold drifts ~n·ulp and flips boundary parts between engines)
    total = pv.agg(
        (F.sum("value") * F.lit("0.001").cast("decimal(4,3)")).alias("__threshold")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("__threshold"))
        .select("partkey", money_round(F.col("value")).alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


@register(
    "q12_late_shipment_priority",
    """
    SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    ORDER BY ship_class
    """,
    doc="TPC-H Q12 shape: priority counts split by shipment lateness class "
    "(no shipmode column; LATE = shipped >90 days after order date). The "
    "classic CASE-sum pivot aggregation.",
)
def q12_late_shipment_priority(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    l = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    j = l.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    return (
        j.withColumn("ship_class", F.when(late, "LATE").otherwise("ONTIME"))
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "q16_supplier_part_variety",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier variety per part facet with a "
    "NOT IN exclusion subquery (negative-balance suppliers stand in for "
    "the complaints filter; supplier-part pairs come from lineitem — no "
    "partsupp). NOT IN → broadcast anti join.",
)
def q16_supplier_part_variety(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    p = t.part.where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad = t.supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    l = t.lineitem.join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_excess_quantity_suppliers",
    """
    WITH sq AS (
        SELECT l.l_suppkey AS suppkey, sum(l.l_quantity) AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_name, n.n_name AS nation, round(sq.qty, 2) AS qty
    FROM sq
    JOIN supplier s ON s.s_suppkey = sq.suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE sq.qty > (SELECT avg(qty) * 0.5 FROM sq)
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape: suppliers moving excess quantity of a part "
    "family in a year — grouped quantity vs a scalar fraction-of-average "
    "threshold, then dim enrichment (no partsupp availqty; the threshold "
    "plays its role).",
)
def q20_excess_quantity_suppliers(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    p = t.part.where(F.col("p_name").like("small%"))
    l = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    sq = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thr = sq.agg((F.avg("qty") * 0.5).alias("__thr"))
    return (
        sq.crossJoin(F.broadcast(thr))
        .where(F.col("qty") > F.col("__thr"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("suppkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"), F.round("qty", 2).alias("qty"))
        .orderBy("s_name")
    )


@register(
    "q21_sole_late_supplier",
    """
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND datediff('day', o.o_orderdate, l.l_shipdate) > 60
    ),
    order_suppliers AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT s.s_name, count(DISTINCT late.l_orderkey) AS numwait
    FROM late
    JOIN supplier s ON s.s_suppkey = late.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM order_suppliers os
        WHERE os.l_orderkey = late.l_orderkey AND os.l_suppkey <> late.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM late l2
        WHERE l2.l_orderkey = late.l_orderkey AND l2.l_suppkey <> late.l_suppkey
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    doc="TPC-H Q21 shape: the double-correlated EXISTS/NOT-EXISTS — "
    "suppliers who were the SOLE late supplier on multi-supplier "
    "finished orders (late = shipped >60 days after order date; no "
    "receipt/commit dates in this schema). Both correlations become "
    "self-joins on orderkey: a semi (another supplier exists) and an "
    "anti (no OTHER late supplier).",
)
def q21_sole_late_supplier(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o = t.orders.where(F.col("o_orderstatus") == "F")
    late = (
        t.lineitem.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60)
        .select("l_orderkey", "l_suppkey")
    )
    order_suppliers = t.lineitem.select("l_orderkey", "l_suppkey").distinct()
    a = late.alias("a")
    # EXISTS other supplier on the order → semi join with inequality
    other = order_suppliers.alias("os")
    has_other = a.join(
        other,
        (F.col("os.l_orderkey") == F.col("a.l_orderkey"))
        & (F.col("os.l_suppkey") != F.col("a.l_suppkey")),
        "left_semi",
    )
    # NOT EXISTS other LATE supplier on the order → anti join
    l2 = late.alias("l2")
    sole = has_other.alias("a").join(
        l2,
        (F.col("l2.l_orderkey") == F.col("a.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("a.l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "q_salted_brand_revenue",
    """
    SELECT p.p_brand, CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    doc="Skew-mitigation correctness: the salted join (big side scattered "
    "over 8 salt buckets, small side replicated 8x) must equal the plain "
    "join bit-for-bit — the oracle IS the plain join. At scale this is "
    "the deterministic fallback when one hot key (viral ticker, stopword "
    "shingle) swamps AQE's skew handling.",
)
def q_salted_brand_revenue(spark, sf_dir):
    from ..operators.skew import salted_join

    t = load_tables(spark, sf_dir)
    big = t.lineitem.withColumnRenamed("l_partkey", "p_partkey")
    j = salted_join(big, t.part, key="p_partkey", n_salts=8)
    # exact revenue in 1e-4-dollar LONG units: cents × (100 - discount
    # hundredths) — grid_sum_parts keeps the 8x-salted aggregation on
    # the compact LONG fast path (the DECIMAL-buffer sum was 2x the
    # whole query's cost); the recombined value is bit-identical to the
    # oracle's exact DECIMAL sum
    u4 = grid_long("l_extendedprice") * (F.lit(100) - grid_long("l_discount"))
    return (
        j.groupBy("p_brand")
        .agg(
            *grid_sum_parts(u4, "rev", 4),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "p_brand",
            money_round(grid_sum_value("rev", 4)).alias("revenue"),
            "n_items",
        )
        .orderBy("p_brand")
    )
