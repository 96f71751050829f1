"""Second-wave oracle queries: sessionization, cumulative windows,
exact percentiles, statistical aggregates, vector centroids, token
frequency, and additional TPC-H shapes (Q6/Q10/Q14/Q18/Q19 adapted to
the synthetic schema). Extends coverage of SURVEY §2.3–2.8 plus the
streaming-adjacent session-window operator the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.scalars import (
    decimal_to_double_split,
    decimal_to_double_split_sql,
    stable_round,
    stable_round_sql,
)
from ..operators.stats import corr_moments_sql, corr_value_sql
from ..sources.tables import load_table, load_tables
from .registry import register


@register(
    "q06_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure filter + agg — every predicate pushes into the "
    "parquet scan (min/max pruning), zero shuffle beyond the final fold.",
)
def q06_forecast_revenue(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: returned-item revenue per customer, top 20.",
)
def q10_returned_items(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = t.lineitem.where(F.col("l_returnflag") == "R")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END), 2) AS promo_revenue,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    doc="TPC-H Q14: conditional-sum promo share; part is broadcast.",
)
def q14_promo_revenue(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    l = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))), 2
            ).alias("promo_revenue"),
            F.round(F.sum(disc), 2).alias("total_revenue"),
        )
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice, 2) AS totalprice,
           round(t.sum_qty, 2) AS sum_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) t ON t.l_orderkey = o.o_orderkey
    ORDER BY totalprice DESC, o_orderkey
    """,
    doc="TPC-H Q18: large-volume orders via HAVING-filtered subquery join.",
)
def q18_large_volume_customers(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        t.orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
    )


@register(
    "q19_disjunctive_predicates",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19: OR-of-ANDs join predicates (optimizer CNF extraction).",
)
def q19_disjunctive_predicates(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    j = t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q_sessionize",
    """
    WITH x AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, event_id, ts_us,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM x
    )
    SELECT user_id, session_idx::BIGINT AS session_idx, count(*) AS n_events,
           floor((max(ts_us) - min(ts_us)) / 1000000.0 * 100 + 0.5) / 100 AS duration_sec
    FROM s GROUP BY user_id, session_idx
    """,
    doc="Sessionization (gap > 30 min ⇒ new session): lag → new-session "
    "flag → running sum → per-session rollup. The batch equivalent of "
    "Structured Streaming's session_window; one shuffle on user_id.",
)
def q_sessionize(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    prev = F.lag(ts_us).over(w)
    is_new = F.when(prev.isNull() | (ts_us - prev > 1800 * 1_000_000), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = (
        e.withColumn("ts_us", ts_us)
        .withColumn("is_new", is_new)
        .withColumn("session_idx", F.sum("is_new").over(run))
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        stable_round((F.max("ts_us") - F.min("ts_us")) / 1e6, 2).alias("duration_sec"),
    )


@register(
    "q_cumulative_spend",
    """
    SELECT o_custkey, o_orderkey,
           floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) * 100 + 0.5) / 100
               AS cum_spend,
           row_number() OVER w AS order_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING)
    """,
    doc="Running cumulative sum per customer (decimal-exact windowed sum, "
    "engine-portable rounding).",
)
def q_cumulative_spend(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        stable_round(cum, 2).alias("cum_spend"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).alias("order_rank"),
    )


@register(
    "q_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Exact continuous percentiles per key (linear interpolation — the "
    "approx_percentile scale path is the same plan with a sketch agg).",
)
def q_percentiles(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "q_stats_agg",
    """
    WITH q AS (
        SELECT event_type, value,
               CAST(floor(value * 1000000.0 + 0.5) / 1000000.0
                    AS DECIMAL(18,6)) AS vq,
               CAST(user_id AS DECIMAL(18,6)) AS uq
        FROM events
    ), m AS (
        SELECT event_type,
               floor(stddev_samp(value) * 10000 + 0.5) / 10000 AS sd,
               floor(var_samp(value) * 10000 + 0.5) / 10000 AS var,
               floor(min(value) * 10000 + 0.5) / 10000 AS vmin,
               floor(max(value) * 10000 + 0.5) / 10000 AS vmax,
               """
    + corr_moments_sql("vq", "uq", "cu", "DECIMAL(38,6)", 6)
    + f"""
        FROM q GROUP BY event_type
    )
    SELECT event_type, sd, var,
           {stable_round_sql(corr_value_sql('cu'), 4)} AS corr_uid,
           vmin, vmax
    FROM m ORDER BY event_type
    """,
    doc="Statistical aggregates (stddev/variance/correlation) per key. "
    "stddev/var are total built-ins on both engines (single row → "
    "NULL, zero variance → 0); the correlation goes through the "
    "exact-moment kernel (operators/stats.py) on 1e-6-quantized values "
    "— built-in corr() DIVIDE_BY_ZEROs under ANSI when either side has "
    "zero variance (e.g. a single-event key).",
)
def q_stats_agg(spark, sf_dir):
    from ..operators.stats import corr_from_moments, corr_moment_aggs, quantize

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        # stable_round-then-cast (operators/stats.quantize): a plain
        # double->DECIMAL cast is knife-edge-prone cross-engine
        quantize(F.col("value"), 6, "decimal(18,6)").alias("__vq"),
        F.col("user_id").cast("decimal(18,6)").alias("__uq"),
    )
    m = e.groupBy("event_type").agg(
        stable_round(F.stddev_samp("value"), 4).alias("sd"),
        stable_round(F.var_samp("value"), 4).alias("var"),
        stable_round(F.min("value"), 4).alias("vmin"),
        stable_round(F.max("value"), 4).alias("vmax"),
        # 6-digit product grid: uq is a RAW id, so the 12-digit default
        # would cross the |x·y|·10^d < 2^53 quantize domain bound at
        # user_id ≈ 3e3; digits=6 holds exactness to user_id ≈ 9.5e4.
        *corr_moment_aggs(
            F.col("__vq"), F.col("__uq"), "cu", "decimal(38,6)", 6
        ),
    )
    return m.select(
        "event_type",
        "sd",
        "var",
        stable_round(corr_from_moments("cu"), 4).alias("corr_uid"),
        "vmin",
        "vmax",
    ).orderBy("event_type")


@register(
    "q_embedding_centroids",
    """
    SELECT label, i AS dim, round(avg(embedding[i]::DOUBLE), 6) AS centroid
    FROM embeddings, range(1, 65) AS r(i)
    GROUP BY label, i
    """,
    doc="Per-label centroid (elementwise mean): posexplode → two-key agg. "
    "The k-means/IVF building block — one shuffle on (label, dim).",
)
def q_embedding_centroids(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid"))
    )


@register(
    "q_token_frequency",
    r"""
    SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
    FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    )
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 50
    """,
    doc="Corpus token frequency + document frequency, top 50 (the TF/DF "
    "primitive behind quality filters and IDF weighting).",
)
def q_token_frequency(spark, sf_dir):
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(50)
    )


@register(
    "q_date_functions",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS d,
           year(o_orderdate) AS y,
           quarter(o_orderdate) AS q,
           month(o_orderdate) AS m,
           dayofweek(o_orderdate) AS dow,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS plus_90d
    FROM orders
    WHERE o_orderkey % 10 = 0
    ORDER BY o_orderkey
    """,
    doc="F6/F7 date/time function family (parts, last_day, diff, add).",
)
def q_date_functions(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.orders.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
            # DuckDB dayofweek: 0=Sunday..6; Spark dayofweek: 1=Sunday..7
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2002"),
            F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 90), "yyyy-MM-dd").alias("plus_90d"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q_string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS uname,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           reverse(c_name) AS rname,
           levenshtein(c_name, 'Customer#000000042') AS lev42,
           length(c_name) AS name_len,
           replace(c_name, 'Customer', 'Client') AS renamed
    FROM customer
    ORDER BY c_custkey
    """,
    doc="F1/F2 string function family (case, pad, reverse, edit distance).",
)
def q_string_functions(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.customer.select(
            "c_custkey",
            F.upper("c_name").alias("uname"),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
            F.reverse("c_name").alias("rname"),
            F.levenshtein("c_name", F.lit("Customer#000000042")).alias("lev42"),
            F.length("c_name").alias("name_len"),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Client")).alias("renamed"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_cube_status",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="CUBE grouping sets over orders.",
)
def q_cube_status(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


@register(
    "q_conditional_agg",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           count(*) FILTER (WHERE event_type = 'error') AS n_errors,
           round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0.0), 4) AS purchase_value,
           count(*) AS n_total
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Conditional aggregation (FILTER clause / count_if family).",
)
def q_conditional_agg(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    return (
        e.groupBy("user_id")
        .agg(
            F.count_if(is_p).alias("n_purchases"),
            F.count_if(F.col("event_type") == "error").alias("n_errors"),
            F.round(
                F.coalesce(F.sum(F.when(is_p, F.col("value"))), F.lit(0.0)), 4
            ).alias("purchase_value"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("user_id")
    )


@register(
    "q_window_lead_first",
    """
    SELECT o_custkey, o_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           first_value(o_orderkey) OVER w AS first_orderkey,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_orderkey,
           ntile(4) OVER w AS quartile,
           rank() OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC) AS price_rank,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic window family: lead / first_value / nth_value / ntile / "
    "rank / dense_rank (decimal order key keeps rank ties engine-exact).",
)
def q_window_lead_first(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrows = w.rowsBetween(Window.unboundedPreceding, 0)
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.nth_value("o_orderkey", 2).over(wrows).alias("second_orderkey"),
        F.ntile(4).over(w).alias("quartile"),
        F.rank()
        .over(Window.partitionBy("o_custkey").orderBy(F.desc(F.col("o_totalprice").cast("decimal(18,2)"))))
        .alias("price_rank"),
        F.dense_rank()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderstatus"))
        .alias("status_rank"),
    )


@register(
    "q_array_functions",
    """
    SELECT vec_id,
           len(embedding) AS arr_len,
           round(list_sum(embedding[1:8]::DOUBLE[]), 6) AS head8_sum,
           round(list_max(embedding)::DOUBLE, 6) AS max_elem,
           round(list_min(embedding)::DOUBLE, 6) AS min_elem,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS l1_norm
    FROM embeddings
    ORDER BY vec_id
    """,
    doc="Array function family over the vector column (size/slice/fold/"
    "elementwise transform) — all JVM-side, no UDF.",
)
def q_array_functions(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("arr_len"),
        F.round(fold(F.slice(emb_d, 1, 8)), 6).alias("head8_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_elem"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_elem"),
        F.round(fold(F.transform(emb_d, lambda x: F.abs(x))), 6).alias("l1_norm"),
    ).orderBy("vec_id")


@register(
    "q_bpe_tokens",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+')) AS n_bpe_tokens,
           len(regexp_extract_all(lower(text), ' ?[0-9]+')) AS n_number_tokens
    FROM documents
    ORDER BY doc_id
    """,
    doc="BPE-ish pretokenization (GPT-2-style regex split classes): token "
    "counts per doc — the token-budget primitive for corpus planning.",
)
def q_bpe_tokens(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"), F.lit(0))).alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all(low, F.lit(" ?[0-9]+"), F.lit(0))).alias("n_number_tokens"),
    ).orderBy("doc_id")


@register(
    "q_tfidf_top_tokens",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ), stats AS (
        SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        FROM tok GROUP BY token
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT token, tf, df,
           round(tf * ln((n.n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
    FROM stats, n
    ORDER BY tfidf DESC, token
    LIMIT 25
    """,
    doc="TF-IDF weighting of corpus tokens (the IDF join is a 1-row "
    "broadcast; ln on identical doubles is engine-exact).",
)
def q_tfidf_top_tokens(spark, sf_dir):
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    # n_docs rides as a 1-row broadcast (the registry idiom), NOT a
    # driver-side .count() — one job, one documents scan at any scale
    n_row = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(n_row))
        .select(
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), "token")
        .limit(25)
    )


@register(
    "q_grouped_pandas_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 4) AS q25,
           round(quantile_cont(value, 0.75), 4) AS q75,
           round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 4) AS iqr
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="UDAF surface (SURVEY §2.10): grouped applyInPandas computing "
    "IQR quantiles in numpy — Arrow batches per group, oracle-checked "
    "against quantile_cont (numpy 'linear' interpolation is the same "
    "estimator). The pattern slot for custom per-key model aggregation.",
)
def q_grouped_pandas_quantiles(spark, sf_dir):
    import pandas as pd

    from ..session import ensure_pyfiles

    ensure_pyfiles(spark)
    e = load_table(spark, sf_dir, "events")

    def quantiles(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # NULL values arrive as NaN in the Arrow batch; np.percentile
        # would propagate them into NaN quantiles, while quantile_cont
        # (and every SQL aggregate) skips NULLs. Drop NaN first; an
        # all-null group quantiles to NULL, not NaN.
        vals = pdf["value"].to_numpy(np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            q25 = q75 = iqr = None
        else:
            r25, r75 = np.percentile(vals, [25.0, 75.0])
            q25, q75 = round(float(r25), 4), round(float(r75), 4)
            iqr = round(float(r75 - r25), 4)
        return pd.DataFrame(
            [
                {
                    "event_type": pdf["event_type"].iloc[0],
                    "q25": q25,
                    "q75": q75,
                    "iqr": iqr,
                }
            ]
        )

    return (
        e.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(quantiles, "event_type string, q25 double, q75 double, iqr double")
        .orderBy("event_type")
    )


@register(
    "q_range_join",
    """
    SELECT p.event_id AS purchase_id, count(c.event_id) AS n_recent_clicks,
           round(coalesce(sum(c.value), 0.0), 4) AS click_value
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    doc="Interval range join (the batch form of a stream-stream join with "
    "a time bound): clicks within 30 min before each purchase, per user. "
    "Equi-key on user_id carries the hash partitioning; the range bound "
    "filters within partitions.",
)
def q_range_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
        F.col("event_id").alias("c_id"),
    )
    j = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left",
    )
    return j.groupBy("purchase_id").agg(
        F.count("c_id").alias("n_recent_clicks"),
        F.round(F.coalesce(F.sum("c_value"), F.lit(0.0)), 4).alias("click_value"),
    )


@register(
    "q_pivot_counts",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Pivot (long→wide): per-user event-type count matrix via Spark's "
    "pivot with explicit values (no distinct-discovery pass at scale).",
)
def q_pivot_counts(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .orderBy("user_id")
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@register(
    "q_null_semantics",
    """
    SELECT l_orderkey, l_linenumber,
           nullif(l_discount, 0.0) AS disc_or_null,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_default,
           CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 'none' ELSE 'some' END AS disc_class,
           ifnull(nullif(l_tax, 0.0), 0.999) AS tax_default
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="NULL-handling family: nullif/coalesce/ifnull and NULL-aware CASE.",
)
def q_null_semantics(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return (
        t.lineitem.where(F.col("l_orderkey") % 100 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            disc_null.alias("disc_or_null"),
            F.coalesce(disc_null, F.lit(-1.0)).alias("disc_default"),
            F.when(disc_null.isNull(), "none").otherwise("some").alias("disc_class"),
            F.ifnull(F.nullif(F.col("l_tax"), F.lit(0.0)), F.lit(0.999)).alias("tax_default"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q_histogram_buckets",
    """
    SELECT event_type,
           CASE WHEN value < 0 THEN 0
                WHEN value >= 200.0 THEN 21
                ELSE CAST(floor(value * 20.0 / 200.0) + 1 AS INT) END AS bucket,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, bucket
    """,
    doc="Equi-width histogram via width_bucket (the profiling/binning "
    "primitive; two-key agg, map-side combined).",
)
def q_histogram_buckets(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    b = F.width_bucket("value", F.lit(0.0), F.lit(200.0), F.lit(20)).cast("int")
    return (
        e.groupBy("event_type", b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bucket")
    )


@register(
    "q_parse_date_flexible",
    """
    WITH rendered AS (
        SELECT o_orderkey,
               CASE o_orderkey % 4
                    WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                    WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
                    WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M')
                    ELSE strftime(o_orderdate, '%Y-%m-%d') END AS dstr
        FROM orders WHERE o_orderkey % 20 < 4
    )
    SELECT o_orderkey, dstr,
           epoch(coalesce(
               try_strptime(dstr, '%Y-%m-%d %H:%M:%S'),
               try_strptime(dstr, '%Y-%m-%dT%H:%M:%S'),
               try_strptime(dstr, '%Y-%m-%d %H:%M'),
               try_strptime(dstr, '%Y-%m-%d')))::BIGINT AS epoch_s
    FROM rendered
    ORDER BY o_orderkey
    """,
    doc="F6 flexible date parsing (rag_engine.py:40-57): render dates in 4 "
    "formats, recover epoch via coalesced format-ladder parse.",
)
def q_parse_date_flexible(spark, sf_dir):
    from ..functions.scalars import parse_date_flexible

    t = load_tables(spark, sf_dir)
    rendered = (
        t.orders.where(F.col("o_orderkey") % 20 < 4)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
            .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"))
            .when(F.col("o_orderkey") % 4 == 2, F.date_format("o_orderdate", "yyyy-MM-dd HH:mm"))
            .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
            .alias("dstr"),
        )
    )
    return rendered.select(
        "o_orderkey", "dstr", parse_date_flexible(F.col("dstr")).alias("epoch_s")
    ).orderBy("o_orderkey")


@register(
    "q13_order_count_distribution",
    """
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
    doc="TPC-H Q13: customer order-count distribution (outer join with an "
    "ON-clause filter, double aggregation).",
)
def q13_order_count_distribution(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o = t.orders.where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t.customer.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
    doc="TPC-H Q17: correlated scalar subquery (per-part average quantity "
    "threshold) — Catalyst decorrelates to an aggregate + join.",
)
def q17_small_quantity_revenue(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    thresholds = t.lineitem.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    p = t.part.where(F.col("p_brand") == "Brand#23")
    return (
        t.lineitem.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(thresholds, F.col("t_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS nation, count(*) AS n_custs,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    ORDER BY nation
    """,
    doc="TPC-H Q22: scalar subquery threshold + anti join (above-average-"
    "balance customers with no urgent orders).",
)
def q22_global_sales_opportunity(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t.customer.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    rich = t.customer.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("ab"))
    urgent = t.orders.where(F.col("o_orderpriority") == "1-URGENT")
    no_orders = rich.join(
        urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    return (
        no_orders.groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("nation")
    )


@register(
    "q02_min_cost_supplier",
    """
    SELECT s.s_suppkey, s.s_name, l.l_partkey AS partkey,
           round(min_price.mp, 4) AS min_price
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN (
        SELECT l2.l_partkey AS mp_partkey, min(l2.l_extendedprice / l2.l_quantity) AS mp
        FROM lineitem l2 GROUP BY l2.l_partkey
    ) AS min_price ON min_price.mp_partkey = l.l_partkey
    WHERE l.l_extendedprice / l.l_quantity = min_price.mp
      AND l.l_partkey % 20 = 0
    GROUP BY s.s_suppkey, s.s_name, l.l_partkey, min_price.mp
    ORDER BY partkey, s_suppkey
    """,
    doc="TPC-H Q2-style: supplier(s) offering the minimum unit price per "
    "part — correlated-min subquery decorrelated to an aggregate join.",
)
def q02_min_cost_supplier(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    mins = t.lineitem.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("mp")
    )
    l = t.lineitem.where(F.col("l_partkey") % 20 == 0)
    return (
        l.join(mins, F.col("mp_partkey") == F.col("l_partkey"))
        .where(unit == F.col("mp"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name", F.col("l_partkey").alias("partkey"), "mp")
        .agg(F.round(F.first("mp"), 4).alias("min_price"))
        .drop("mp")
        .orderBy("partkey", "s_suppkey")
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 2) AS total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: top supplier by quarterly revenue — view + scalar max "
    "subquery (the revenue aggregate is computed once and reused).",
)
def q15_top_supplier(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    revenue = (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        t.supplier.join(revenue, F.col("supplier_no") == F.col("s_suppkey"))
        .join(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q_range_frame_window",
    """
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 2)
               AS spend_15d,
           count(*) OVER w AS n_orders_15d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
                 RANGE BETWEEN 15 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE-framed window (value-based, not row-based): per customer, "
    "rolling 15-day spend ending at each order — the time-window analytic "
    "the reference approximates with bar-count lags (X3). Decimal-exact "
    "sum keeps the oracle bit-identical.",
)
def q_range_frame_window(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    # Day-number ordering: o_orderdate is TIMESTAMP_NTZ (wall-clock), so
    # the TZ-free epoch is a date diff — identical under any session TZ
    # on both engines (unix_timestamp would re-interpret via session TZ).
    day_num = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(day_num).rangeBetween(-15, 0)
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"), 2
        ).alias("spend_15d"),
        F.count(F.lit(1)).over(w).alias("n_orders_15d"),
    )


@register(
    "q_string_agg",
    """
    SELECT o_orderpriority AS priority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    doc="Ordered string aggregation (listagg family): sorted distinct "
    "status codes per priority (collect_set -> array_sort -> concat_ws).",
)
def q_string_agg(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("priority")
    )


@register(
    "q_unpivot_ohlc",
    """
    SELECT o_orderkey AS k, m.field, m.v
    FROM orders,
         LATERAL (VALUES ('total', o_totalprice),
                         ('key2', CAST(o_custkey AS DOUBLE))) AS m(field, v)
    WHERE o_orderkey <= 100
    ORDER BY k, field
    """,
    doc="Unpivot (wide→long): per-order measures melted to (key, field, "
    "value) rows via Spark's native unpivot/melt — the inverse of "
    "q_pivot_counts; map-only row expansion, no shuffle before the sort.",
)
def q_unpivot_ohlc(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 100)
    return (
        o.select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("total"),
            F.col("o_custkey").cast("double").alias("key2"),
        )
        .unpivot("k", ["total", "key2"], "field", "v")
        .orderBy("k", "field")
    )


@register(
    "q_sentence_explode",
    r"""
    SELECT doc_id, u.pos::INT AS pos, u.sentence
    FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(text, '\s*\btable\b\s*')) AS sentence,
               generate_subscripts(regexp_split_to_array(text, '\s*\btable\b\s*'), 1) - 1 AS pos
        FROM documents
    ) u
    WHERE length(u.sentence) > 0 AND doc_id <= 50
    ORDER BY doc_id, pos
    """,
    doc="Row-expanding text split (the UDTF shape, engine-native): split "
    "each document at a delimiter pattern and emit one row per segment "
    "with its position — posexplode(split(...)), a map-only expansion "
    "whose fan-out is data-dependent (chunking stage of a training "
    "pipeline). Delimiter = the "
    "corpus's most frequent token, so fan-out is non-trivial.",
)
def q_sentence_explode(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    parts = F.split(F.col("text"), r"\s*\btable\b\s*")
    return (
        d.select("doc_id", F.posexplode(parts).alias("pos", "sentence"))
        .where(F.length("sentence") > 0)
        .orderBy("doc_id", "pos")
    )


@register(
    "q_rank_distribution_family",
    """
    SELECT c_mktsegment, c_custkey,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pr,
           floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cd,
           dense_rank() OVER w AS dr,
           row_number() OVER w AS rn
    FROM customer
    WHERE c_custkey <= 400
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey)
    ORDER BY c_mktsegment, rn
    """,
    doc="Distribution-rank family: percent_rank / cume_dist / dense_rank "
    "/ row_number over one shared partitioning — one WindowExec, one "
    "shuffle on the segment key; decimal sort key keeps tie order "
    "engine-identical.",
)
def q_rank_distribution_family(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 400)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").cast("decimal(18,2)").desc(), "c_custkey"
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            # integer-ratio values (r/(n-1), r/n) land EXACTLY on round
            # half-boundaries once partitions are large — floor-form
            # round, not engine-native (see functions/scalars.py)
            stable_round(F.percent_rank().over(w), 6).alias("pr"),
            stable_round(F.cume_dist().over(w), 6).alias("cd"),
            F.dense_rank().over(w).alias("dr"),
            F.row_number().over(w).alias("rn"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "q_grouping_sets",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY status, priority
    """,
    doc="Explicit GROUPING SETS (beyond cube/rollup): per-status, "
    "per-priority, and grand-total aggregates in ONE pass — Spark "
    "expands to a single Expand+HashAggregate, so the fact table is "
    "scanned once however many sets are requested.",
)
def q_grouping_sets(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


from ..functions.layout import zvalue, zvalue_sql  # noqa: E402


@register(
    "q_zorder_values",
    f"""
    SELECT o_orderkey,
           {zvalue_sql("o_custkey", "datediff('day', TIMESTAMP '1992-01-01', o_orderdate)")} AS zval
    FROM orders
    ORDER BY o_orderkey
    """,
    doc="Morton z-value over (customer, order-day): the 2-D layout key "
    "behind ZORDER-style file clustering — bit interleave as a pure "
    "codegen integer expression (functions/layout.py; layout write path "
    "write_zordered range-partitions by this key so file min/max stats "
    "prune scans on EITHER dimension; clustering quality pinned in "
    "tests/test_storage.py).",
)
def q_zorder_values(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
    return (
        o.select(
            "o_orderkey",
            zvalue(F.col("o_custkey"), day, bits=16).alias("zval"),
        )
        .orderBy("o_orderkey")
    )


from ..operators.asof import asof_join  # noqa: E402


@register(
    "q_asof_join",
    f"""
    WITH clicks AS (
        SELECT event_id AS click_id, user_id, ts, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'click'
    ), purch AS (
        SELECT event_id AS purchase_id, user_id, ts,
               epoch_us(ts) AS p_ts_us, value AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.click_id, c.user_id, c.ts_us,
           p.purchase_id,
           round(p.purchase_value, 4) AS purchase_value,
           {stable_round_sql("(c.ts_us - p.p_ts_us) / 1000000.0", 2)} AS gap_sec
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.click_id
    """,
    doc="True two-table as-of join (trade-vs-quote alignment): every "
    "click matched to the user's latest prior-or-equal purchase. Engine "
    "side is the UNION + single-window form (one shuffle on the key, "
    "O(L+R) rows, no range-join pair explosion — operators/asof.py); "
    "oracle is DuckDB's native ASOF LEFT JOIN, so the differential "
    "checks our lowering against a first-class ASOF operator.",
)
def q_asof_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", ts_us.alias("ts_us")
    )
    purch = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        ts_us.alias("p_ts_us"),
        F.col("value").alias("purchase_value"),
    )
    j = asof_join(
        clicks, purch, on=["user_id"], left_ts="ts_us", right_ts="p_ts_us",
        right_cols=["purchase_id", "purchase_value"],
    )
    return j.select(
        "click_id", "user_id", "ts_us", "purchase_id",
        F.round("purchase_value", 4).alias("purchase_value"),
        stable_round((F.col("ts_us") - F.col("p_ts_us")) / 1e6, 2).alias("gap_sec"),
    ).orderBy("click_id")


@register(
    "q_approx_percentiles",
    """
    SELECT o_orderpriority,
           floor(quantile_cont(o_totalprice, 0.5)  * 100 + 0.5) / 100 AS p50,
           floor(quantile_cont(o_totalprice, 0.9)  * 100 + 0.5) / 100 AS p90,
           floor(quantile_cont(o_totalprice, 0.99) * 100 + 0.5) / 100 AS p99,
           count(*)::BIGINT AS n,
           TRUE AS sketch_rank_ok
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="GK-sketch approximate percentiles (accuracy=10000) per order "
    "priority — the constant-memory quantile path for 100 TB (exact "
    "percentile_disc shuffles every value per group; the sketch merges "
    "map-side partials). Oracle contract: the row carries the EXACT "
    "continuous percentiles (hash-matched against quantile_cont) plus a "
    "sketch verdict computed in-plan — each GK estimate must fall inside "
    "the exact [p-0.01, p+0.01] percentile bracket, which accuracy=10000 "
    "(rank error ≤ n/10000 ≪ 0.01·n) guarantees deterministically. "
    "Tolerance is additionally pinned in "
    "tests/test_analytics.py::test_approx_percentile_tolerance.",
)
def q_approx_percentiles(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    # Exact brackets for the verdict: GK's estimate is an actual data
    # value within n/10000 ranks of the target, and quantile_cont is
    # monotone, so estimate ∈ [cont(p-0.01), cont(p+0.01)] always holds
    # for an intact sketch (0.99+0.01 caps at 1.0 = max).
    brackets = [0.49, 0.51, 0.89, 0.91, 0.98, 1.0]
    agg = o.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("pcts"),
        F.percentile("o_totalprice", F.lit([0.5, 0.9, 0.99])).alias("ex"),
        F.percentile("o_totalprice", F.lit(brackets)).alias("br"),
        F.count(F.lit(1)).alias("n"),
    )
    ok = (
        (F.col("pcts")[0] >= F.col("br")[0]) & (F.col("pcts")[0] <= F.col("br")[1])
        & (F.col("pcts")[1] >= F.col("br")[2]) & (F.col("pcts")[1] <= F.col("br")[3])
        & (F.col("pcts")[2] >= F.col("br")[4]) & (F.col("pcts")[2] <= F.col("br")[5])
    )
    return agg.select(
        "o_orderpriority",
        stable_round(F.col("ex")[0], 2).alias("p50"),
        stable_round(F.col("ex")[1], 2).alias("p90"),
        stable_round(F.col("ex")[2], 2).alias("p99"),
        "n",
        ok.alias("sketch_rank_ok"),
    ).orderBy("o_orderpriority")


@register(
    "q_winsorized_stats",
    """
    WITH p AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n_events,
           round(avg(e.value), 6) AS raw_mean,
           round(avg(CASE WHEN e.value < p.p05 THEN p.p05
                          WHEN e.value > p.p95 THEN p.p95
                          ELSE e.value END), 6) AS winsorized_mean,
           sum(CASE WHEN e.value < p.p05 OR e.value > p.p95 THEN 1 ELSE 0 END)::BIGINT
               AS n_clipped
    FROM events e JOIN p ON e.event_type = p.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    doc="Winsorized (p05/p95-clipped) feature statistics per event type — "
    "the outlier-robust normalization step of a feature pipeline. Exact "
    "percentiles via Spark's `percentile` aggregate (linear interpolation, "
    "same contract as SQL percentile_cont); thresholds live in a 1-row-per-"
    "group frame broadcast back onto the fact scan, so the clip pass is "
    "map-only. Note the per-group exact percentile collects the group's "
    "values — fine for bounded group counts; q_approx_percentiles is the "
    "sketch path when groups are huge.",
)
def q_winsorized_stats(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    p = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("p05"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )
    j = e.join(F.broadcast(p), "event_type")
    clipped = (
        F.when(F.col("value") < F.col("p05"), F.col("p05"))
        .when(F.col("value") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("value"))
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("raw_mean"),
            F.round(F.avg(clipped), 6).alias("winsorized_mean"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95")), 1
                ).otherwise(0)
            ).alias("n_clipped"),
        )
        .orderBy("event_type")
    )


@register(
    "q_funnel_conversion",
    """
    WITH ev AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    v AS (SELECT user_id, min(ts) AS t_view FROM ev WHERE event_type = 'view' GROUP BY user_id),
    c AS (
        SELECT ev.user_id, min(ev.ts) AS t_click
        FROM ev JOIN v ON ev.user_id = v.user_id
        WHERE ev.event_type = 'click' AND ev.ts > v.t_view
        GROUP BY ev.user_id
    ),
    p AS (
        SELECT ev.user_id, min(ev.ts) AS t_purchase
        FROM ev JOIN c ON ev.user_id = c.user_id
        WHERE ev.event_type = 'purchase' AND ev.ts > c.t_click
        GROUP BY ev.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked,
           (SELECT count(*) FROM p) AS n_purchased,
           round(CAST((SELECT count(*) FROM c) AS DOUBLE)
                 / greatest((SELECT count(*) FROM v), 1), 6) AS click_rate,
           round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                 / greatest((SELECT count(*) FROM c), 1), 6) AS purchase_rate
    """,
    doc="Ordered funnel analysis (view -> later click -> later purchase): "
    "each stage is the min event time strictly after the previous stage's "
    "time, per user. Spark side is ONE scan of the event log: shuffle by "
    "user, one ordered-window pass computes running first-view / first-"
    "qualifying-click / first-qualifying-purchase (stage membership is a "
    "ts comparison, so intra-timestamp row order can't change the "
    "result), then a per-user agg and a tiny global rollup. The oracle "
    "spells the same semantics as chained min-agg joins.",
)
def q_funnel_conversion(spark, sf_dir):
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.select("user_id", "event_type", "ts").withColumn(
        "t_view_so_far", first_view
    )
    first_click = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t_view_so_far")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_click_so_far", first_click)
    qualifies_purchase = (
        (F.col("event_type") == "purchase")
        & (F.col("ts") > F.col("t_click_so_far"))
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("t_view_so_far").isNotNull()).alias("viewed"),
        F.max(F.col("t_click_so_far").isNotNull()).alias("clicked"),
        F.max(qualifies_purchase).alias("purchased"),
    )
    counts = per_user.agg(
        F.sum(F.col("viewed").cast("long")).alias("n_viewed"),
        F.sum(F.col("clicked").cast("long")).alias("n_clicked"),
        F.sum(F.col("purchased").cast("long")).alias("n_purchased"),
    )
    return counts.select(
        "n_viewed",
        "n_clicked",
        "n_purchased",
        F.round(
            F.col("n_clicked").cast("double") / F.greatest("n_viewed", F.lit(1)), 6
        ).alias("click_rate"),
        F.round(
            F.col("n_purchased").cast("double") / F.greatest("n_clicked", F.lit(1)), 6
        ).alias("purchase_rate"),
    )


@register(
    "q_cohort_retention",
    """
    WITH act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    first_seen AS (
        SELECT user_id, min(d) AS cohort FROM act GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort, count(*) AS n_cohort FROM first_seen GROUP BY cohort
    )
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, a.d) AS INT) AS day_offset,
           count(*) AS n_active,
           round(CAST(count(*) AS DOUBLE) / max(s.n_cohort), 6) AS retention
    FROM act a
    JOIN first_seen f ON a.user_id = f.user_id
    JOIN sizes s ON s.cohort = f.cohort
    WHERE date_diff('day', f.cohort, a.d) <= 7
    GROUP BY f.cohort, CAST(date_diff('day', f.cohort, a.d) AS INT)
    ORDER BY f.cohort, day_offset
    """,
    doc="Cohort retention: users grouped by first-active date, activity "
    "counted per day-offset (0-7), retention = active/cohort-size. The "
    "distinct (user, day) projection collapses the event log FIRST (the "
    "only pass over the big table); everything after operates on "
    "users x days rows. Joins share the user_id key; cohort sizes are a "
    "broadcast-scale dim.",
)
def q_cohort_retention(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    act = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    first_seen = act.groupBy("user_id").agg(F.min("d").alias("cohort"))
    sizes = first_seen.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
    off = F.datediff(F.col("d"), F.col("cohort")).cast("int")
    return (
        act.join(first_seen, "user_id")
        .withColumn("day_offset", off)
        .where(F.col("day_offset") <= 7)
        .join(F.broadcast(sizes), "cohort")
        .groupBy("cohort", "day_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.round(F.count(F.lit(1)).cast("double") / F.max("n_cohort"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort", "day_offset")
    )


@register(
    "q_sketch_reaggregation",
    """
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS exact_users,
           count(DISTINCT CAST(ts AS DATE))::BIGINT AS n_daily_sketches,
           TRUE AS union_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Mergeable-sketch distinct counting (Apache DataSketches HLL via "
    "hll_sketch_agg / hll_union_agg / hll_sketch_estimate): build one "
    "binary sketch per (event_type, day) — the STORABLE partial a 100 TB "
    "pipeline writes per partition/day — then union-merge the partials "
    "per event_type and estimate. This is the capability "
    "approx_count_distinct (q_approx_distinct) lacks: its HLL++ buffers "
    "are plan-internal, so cross-job/cross-day reaggregation is "
    "impossible, while DataSketches partials can be stored and merged "
    "hierarchically without touching raw rows again. Oracle contract: "
    "exact per-type distinct users and the daily-partial count are "
    "hash-matched; the union estimate must land within "
    "max(5%·exact, 2) of exact (lgConfigK=12 ⇒ rsd≈1.6%, "
    "deterministic — the sketch is a pure function of the value set).",
)
def q_sketch_reaggregation(spark, sf_dir):
    from ..operators.sketches import hll_partials

    e = load_table(spark, sf_dir, "events")
    daily = hll_partials(
        e, "user_id", ["event_type", F.to_date("ts").alias("day")]
    )
    # hll_merge_estimate inlined here because the contract also counts
    # the partials it merged (n_daily_sketches) in the same aggregate.
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_daily_sketches"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            F.col("exact_users").cast("long").alias("exact_users"),
            F.col("n_daily_sketches").cast("long").alias("n_daily_sketches"),
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(F.lit(2.0), F.col("exact_users") * 0.05)
            ).alias("union_within_5pct"),
        )
        .orderBy("event_type")
    )


@register(
    "q_kll_quantile_merge",
    """
    SELECT count(*)::BIGINT AS n,
           floor(quantile_cont(o_totalprice, 0.25) * 100 + 0.5) / 100 AS p25,
           floor(quantile_cont(o_totalprice, 0.50) * 100 + 0.5) / 100 AS p50,
           floor(quantile_cont(o_totalprice, 0.75) * 100 + 0.5) / 100 AS p75,
           TRUE AS kll_rank_ok
    FROM orders
    """,
    doc="Mergeable-sketch quantiles (DataSketches KLL, k=800): build one "
    "binary sketch per hash shard — the storable per-partition partial — "
    "then fold the shard sketches into one with the scalar "
    "kll_sketch_merge_double (an array reduce over collect_list; the "
    "shard count is fixed and small, so the fold is O(shards) on 8 tiny "
    "binaries, never corpus rows) and probe p25/p50/p75. Oracle "
    "contract: exact continuous quantiles hash-matched via the "
    "engine-portable stable rounding, plus an in-plan verdict that each "
    "KLL estimate falls inside the exact [p-0.02, p+0.02] rank bracket "
    "(k=800 ⇒ 99%-confidence rank error ≈0.56%, so the 2% bracket holds "
    "with overwhelming margin despite KLL's randomized compaction). The "
    "exact side's global percentile buffers all values in one reducer — "
    "contract-only; the KLL side IS the 100 TB path.",
)
def q_kll_quantile_merge(spark, sf_dir):
    from ..operators.sketches import kll_merged_quantiles, kll_partials

    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    shards = kll_partials(
        o, price, [F.pmod(F.xxhash64("o_orderkey"), F.lit(8)).alias("shard")],
        k=800,
    )
    probes = [0.25, 0.50, 0.75]
    brackets = [0.23, 0.27, 0.48, 0.52, 0.73, 0.77]
    exact = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile(price, F.lit(probes)).alias("ex"),
        F.percentile(price, F.lit(brackets)).alias("br"),
    )
    merged = kll_merged_quantiles(shards, probes)
    ok = F.lit(True)
    for i in range(len(probes)):
        ok = ok & (
            (F.col(f"q_{i}") >= F.col("br")[2 * i])
            & (F.col(f"q_{i}") <= F.col("br")[2 * i + 1])
        )
    # 1-row exact aggregate × 1-row merged sketch: the allowlisted
    # scalar-broadcast cross join.
    return exact.crossJoin(F.broadcast(merged)).select(
        "n",
        stable_round(F.col("ex")[0], 2).alias("p25"),
        stable_round(F.col("ex")[1], 2).alias("p50"),
        stable_round(F.col("ex")[2], 2).alias("p75"),
        ok.alias("kll_rank_ok"),
    )


@register(
    "q_rolling_distinct",
    """
    WITH ed AS (
        SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
        FROM events
    ), days AS (
        SELECT DISTINCT event_type, day FROM ed
    )
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS users_7d
    FROM days d
    JOIN ed e ON e.event_type = d.event_type
             AND e.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.event_type, d.day
    ORDER BY d.event_type, d.day
    """,
    doc="Rolling 7-day distinct users per event type — the windowed "
    "COUNT(DISTINCT) SQL windows can't express and a naive range self-"
    "join makes quadratic. Lowered to linear row growth: dedup to "
    "(type, user, active-day), EXPLODE each activity onto the <= 7 "
    "window-end days it can serve (sequence + explode), dedup again, "
    "and hash-count per (type, day) — exactly 7x the deduped activity "
    "rows, shuffled on (type, day), joined back to observed days. At "
    "100 TB this stays two hash aggregates + one map-side explode; no "
    "range join, no per-key window sort.",
)
def q_rolling_distinct(spark, sf_dir):
    e = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
    )
    contrib = e.select(
        "event_type",
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("day"),
    ).distinct()
    counts = contrib.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("users_7d")
    )
    days = e.select("event_type", "day").distinct()
    return (
        counts.join(days, ["event_type", "day"])
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "users_7d",
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_mad_outliers",
    """
    WITH o AS (
        SELECT c_mktsegment AS segment, o_totalprice AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
    ), med AS (
        SELECT segment, quantile_cont(x, 0.5) AS med FROM o GROUP BY segment
    ), dev AS (
        SELECT o.segment, x, med, abs(x - med) AS adev
        FROM o JOIN med USING (segment)
    ), mad AS (
        SELECT segment, any_value(med) AS med, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY segment
    )
    SELECT d.segment,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(m.med), 4) AS med,
           round(any_value(m.mad), 4) AS mad,
           CAST(count(*) FILTER (d.adev > 4.4478 * m.mad) AS BIGINT)
               AS n_outliers,
           floor(CAST(count(*) FILTER (d.adev > 4.4478 * m.mad) AS DOUBLE)
                 / count(*) * 1000000 + 0.5) / 1000000 AS outlier_pct
    FROM dev d JOIN mad m USING (segment)
    GROUP BY d.segment ORDER BY d.segment
    """,
    doc="Robust outlier detection per market segment: median / MAD "
    "(median absolute deviation) on order totals, flagging "
    "|x - med| > 3 * 1.4826 * MAD (the normal-consistent robust "
    "z > 3). Two exact-percentile aggregates with the 5-row medians "
    "broadcast back between passes — three scans, no window. Exact "
    "percentile concentrates each segment into one task; at 100 TB "
    "the same plan swaps percentile() for approx_percentile / the "
    "q_kll_quantile_merge sketch lifecycle (stated trade: exactness "
    "here, sketch at scale).",
)
def q_mad_outliers(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    o = t.orders.join(
        t.customer, F.col("o_custkey") == F.col("c_custkey")
    ).select(F.col("c_mktsegment").alias("segment"), F.col("o_totalprice").alias("x"))
    med = o.groupBy("segment").agg(F.expr("percentile(x, 0.5)").alias("med"))
    dev = o.join(F.broadcast(med), "segment").withColumn(
        "adev", F.abs(F.col("x") - F.col("med"))
    )
    mad = dev.groupBy("segment").agg(
        F.first("med").alias("med"),
        F.expr("percentile(adev, 0.5)").alias("mad"),
    )
    out_flag = F.col("adev") > F.lit(4.4478) * F.col("mad")
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "segment")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.sum(out_flag.cast("long")).alias("n_outliers"),
            stable_round(
                F.sum(out_flag.cast("long")).cast("double") / F.count(F.lit(1)), 6
            ).alias("outlier_pct"),
        )
        .orderBy("segment")
    )


_BENFORD_EXP = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}

_BENFORD_CASE = "CASE d " + " ".join(
    f"WHEN {d} THEN {p!r}::DOUBLE" for d, p in _BENFORD_EXP.items()
) + " END"


@register(
    "q_benford",
    f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                           1, 1) AS BIGINT) AS d
        FROM orders
    ), c AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
    )
    SELECT d, n,
           floor(CAST(n AS DOUBLE) / (SELECT sum(n) FROM c)
                 * 1000000 + 0.5) / 1000000 AS obs_freq,
           floor(({_BENFORD_CASE}) * 1000000 + 0.5) / 1000000 AS exp_freq,
           floor((CAST(n AS DOUBLE) / (SELECT sum(n) FROM c)
                  - ({_BENFORD_CASE})) * 1000000 + 0.5) / 1000000 AS dev
    FROM c ORDER BY d
    """,
    doc="Benford's-law data-quality audit on order totals: observed "
    "first-significant-digit distribution vs log10(1+1/d), with "
    "per-digit deviation — the classic fabricated-data screen. The "
    "digit comes from the bigint integer part rendered as a string "
    "(portable across engines; no float log10 at power-of-ten "
    "boundaries). One 9-group hash aggregate + a 1-row total "
    "broadcast; expected frequencies are shared literal constants.",
)
def q_benford(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    digits = t.orders.select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("long")
        .alias("d")
    )
    c = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("total"))
    expr = None
    for d, p in _BENFORD_EXP.items():
        expr = (
            F.when(F.col("d") == d, F.lit(p))
            if expr is None
            else expr.when(F.col("d") == d, F.lit(p))
        )
    obs = F.col("n").cast("double") / F.col("total")
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            stable_round(obs, 6).alias("obs_freq"),
            stable_round(expr, 6).alias("exp_freq"),
            stable_round(obs - expr, 6).alias("dev"),
        )
        .orderBy("d")
    )


@register(
    "q_fuzzy_match",
    """
    WITH names AS (
        SELECT DISTINCT p_name FROM part
    ), b AS (
        SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM names
    )
    SELECT a.p_name AS name_a, b2.p_name AS name_b,
           CAST(levenshtein(a.p_name, b2.p_name) AS BIGINT) AS dist
    FROM b a JOIN b b2 ON a.blk = b2.blk AND a.p_name < b2.p_name
    WHERE levenshtein(a.p_name, b2.p_name) <= 4
    ORDER BY name_a, name_b
    """,
    doc="Blocked fuzzy record linkage on part names: dedup to distinct "
    "names, block on the first token, and emit within-block pairs "
    "with edit distance <= 4 (ordered a < b). Blocking is the "
    "standard linkage scale move — the quadratic is confined to "
    "within-block pairs (an equi-join shuffle on the block key, "
    "never all-pairs); at 100 TB add a block-size cap exactly like "
    "dedup's max_bucket. Levenshtein runs JVM-side (built-in), no "
    "Python in the pair loop.",
)
def q_fuzzy_match(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    names = t.part.select("p_name").distinct()
    b = names.withColumn("blk", F.split(F.col("p_name"), " ").getItem(0))
    a = b.select(F.col("p_name").alias("name_a"), F.col("blk"))
    c = b.select(F.col("p_name").alias("name_b"), F.col("blk"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(c, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .where(dist <= 4)
        .select("name_a", "name_b", dist.cast("long").alias("dist"))
        .orderBy("name_a", "name_b")
    )


def _pagerank_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    """Unrolled PageRank SQL mirroring operators/graph.pagerank exactly
    (same teleport literal, same precomputed 1/outdeg multiply)."""
    tele = repr(1.0 - damping)
    d = repr(damping)
    cte = [
        """
    WITH edges AS (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                        's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges
        )
    ), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, 1.0 / count(*) AS inv FROM edges GROUP BY src),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        cte.append(f"""
    , c{i} AS (
        SELECT e.dst, sum(r.rank * d.inv) AS contrib
        FROM edges e
        JOIN r{i - 1} r ON e.src = r.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
    ), r{i} AS (
        SELECT nd.node,
               {tele} / (SELECT n FROM nn)
                   + {d} * coalesce(c.contrib, 0.0) AS rank
        FROM nodes nd LEFT JOIN c{i} c ON nd.node = c.dst
    )""")
    cte.append(f"""
    SELECT node, round(rank, 8) AS rank
    FROM r{iterations}
    WHERE node LIKE 's%'
    ORDER BY node
    """)
    return "".join(cte)


@register(
    "q_pagerank",
    _pagerank_oracle(iterations=3, damping=0.85),
    doc="Supplier centrality: 3-iteration PageRank (d=0.85) on the "
    "customer->supplier edge graph derived from orders x lineitem "
    "(distinct pairs, namespaced node ids). Each iteration is one "
    "edges-to-ranks equi-join on src + one hash aggregate on dst + "
    "one left join to the node set — key-partitioned shuffles only; "
    "edges join-weights are built ONCE and reused, the node count is "
    "a 1-row broadcast contract scalar, and nothing collects to the "
    "driver. Dangling customers contribute nothing (simplified "
    "variant; ordering unaffected). Convergence-driven runs add the "
    "CC-style eager checkpoint every k rounds. operators/graph.py.",
)
def q_pagerank(spark, sf_dir):
    from ..operators.graph import pagerank

    t = load_tables(spark, sf_dir)
    # NUMERIC node ids through the whole iteration: custkey·2 (even) /
    # suppkey·2+1 (odd) is injective across the two key spaces, so the
    # edge distinct, node distinct, degree aggregate, and every
    # per-iteration join/aggregate shuffle 8-byte longs instead of
    # namespaced strings (the 'c…'/'s…' rendering is a pure projection
    # applied ONCE to the k-row result). Same graph, same rank
    # arithmetic, ~35% less edge-derivation wall (string concat+hash
    # dominated the shuffle write at every SF). The one-decade-up sweep
    # runs keys to ~1e9 — ·2 stays far inside LONG.
    edges = (
        t.orders.select("o_orderkey", "o_custkey")
        .join(
            t.lineitem.select("l_orderkey", "l_suppkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    # broadcast_ranks: this bipartite order graph has |nodes| (customers
    # + suppliers) two orders of magnitude under |edges| at every SF —
    # shipping the rank frame beats re-shuffling the pinned edges 3×.
    out = pagerank(edges, iterations=3, damping=0.85, broadcast_ranks=True)
    return (
        out.where(F.col("node") % 2 == 1)
        .select(
            F.concat(
                F.lit("s"), F.shiftright(F.col("node"), 1).cast("string")
            ).alias("node"),
            F.round("rank", 8).alias("rank"),
        )
        .orderBy("node")
    )


@register(
    "q_customer_deciles",
    f"""
    WITH spend AS (
        SELECT o_custkey AS custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS spend
        FROM orders GROUP BY o_custkey
    ), bounds AS (
        SELECT quantile_cont(spend, 0.1) AS q1, quantile_cont(spend, 0.2) AS q2,
               quantile_cont(spend, 0.3) AS q3, quantile_cont(spend, 0.4) AS q4,
               quantile_cont(spend, 0.5) AS q5, quantile_cont(spend, 0.6) AS q6,
               quantile_cont(spend, 0.7) AS q7, quantile_cont(spend, 0.8) AS q8,
               quantile_cont(spend, 0.9) AS q9
        FROM spend
    ), assigned AS (
        SELECT custkey, spend,
               1 + CAST(spend > q1 AS INT) + CAST(spend > q2 AS INT)
                 + CAST(spend > q3 AS INT) + CAST(spend > q4 AS INT)
                 + CAST(spend > q5 AS INT) + CAST(spend > q6 AS INT)
                 + CAST(spend > q7 AS INT) + CAST(spend > q8 AS INT)
                 + CAST(spend > q9 AS INT) AS decile
        FROM spend, bounds
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           -- per-decile rollups re-enter DECIMAL (each spend is a grid
           -- value: exact cast, order-free sums); the decimal->double
           -- casts use the split idiom — DuckDB's direct wide-decimal
           -- cast double-rounds past 2^53 (functions/scalars.py
           -- decimal_to_double_split, self-review catch)
           {decimal_to_double_split_sql('sum(CAST(spend AS DECIMAL(18,2)))')}
               AS total_spend,
           floor({decimal_to_double_split_sql('sum(CAST(spend AS DECIMAL(18,2)))')}
                 / count(*) * 100 + 0.5) / 100 AS avg_spend,
           floor({decimal_to_double_split_sql('sum(CAST(spend AS DECIMAL(18,2)))')}
                 / (SELECT {decimal_to_double_split_sql('sum(CAST(spend AS DECIMAL(18,2)))')}
                    FROM spend)
                 * 1000000 + 0.5) / 1000000 AS revenue_share
    FROM assigned GROUP BY decile ORDER BY decile
    """,
    doc="Customer-value decile table (the lift/Pareto report): decile "
    "assignment WITHOUT a global ntile window — decile boundaries come "
    "from one exact-percentile aggregate (a 1-row broadcast), and each "
    "customer is assigned by boundary comparisons, fully parallel. At "
    "100 TB the identical plan swaps percentile() for approx_percentile "
    "(sketch boundaries) — no total sort ever happens. Spend sums are "
    "DECIMAL-exact so boundary comparisons are engine-stable; only the "
    "per-decile double rollups round.",
)
def q_customer_deciles(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    spend = t.orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend")
    )
    bounds = spend.agg(
        *[
            F.expr(f"percentile(spend, {q / 10})").alias(f"q{q}")
            for q in range(1, 10)
        ]
    )
    decile = F.lit(1)
    for q in range(1, 10):
        decile = decile + (F.col("spend") > F.col(f"q{q}")).cast("int")
    assigned = spend.crossJoin(F.broadcast(bounds)).select(
        "custkey", "spend", decile.cast("long").alias("decile")
    )
    # Rollups re-enter DECIMAL: each spend double IS a 0.01-grid value,
    # so the cast back is exact and the sums are order-free (a double
    # re-sum would be engine-order-dependent before the final rounds);
    # the decimal->double cast uses the split idiom (DuckDB's direct
    # wide-decimal cast double-rounds past 2^53).
    dsum = decimal_to_double_split(F.sum(F.col("spend").cast("decimal(18,2)")))
    total = spend.agg(dsum.alias("grand"))
    return (
        assigned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum.alias("total_spend"),
            stable_round(dsum / F.count(F.lit(1)), 2).alias("avg_spend"),
            dsum.alias("__sum"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            "total_spend",
            "avg_spend",
            stable_round(F.col("__sum") / F.col("grand"), 6).alias("revenue_share"),
        )
        .orderBy("decile")
    )


@register(
    "q_market_basket",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), pairs AS (
        SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS support
        FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY a.pk, b.pk
    ), pc AS (
        SELECT pk, count(*) AS n FROM items GROUP BY pk
    ), tot AS (
        SELECT CAST(count(DISTINCT ok) AS DOUBLE) AS n_orders FROM items
    )
    SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
           floor(CAST(support AS DOUBLE) / pa.n * 1000000 + 0.5) / 1000000
               AS confidence,
           floor(CAST(support AS DOUBLE) * (SELECT n_orders FROM tot)
                 / (pa.n * pb.n) * 1000000 + 0.5) / 1000000 AS lift
    FROM pairs
    JOIN pc pa ON part_a = pa.pk
    JOIN pc pb ON part_b = pb.pk
    WHERE support >= 3
    ORDER BY support DESC, part_a, part_b
    """,
    doc="Market-basket association mining: co-ordered part pairs with "
    "support >= 3, plus confidence(a->b) and lift. The pair fan-out is "
    "a self-join on the ORDER key — quadratic only within a basket, "
    "and basket size is bounded (7 lineitems in TPC-H, a per-basket "
    "cap at 100 TB, same guard as dedup's max_bucket) — so growth is "
    "linear in orders. Item/pair/total counts are three hash "
    "aggregates; the ratios are exact-integer divisions (engine-"
    "stable), part marginals join back on the part key.",
)
def q_market_basket(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    items = t.lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = items.select("ok", F.col("pk").alias("part_a"))
    b = items.select("ok", F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    pc = items.groupBy("pk").agg(F.count(F.lit(1)).alias("n"))
    tot = items.agg(
        F.countDistinct("ok").cast("double").alias("n_orders")
    )
    s = F.col("support").cast("double")
    return (
        pairs.where(F.col("support") >= 3)
        .join(pc.select(F.col("pk").alias("part_a"), F.col("n").alias("n_a")), "part_a")
        .join(pc.select(F.col("pk").alias("part_b"), F.col("n").alias("n_b")), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "support",
            stable_round(s / F.col("n_a"), 6).alias("confidence"),
            stable_round(
                s * F.col("n_orders") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
    )


@register(
    "q_triangles",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), e AS (
        SELECT a.pk AS pa, b.pk AS pb
        FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY a.pk, b.pk HAVING count(*) >= 2
    ), t AS (
        SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        FROM e e1
        JOIN e e2 ON e1.pb = e2.pa
        JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ), corners AS (
        SELECT a AS node FROM t
        UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_tri
    FROM corners GROUP BY node ORDER BY node
    """,
    doc="Per-part triangle participation in the co-order graph (parts "
    "co-ordered >= 2 times): the community-density signal on top of "
    "q_market_basket's pairs. Edges canonicalize to a < b, each "
    "triangle forms once by closing the (a,b)+(b,c) wedge with (a,c) "
    "— two equi-joins on node ids, never non-edge enumeration; the "
    "degree-ordered orientation (O(E^1.5) wedge bound) is the stated "
    "skew upgrade at 100 TB. operators/graph.py.",
)
def q_triangles(spark, sf_dir):
    from ..operators.graph import triangle_count

    t = load_tables(spark, sf_dir)
    items = t.lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = items.select("ok", F.col("pk").alias("pa"))
    b = items.select("ok", F.col("pk").alias("pb"))
    edges = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup"))
        .where(F.col("sup") >= 2)
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    return triangle_count(edges).orderBy("node")


@register(
    "q_last_touch",
    """
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type, value,
               CASE WHEN event_type <> 'purchase' THEN event_id END
                   AS touch_id,
               CASE WHEN event_type <> 'purchase' THEN event_type END
                   AS touch_type,
               CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END
                   AS touch_us
        FROM events
    ), attributed AS (
        SELECT user_id, event_id, ts, event_type, value,
               last_value(touch_id IGNORE NULLS) OVER w AS touch_id,
               last_value(touch_type IGNORE NULLS) OVER w AS touch_type,
               last_value(touch_us IGNORE NULLS) OVER w AS touch_us
        FROM ordered
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           CAST(round(value, 2) AS DOUBLE) AS amount,
           touch_id, touch_type,
           CASE WHEN touch_us IS NOT NULL
                THEN epoch_us(ts) - touch_us END AS latency_us
    FROM attributed
    WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """,
    doc="Last-touch attribution: each purchase joined to the user's "
    "most recent PRIOR non-purchase event and the latency to it — the "
    "marketing-attribution primitive. No as-of join needed: one "
    "(user, ts, seq) window with last_value(IGNORE NULLS) over "
    "ROWS ... 1 PRECEDING carries the latest touch forward in the "
    "same pass that reads the purchases (the q_asof_join union+window "
    "lowering specialized to same-table attribution). Latency is an "
    "exact integer microsecond difference.",
)
def q_last_touch(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    is_touch = F.col("event_type") != "purchase"
    staged = e.withColumns(
        {
            "__tid": F.when(is_touch, F.col("event_id")),
            "__ttype": F.when(is_touch, F.col("event_type")),
            "__tus": F.when(is_touch, F.unix_micros("ts")),
        }
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    att = staged.withColumns(
        {
            "touch_id": F.last("__tid", ignorenulls=True).over(w),
            "touch_type": F.last("__ttype", ignorenulls=True).over(w),
            "__touch_us": F.last("__tus", ignorenulls=True).over(w),
        }
    )
    return (
        att.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("amount"),
            "touch_id",
            "touch_type",
            F.when(
                F.col("__touch_us").isNotNull(),
                F.unix_micros("ts") - F.col("__touch_us"),
            ).alias("latency_us"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q_scd2_history",
    """
    WITH s AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), r AS (
        SELECT user_id, ts, event_type,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
        FROM s
    ), runs AS (
        SELECT user_id, CAST(version AS BIGINT) AS version,
               min(event_type) AS state,
               min(ts) AS valid_from,
               count(*) AS n_events
        FROM r GROUP BY user_id, version
    )
    SELECT user_id, version, state, n_events,
           epoch_us(valid_from) AS valid_from_us,
           epoch_us(lead(valid_from) OVER h) AS valid_to_us,
           CAST(lead(valid_from) OVER h IS NULL AS INT) AS is_current
    FROM runs
    WINDOW h AS (PARTITION BY user_id ORDER BY version)
    ORDER BY user_id, version
    """,
    doc="SCD Type-2 history build — the audit-trail dual of the "
    "engine's keep-last upserts (S4/S6/X7 keep only the latest state; "
    "a warehouse dimension keeps every state WITH its validity "
    "interval). Tracks each user's event_type as the slowly changing "
    "attribute: consecutive equal states collapse into one version row "
    "(change flag = lag IS DISTINCT FROM current, version = running "
    "sum of flags — the sessionize lowering applied to value changes "
    "instead of time gaps), valid_from = the run's first timestamp, "
    "valid_to = the NEXT version's valid_from (null = current row, "
    "half-open intervals that tile the timeline exactly). Validity "
    "bounds exported as epoch microseconds (BIGINT — engine-neutral). "
    "One shuffle on user_id serves both window passes and the "
    "per-version rollup; at 100 TB this is the standard one-pass "
    "dimension-history rebuild, no self-join.",
)
def q_scd2_history(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("event_type").over(w)
    # ~eqNullSafe == IS DISTINCT FROM: a null state is a real (distinct)
    # state, and the first row (prev null) always opens version 1.
    chg = F.when(~prev.eqNullSafe(F.col("event_type")), 1).otherwise(0)
    runs = (
        e.withColumn("__chg", chg)
        .withColumn("version", F.sum("__chg").over(run))
        .groupBy("user_id", "version")
        .agg(
            F.min("event_type").alias("state"),
            F.min("ts").alias("__valid_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    h = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("__valid_from").over(h)
    return runs.select(
        "user_id",
        "version",
        "state",
        "n_events",
        F.unix_micros("__valid_from").alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        nxt.isNull().cast("int").alias("is_current"),
    ).orderBy("user_id", "version")


@register(
    "q_gini_pareto",
    """
    WITH spend AS (
        SELECT c.c_mktsegment AS segment, c.c_custkey,
               coalesce(sum(CAST(o.o_totalprice AS DECIMAL(28,2))), 0)
                   AS spend
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT segment, spend,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY spend, c_custkey) AS i,
               count(*) OVER (PARTITION BY segment) AS n
        FROM spend
    )
    SELECT segment,
           CAST(max(n) AS BIGINT) AS n_customers,
           floor((2.0 * CAST(sum(i * spend) AS DOUBLE)
                  / (max(n) * CAST(sum(spend) AS DOUBLE))
                  - (max(n) + 1.0) / max(n)) * 1000000 + 0.5) / 1000000
               AS gini,
           floor(CAST(sum(CASE WHEN i > max_n - CAST(floor(max_n / 5.0) AS BIGINT)
                               THEN spend ELSE 0 END) AS DOUBLE)
                 / CAST(sum(spend) AS DOUBLE) * 1000000 + 0.5) / 1000000
               AS top20_share
    FROM (SELECT *, max(n) OVER (PARTITION BY segment) AS max_n FROM ranked)
    GROUP BY segment
    ORDER BY segment
    """,
    doc="Revenue-inequality profile per market segment: exact Gini "
    "coefficient by the rank formula 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over "
    "customers sorted ascending by spend (custkey tiebreak — fully "
    "deterministic), plus the Pareto top-20%% revenue share. Spend "
    "accumulates in DECIMAL(28,2) and i·xᵢ in DECIMAL, so both sums "
    "are exact and order-insensitive; the only float math is the final "
    "per-segment scalar expression. One shuffle to aggregate spend, "
    "one segment-partitioned sort — segments parallelize; no driver "
    "iteration.",
)
def q_gini_pareto(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        cust.join(
            orders, orders.o_custkey == cust.c_custkey, "left"
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"), "c_custkey"
        )
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(28,2)")),
                F.lit(0).cast("decimal(38,2)"),
            ).alias("spend")
        )
    )
    w = Window.partitionBy("segment").orderBy("spend", "c_custkey")
    seg = Window.partitionBy("segment")
    ranked = spend.select(
        "segment",
        "spend",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(seg).alias("n"),
    )
    gini = (
        F.lit(2.0)
        * F.sum(F.col("i") * F.col("spend")).cast("double")
        / (F.max("n") * F.sum("spend").cast("double"))
        - (F.max("n") + F.lit(1.0)) / F.max("n")
    )
    # top-20% share needs the cutoff INSIDE the conditional sum: compute
    # max_n as a window column first (mirrors the oracle's nested select).
    ranked = ranked.withColumn("max_n", F.max("n").over(seg))
    top_share = (
        F.sum(
            F.when(
                F.col("i")
                > F.col("max_n") - F.floor(F.col("max_n") / F.lit(5.0)).cast("long"),
                F.col("spend"),
            ).otherwise(F.lit(0).cast("decimal(38,2)"))
        ).cast("double")
        / F.sum("spend").cast("double")
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            stable_round(gini, 6).alias("gini"),
            stable_round(top_share, 6).alias("top20_share"),
        )
        .orderBy("segment")
    )


@register(
    "q_group_mode",
    """
    WITH counts AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
               count(*) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT segment, priority, cnt,
               sum(cnt) OVER (PARTITION BY segment) AS seg_total,
               row_number() OVER (PARTITION BY segment
                                  ORDER BY cnt DESC, priority) AS rk
        FROM counts
    )
    SELECT segment, priority AS mode_priority,
           CAST(cnt AS BIGINT) AS mode_count,
           floor(cnt / CAST(seg_total AS DOUBLE) * 1000000 + 0.5) / 1000000
               AS mode_share
    FROM ranked WHERE rk = 1
    ORDER BY segment
    """,
    doc="Grouped MODE (most frequent value): the modal order priority "
    "per market segment with its count and share, ties broken "
    "lexicographically by priority (deterministic). Two hash "
    "aggregates + a top-1 window over the tiny (segment, priority) "
    "grid — the raw rows are reduced before any window touches them, "
    "so the sort input is O(segments × priorities), not O(orders).",
)
def q_group_mode(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    seg = Window.partitionBy("segment")
    rk = Window.partitionBy("segment").orderBy(F.desc("cnt"), "priority")
    return (
        counts.withColumn("seg_total", F.sum("cnt").over(seg))
        .withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select(
            "segment",
            F.col("priority").alias("mode_priority"),
            F.col("cnt").cast("long").alias("mode_count"),
            stable_round(
                F.col("cnt") / F.col("seg_total").cast("double"), 6
            ).alias("mode_share"),
        )
        .orderBy("segment")
    )


@register(
    "q_supplier_overlap",
    """
    WITH sp AS (
        SELECT DISTINCT l_suppkey AS a, l_partkey AS i FROM lineitem
    ), sizes AS (
        SELECT a, count(*) AS n_items FROM sp GROUP BY a
    ), df_ok AS (
        SELECT i FROM sp GROUP BY i HAVING count(*) <= 50
    ), pruned AS (
        SELECT sp.a, sp.i FROM sp JOIN df_ok USING (i)
    ), pairs AS (
        SELECT l.a AS a, r.a AS b, count(*) AS common
        FROM pruned l JOIN pruned r ON l.i = r.i AND l.a < r.a
        GROUP BY 1, 2
    )
    SELECT p.a, p.b, CAST(p.common AS BIGINT) AS common,
           CAST(sa.n_items AS BIGINT) AS na,
           CAST(sb.n_items AS BIGINT) AS nb,
           floor(p.common
                 / CAST(sa.n_items + sb.n_items - p.common AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.a = p.a
    JOIN sizes sb ON sb.a = p.b
    ORDER BY floor(p.common
                 / CAST(sa.n_items + sb.n_items - p.common AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 DESC, p.a, p.b
    LIMIT 25
    """,
    doc="Node-similarity on the supplier↔part bipartite graph: top-25 "
    "supplier pairs by Jaccard of their part sets. Inverted-index "
    "lowering (the dedup-family discipline): per-part ordered pairs "
    "with a document-frequency cap (parts spread over >50 suppliers "
    "are pruned — O(df²) pairs, negligible signal), so pair growth is "
    "Σdf² ≤ cap·|edges|, linear in postings, never an all-pairs cross "
    "join. Top-k lowers to TakeOrderedAndProject (per-partition heaps; "
    "no global sort). Jaccard is rounded BEFORE the ordering on both "
    "sides so rank ties at equal similarity break identically by "
    "(a, b).",
)
def q_supplier_overlap(spark, sf_dir):
    from ..operators.graph import node_overlap

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("node"), F.col("l_partkey").alias("item")
    )
    out = node_overlap(li, max_item_df=50, top_k=25)
    return out.select(
        "a",
        "b",
        F.col("common").cast("long").alias("common"),
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        stable_round(F.col("jaccard"), 6).alias("jaccard"),
    )


@register(
    "q_order_backlog",
    """
    WITH ship AS (
        SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
        FROM lineitem GROUP BY l_orderkey
    ), deltas AS (
        SELECT CAST(o.o_orderdate AS DATE) AS day, 1 AS delta
        FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT s.last_ship + INTERVAL 1 DAY, -1
        FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
    ), daily AS (
        SELECT day, sum(delta) AS net FROM deltas GROUP BY day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(net AS BIGINT) AS net_change,
           CAST(sum(net) OVER (ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS open_orders
    FROM daily ORDER BY day
    """,
    doc="Open-order backlog timeline by sweep-line: each order emits "
    "+1 at its order date and −1 the day after its LAST shipment "
    "(max l_shipdate — orders without lineitems, which the generator "
    "never produces, would be excluded by the inner join), collapsed "
    "to per-day net changes, then one cumulative sum over the "
    "O(distinct days) frame. This is the interval-stabbing pattern "
    "that never materializes order×day rows — at 100 TB the window "
    "input is the calendar, not the fact table. Counts stay in LONG "
    "end to end; no floats at all.",
)
def q_order_backlog(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("last_ship")
    )
    j = orders.join(ship, ship.l_orderkey == orders.o_orderkey)
    opens = j.select(
        F.col("o_orderdate").cast("date").alias("day"), F.lit(1).alias("delta")
    )
    closes = j.select(
        F.date_add(F.col("last_ship"), 1).alias("day"), F.lit(-1).alias("delta")
    )
    daily = opens.union(closes).groupBy("day").agg(F.sum("delta").alias("net"))
    run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("net").cast("long").alias("net_change"),
        F.sum("net").over(run).cast("long").alias("open_orders"),
    ).orderBy("day")


@register(
    "q_rfm",
    """
    WITH anchor AS (
        SELECT max(o_orderdate) AS mx FROM orders
    ), per_cust AS (
        SELECT o_custkey AS custkey,
               max(o_orderdate) AS last_order,
               count(*) AS frequency,
               sum(CAST(o_totalprice AS DECIMAL(28,2))) AS monetary
        FROM orders GROUP BY o_custkey
    ), scored AS (
        SELECT custkey, frequency,
               CAST(monetary AS DOUBLE) AS monetary,
               date_diff('day', last_order, (SELECT mx FROM anchor))
                   AS recency_days,
               ntile(5) OVER (ORDER BY last_order, custkey) AS r,
               ntile(5) OVER (ORDER BY frequency, custkey) AS f,
               ntile(5) OVER (ORDER BY monetary, custkey) AS m
        FROM per_cust
    )
    SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           floor(monetary * 100 + 0.5) / 100 AS monetary,
           r, f, m,
           CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
                WHEN r <= 2 AND f >= 4 THEN 'at_risk'
                WHEN r >= 4 AND f <= 2 THEN 'new'
                ELSE 'regular' END AS segment
    FROM scored ORDER BY custkey
    """,
    doc="RFM segmentation: per-customer recency (days since last order "
    "against the corpus max date — a 1-row broadcast contract scalar), "
    "frequency, and DECIMAL-exact monetary total, each scored into "
    "quintiles with ntile(5) over a FULLY tiebroken order (metric, "
    "custkey) — ntile is deterministic only under a total order, so "
    "the tiebreak is load-bearing for engine parity. Score 5 = best "
    "on every axis (most recent / most frequent / highest spend). One "
    "hash aggregate + three ntile windows over the O(customers) "
    "frame; the canonical champion/at-risk/new labels are a map-only "
    "CASE. Scale note: an unpartitioned ntile is a single-task sort — "
    "fine while customers ≪ facts (the frame is post-aggregation), "
    "but a billion-customer corpus swaps in quantile-boundary scoring "
    "(the q_customer_deciles lowering: approx boundaries + map-side "
    "CASE), trading ntile's exact equal-count split for parallelism.",
)
def q_rfm(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("monetary"),
    )
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    scored = (
        per_cust.crossJoin(F.broadcast(anchor))
        .withColumn("monetary", F.col("monetary").cast("double"))
        .withColumn(
            "recency_days", F.datediff(F.col("mx"), F.col("last_order"))
        )
        .withColumn("r", F.ntile(5).over(Window.orderBy("last_order", "custkey")))
        .withColumn("f", F.ntile(5).over(Window.orderBy("frequency", "custkey")))
        .withColumn("m", F.ntile(5).over(Window.orderBy("monetary", "custkey")))
    )
    seg = (
        F.when((F.col("r") >= 4) & (F.col("f") >= 4) & (F.col("m") >= 4), "champion")
        .when((F.col("r") <= 2) & (F.col("f") >= 4), "at_risk")
        .when((F.col("r") >= 4) & (F.col("f") <= 2), "new")
        .otherwise("regular")
    )
    return scored.select(
        "custkey",
        F.col("recency_days").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        stable_round(F.col("monetary"), 2).alias("monetary"),
        "r",
        "f",
        "m",
        seg.alias("segment"),
    ).orderBy("custkey")


@register(
    "q_snapshot_diff",
    """
    WITH a AS (
        SELECT o_custkey AS custkey,
               sum(CAST(o_totalprice AS DECIMAL(28,2))) AS spend_a,
               count(*) AS n_a
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    ), b AS (
        SELECT o_custkey AS custkey,
               sum(CAST(o_totalprice AS DECIMAL(28,2))) AS spend_b,
               count(*) AS n_b
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    ), d AS (
        SELECT coalesce(a.custkey, b.custkey) AS custkey,
               CASE WHEN a.custkey IS NULL THEN 'added'
                    WHEN b.custkey IS NULL THEN 'removed'
                    WHEN a.spend_a = b.spend_b THEN 'unchanged'
                    ELSE 'changed' END AS status,
               coalesce(a.spend_a, 0) AS spend_a,
               coalesce(b.spend_b, 0) AS spend_b
        FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
    )
    SELECT status,
           count(*) AS n_customers,
           floor(CAST(sum(spend_a) AS DOUBLE) * 100 + 0.5) / 100 AS total_a,
           floor(CAST(sum(spend_b) AS DOUBLE) * 100 + 0.5) / 100 AS total_b
    FROM d GROUP BY status ORDER BY status
    """,
    doc="Snapshot reconciliation (the delta-detection audit every "
    "warehouse sync runs): per-customer spend aggregated in two "
    "periods, FULL OUTER joined on the key, each key classified "
    "added / removed / changed / unchanged, then rolled up per class "
    "with DECIMAL-exact totals. The full-outer join runs on the two "
    "POST-aggregation O(customers) frames — never fact-to-fact — so "
    "the reconciliation costs two scans + one key-partitioned "
    "shuffle at any scale. Spend equality is tested on exact "
    "DECIMALs, so 'unchanged' can't flip on float noise.",
)
def q_snapshot_diff(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")

    def half(pred, tag):
        return (
            orders.where(pred)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias(
                    f"spend_{tag}"
                ),
                F.count(F.lit(1)).alias(f"n_{tag}"),
            )
        )

    a = half(F.col("o_orderdate") < cut, "a")
    b = half(F.col("o_orderdate") >= cut, "b")
    d = a.join(b, a.custkey == b.custkey, "full_outer").select(
        F.when(a.custkey.isNull(), "added")
        .when(b.custkey.isNull(), "removed")
        .when(F.col("spend_a") == F.col("spend_b"), "unchanged")
        .otherwise("changed")
        .alias("status"),
        F.coalesce(F.col("spend_a"), F.lit(0).cast("decimal(28,2)")).alias("sa"),
        F.coalesce(F.col("spend_b"), F.lit(0).cast("decimal(28,2)")).alias("sb"),
    )
    return (
        d.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            stable_round(F.sum("sa").cast("double"), 2).alias("total_a"),
            stable_round(F.sum("sb").cast("double"), 2).alias("total_b"),
        )
        .orderBy("status")
    )


@register(
    "q_markov_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ), counts AS (
        SELECT event_type AS from_state, next_type AS to_state,
               count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
           floor(n / CAST(sum(n) OVER (PARTITION BY from_state) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS p
    FROM counts ORDER BY from_state, to_state
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next | current) from one lead() window ordered by "
    "(ts, event_id) and one hash aggregate — the sequence-mining "
    "primitive behind next-action prediction and journey analysis. "
    "Row-normalization runs on the K×K counts grid (a window over "
    "O(states²) rows, not events). Counts are exact LONGs; each "
    "probability is one double division rounded on both sides.",
)
def q_markov_transitions(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_state"),
        F.lead("event_type").over(w).alias("to_state"),
    ).where(F.col("to_state").isNotNull())
    counts = seq.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        F.col("n").cast("long").alias("n"),
        stable_round(F.col("n") / F.sum("n").over(tot).cast("double"), 6).alias(
            "p"
        ),
    ).orderBy("from_state", "to_state")


@register(
    "q_ab_test",
    """
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                    THEN 'A' ELSE 'B' END AS arm,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ), cells AS (
        SELECT arm, count(*) AS n, sum(converted) AS conv
        FROM assigned GROUP BY arm
    ), wide AS (
        SELECT max(CASE WHEN arm = 'A' THEN n END) AS n_a,
               max(CASE WHEN arm = 'A' THEN conv END) AS c_a,
               max(CASE WHEN arm = 'B' THEN n END) AS n_b,
               max(CASE WHEN arm = 'B' THEN conv END) AS c_b
        FROM cells
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
           floor((c_a / CAST(n_a AS DOUBLE) - c_b / CAST(n_b AS DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS lift,
           CASE WHEN (c_a + c_b) > 0 AND (c_a + c_b) < (n_a + n_b)
                THEN floor((c_a / CAST(n_a AS DOUBLE) - c_b / CAST(n_b AS DOUBLE))
                     / sqrt(((c_a + c_b) / CAST(n_a + n_b AS DOUBLE))
                            * (1.0 - (c_a + c_b) / CAST(n_a + n_b AS DOUBLE))
                            * (1.0 / n_a + 1.0 / n_b))
                     * 1000000 + 0.5) / 1000000
           END AS z_stat
    FROM wide
    """,
    doc="A/B experiment readout: users are hash-assigned to arms "
    "(md5 prefix — the q_hash_split discipline: no RNG, membership "
    "stable under replays), conversion = any purchase event, and the "
    "two-proportion pooled z-statistic tests the lift. User collapse "
    "and arm cells are exact LONG counts from two hash aggregates; "
    "lift and z are one fixed-order double expression on the single "
    "summary row. Degenerate experiments (0%% or 100%% pooled "
    "conversion — this synthetic corpus converts every user) have "
    "zero pooled variance, so z is null by the explicit guard rather "
    "than an ANSI divide-by-zero. The experimentation primitive every "
    "event pipeline serves.",
)
def q_ab_test(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
    ).otherwise("B")
    assigned = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    ).withColumn("arm", arm)
    cells = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = cells.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("c_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("c_b"),
    )
    p_a = F.col("c_a") / F.col("n_a").cast("double")
    p_b = F.col("c_b") / F.col("n_b").cast("double")
    pool = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b")).cast(
        "double"
    )
    # degenerate experiments (0% or 100% pooled conversion) have zero
    # pooled variance — z undefined, emit null (ANSI-total either way)
    tot_c = F.col("c_a") + F.col("c_b")
    tot_n = F.col("n_a") + F.col("n_b")
    z = F.when(
        (tot_c > 0) & (tot_c < tot_n),
        (p_a - p_b)
        / F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("c_a").cast("long").alias("c_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("c_b").cast("long").alias("c_b"),
        stable_round(p_a - p_b, 6).alias("lift"),
        stable_round(z, 6).alias("z_stat"),
    )


@register(
    "q_embedding_outliers",
    """
    WITH ex AS (
        SELECT vec_id, label, i AS dim, embedding[i]::DOUBLE AS val
        FROM embeddings, range(1, 65) AS r(i)
    ), cent AS (
        SELECT label, dim,
               floor(avg(val) * 1000000 + 0.5) / 1000000 AS c
        FROM ex GROUP BY label, dim
    ), dist AS (
        SELECT ex.vec_id, ex.label,
               CAST(sum(CAST(floor((ex.val - cent.c) * (ex.val - cent.c)
                                   * 1000000000000 + 0.5) / 1000000000000
                             AS DECIMAL(28,12))) AS DOUBLE) AS d2
        FROM ex JOIN cent ON ex.label = cent.label AND ex.dim = cent.dim
        GROUP BY ex.vec_id, ex.label
    ), mom AS (
        SELECT vec_id, label, d2,
               count(*) OVER w AS n,
               CAST(sum(CAST(floor(d2 * 10000000000 + 0.5) / 10000000000
                             AS DECIMAL(28,10))) OVER w AS DOUBLE) AS s,
               CAST(sum(CAST(floor(d2 * d2 * 10000000000 + 0.5)
                             / 10000000000
                             AS DECIMAL(38,10))) OVER w AS DOUBLE) AS s2
        FROM dist
        WINDOW w AS (PARTITION BY label)
    )
    SELECT vec_id, label,
           floor(d2 * 1000000 + 0.5) / 1000000 AS dist2,
           CASE WHEN n > 1 AND (s2 - s * s / n) / (n - 1) > 0
                THEN floor((d2 - s / n)
                           / sqrt((s2 - s * s / n) / (n - 1))
                           * 1000000 + 0.5) / 1000000
           END AS z
    FROM mom ORDER BY vec_id
    """,
    doc="Embedding outlier score: each vector's squared distance to its "
    "OWN label's centroid, z-scored within the label — the "
    "mislabeled-sample / corrupt-embedding screen run before training "
    "on labeled vectors. Centroids are elementwise means quantized to "
    "6dp BEFORE the distance pass, so the float-averaging step is "
    "pinned and every downstream term is a fixed-order expression on "
    "pinned inputs; per-vector Σ(v−c)² and the per-label moment sums "
    "ride DECIMAL quantization (order-insensitive). Two shuffles "
    "((label, dim) centroid agg, vec_id distance agg) + one O(vectors) "
    "window; σ = 0 labels emit null z.",
)
def q_embedding_outliers(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.col("val").cast("double").alias("val"),
    )
    cent = ex.groupBy("label", "dim").agg(
        stable_round(F.avg("val"), 6).alias("c")
    )
    dist = (
        ex.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                stable_round(
                    (F.col("val") - F.col("c")) * (F.col("val") - F.col("c")),
                    12,
                ).cast("decimal(28,12)")
            )
            .cast("double")
            .alias("d2")
        )
    )
    w = Window.partitionBy("label")
    # stable_round BEFORE the decimal casts: a raw double's 10dp decimal
    # cut differs between engines (Spark rounds the shortest decimal
    # repr, DuckDB the binary expansion — the stable_round rationale),
    # so pin the value to an exact 10dp double first.
    mom = dist.select(
        "vec_id",
        "label",
        "d2",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(stable_round(F.col("d2"), 10).cast("decimal(28,10)"))
        .over(w)
        .cast("double")
        .alias("s"),
        F.sum(
            stable_round(F.col("d2") * F.col("d2"), 10).cast("decimal(38,10)")
        )
        .over(w)
        .cast("double")
        .alias("s2"),
    )
    var = (F.col("s2") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    z = F.when(
        (F.col("n") > 1) & (var > 0),
        (F.col("d2") - F.col("s") / F.col("n")) / F.sqrt(var),
    )
    return mom.select(
        "vec_id",
        "label",
        stable_round(F.col("d2"), 6).alias("dist2"),
        stable_round(z, 6).alias("z"),
    ).orderBy("vec_id")


@register(
    "q_event_paths",
    """
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               lead(event_type)    OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
        SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path, count(*) AS n
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY 1
    ), tot AS (SELECT sum(n) AS t FROM paths)
    SELECT path, CAST(n AS BIGINT) AS n,
           floor(n / CAST(t AS DOUBLE) * 1000000 + 0.5) / 1000000 AS share
    FROM paths, tot
    ORDER BY n DESC, path
    LIMIT 10
    """,
    doc="Journey path mining: the top-10 three-step event paths across "
    "user sequences (the Sankey/flow primitive one order above "
    "q_markov_transitions' pairwise matrix). Two stacked lead() "
    "offsets ride ONE (user, ts, seq) shuffle+sort; paths reduce to "
    "the O(states³) grid before the 1-row total joins on (an "
    "allowlisted contract scalar). Counts exact; top-k via "
    "TakeOrderedAndProject with a path tiebreak.",
)
def q_event_paths(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type").over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(" > ", "e1", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = paths.agg(F.sum("n").alias("t"))
    return (
        paths.crossJoin(F.broadcast(tot))
        .select(
            "path",
            F.col("n").cast("long").alias("n"),
            stable_round(F.col("n") / F.col("t").cast("double"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@register(
    "q_interarrival",
    """
    WITH gaps AS (
        SELECT event_type,
               CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT)
                   AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), g AS (
        SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL
    ), ranked AS (
        SELECT event_type, gap_us,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY gap_us) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM g
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(sum(CASE WHEN rn = (max_n + 1) // 2 THEN gap_us END)
                AS BIGINT) AS median_gap_us,
           floor(CAST(sum(gap_us) AS DOUBLE) / max(n) * 100 + 0.5) / 100
               AS mean_gap_us,
           CAST(sum(CASE WHEN gap_us < 60000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bursty
    FROM (SELECT *, max(n) OVER (PARTITION BY event_type) AS max_n
          FROM ranked)
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Inter-arrival profile per event type: median (LOWER-median "
    "rank — a data value, engine-exact), mean, and burst count "
    "(gaps under 60 s) over microsecond inter-arrival deltas — the "
    "feed-health / burstiness monitor beside the heartbeat scan. "
    "Deltas are exact LONG microseconds (epoch_us differencing, "
    "tz-free); the only float is the final mean division. One "
    "(event_type, ts, seq) window pass + one rank window on the gap "
    "frame.",
)
def q_interarrival(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).where(F.col("gap_us").isNotNull())
    seg = Window.partitionBy("event_type")
    ranked = gaps.select(
        "event_type",
        "gap_us",
        # ties on gap_us are interchangeable for a rank-picked VALUE,
        # so no further tiebreak is needed for determinism
        F.row_number().over(seg.orderBy("gap_us")).alias("rn"),
        F.count(F.lit(1)).over(seg).alias("n"),
    ).withColumn("max_n", F.max("n").over(seg))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            F.sum(
                F.when(
                    F.col("rn") == F.floor((F.col("max_n") + 1) / 2),
                    F.col("gap_us"),
                )
            )
            .cast("long")
            .alias("median_gap_us"),
            stable_round(
                F.sum("gap_us").cast("double") / F.max("n"), 2
            ).alias("mean_gap_us"),
            F.sum(F.when(F.col("gap_us") < 60000000, 1).otherwise(0))
            .cast("long")
            .alias("n_bursty"),
        )
        .orderBy("event_type")
    )


@register(
    "q_kaplan_meier",
    """
    WITH sign AS (
        SELECT user_id, min(ts) AS t0
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), purch AS (
        SELECT e.user_id, min(e.ts) AS t_ev
        FROM events e JOIN sign s ON s.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s.t0
        GROUP BY e.user_id
    ), lastact AS (
        SELECT e.user_id, max(e.ts) AS t_last
        FROM events e JOIN sign s ON s.user_id = e.user_id
        WHERE e.ts >= s.t0
        GROUP BY e.user_id
    ), per_user AS (
        SELECT s.user_id,
               date_diff('day', CAST(s.t0 AS DATE),
                         CAST(coalesce(p.t_ev, l.t_last) AS DATE)) AS dur,
               CASE WHEN p.t_ev IS NOT NULL THEN 1 ELSE 0 END AS obs
        FROM sign s
        JOIN lastact l ON l.user_id = s.user_id
        LEFT JOIN purch p ON p.user_id = s.user_id
    ), grid AS (
        SELECT dur, sum(obs) AS d, sum(1 - obs) AS c, count(*) AS tot
        FROM per_user GROUP BY dur
    ), tot AS (SELECT sum(tot) AS n_all FROM grid),
    risk AS (
        SELECT dur, d, c, n_all,
               n_all - coalesce(sum(tot) OVER (ORDER BY dur
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS n_risk
        FROM grid, tot
    ), terms AS (
        SELECT dur, d, c, n_risk,
               CASE WHEN d < n_risk
                    THEN CAST(ln(1.0 - d / CAST(n_risk AS DOUBLE))
                              AS DECIMAL(28,12)) END AS t
        FROM risk
    )
    SELECT CAST(dur AS BIGINT) AS dur_days,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS d_events,
           CAST(c AS BIGINT) AS c_censored,
           CASE WHEN d >= n_risk THEN 0.0
                ELSE floor(exp(CAST(sum(t) OVER (ORDER BY dur
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS DOUBLE))
                           * 1000000 + 0.5) / 1000000
           END AS survival
    FROM terms ORDER BY dur
    """,
    doc="Kaplan–Meier survival curve for time-to-conversion (signup → "
    "first purchase, right-censored at the user's last activity): the "
    "product-limit estimator S(t) = Π(1 − dᵢ/nᵢ) with the product "
    "lowered to exp(Σ ln terms), each term DECIMAL-quantized so the "
    "running sum is order-exact. Risk sets come from one cumulative "
    "window over the O(distinct durations) grid — the fact table is "
    "reduced to per-user (duration, observed) rows first, so the "
    "survival math never touches events again. dᵢ = nᵢ (the final "
    "step) pins S to exactly 0 instead of ln(0). The cohort/LTV "
    "analytics companion every event warehouse serves.",
)
def q_kaplan_meier(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    sign = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    j = e.join(sign, "user_id")
    purch = (
        j.where((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t0")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_ev"))
    )
    lastact = (
        j.where(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.max("ts").alias("t_last"))
    )
    per_user = (
        sign.join(lastact, "user_id")
        .join(purch, "user_id", "left")
        .select(
            F.datediff(
                F.coalesce(F.col("t_ev"), F.col("t_last")).cast("date"),
                F.col("t0").cast("date"),
            ).alias("dur"),
            F.when(F.col("t_ev").isNotNull(), 1).otherwise(0).alias("obs"),
        )
    )
    grid = per_user.groupBy("dur").agg(
        F.sum("obs").alias("d"),
        F.sum(1 - F.col("obs")).alias("c"),
        F.count(F.lit(1)).alias("tot"),
    )
    tot = grid.agg(F.sum("tot").alias("n_all"))
    prior = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = grid.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n_all") - F.coalesce(F.sum("tot").over(prior), F.lit(0)),
    )
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d") / F.col("n_risk").cast("double")).cast(
            "decimal(28,12)"
        ),
    )
    run = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    terms = risk.withColumn("t", term)
    surv = F.when(F.col("d") >= F.col("n_risk"), F.lit(0.0)).otherwise(
        stable_round(F.exp(F.sum("t").over(run).cast("double")), 6)
    )
    return terms.select(
        F.col("dur").cast("long").alias("dur_days"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.col("c").cast("long").alias("c_censored"),
        surv.alias("survival"),
    ).orderBy("dur_days")


@register(
    "q_hhi",
    """
    WITH spend AS (
        SELECT n.n_name AS nation, o.o_custkey,
               sum(CAST(o.o_totalprice AS DECIMAL(28,2))) AS s
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    ), shares AS (
        SELECT nation,
               CAST(floor((CAST(s AS DOUBLE)
                           / CAST(sum(s) OVER (PARTITION BY nation)
                                  AS DOUBLE))
                          * (CAST(s AS DOUBLE)
                             / CAST(sum(s) OVER (PARTITION BY nation)
                                    AS DOUBLE))
                          * 1000000000000 + 0.5) / 1000000000000
                    AS DECIMAL(28,12)) AS sh2
        FROM spend
    )
    SELECT nation,
           count(*) AS n_customers,
           floor(CAST(sum(sh2) AS DOUBLE) * 1000000 + 0.5) / 1000000
               AS hhi,
           floor(1.0 / CAST(sum(sh2) AS DOUBLE) * 10000 + 0.5) / 10000
               AS effective_n
    FROM shares GROUP BY nation ORDER BY nation
    """,
    doc="Herfindahl–Hirschman concentration index of customer revenue "
    "within each nation (HHI = Σ shareᵢ², plus the effective number of "
    "customers 1/HHI) — the concentration standard beside q_gini_pareto's "
    "inequality view. Spend aggregates in DECIMAL; each squared share "
    "is one fixed-order double stable_rounded to 12dp and quantized "
    "to DECIMAL before the per-nation sum, so distributed accumulation "
    "order can't flip the hash (the q_embedding_outliers cast lesson). "
    "Two hash aggregates + one O(customers) window.",
)
def q_hhi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    spend = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("s"))
    )
    w = Window.partitionBy("nation")
    share = F.col("s").cast("double") / F.sum("s").over(w).cast("double")
    shares = spend.select(
        "nation",
        stable_round(share * share, 12).cast("decimal(28,12)").alias("sh2"),
    )
    return (
        shares.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            stable_round(F.sum("sh2").cast("double"), 6).alias("hhi"),
            stable_round(
                F.lit(1.0) / F.sum("sh2").cast("double"), 4
            ).alias("effective_n"),
        )
        .orderBy("nation")
    )


@register(
    "q_sla_compliance",
    """
    WITH per_order AS (
        SELECT o.o_orderkey, o.o_orderpriority AS priority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         max(CAST(l.l_shipdate AS DATE))) AS days_to_ship
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, o.o_orderdate
    )
    SELECT priority,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN days_to_ship <= 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS within_30,
           CAST(sum(CASE WHEN days_to_ship <= 60 THEN 1 ELSE 0 END)
                AS BIGINT) AS within_60,
           CAST(sum(CASE WHEN days_to_ship <= 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS within_90,
           floor(sum(CASE WHEN days_to_ship <= 60 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000
               AS sla60_rate
    FROM per_order GROUP BY priority ORDER BY priority
    """,
    doc="SLA compliance scorecard: per order priority, the share of "
    "orders FULLY shipped (max lineitem shipdate — the order is done "
    "only when its last line ships) within 30/60/90 days of order "
    "date. Two hash aggregates (per-order completion, then the "
    "priority rollup); day arithmetic and counts are exact integers; "
    "the single rate divides once per output row. The operations "
    "analytics every fulfillment warehouse reports.",
)
def q_sla_compliance(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderpriority").alias("priority"),
            "o_orderdate",
        )
        .agg(
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")),
                F.col("o_orderdate").cast("date"),
            ).alias("days_to_ship")
        )
    )
    within = lambda d: F.sum(
        F.when(F.col("days_to_ship") <= d, 1).otherwise(0)
    )
    return (
        per_order.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            within(30).cast("long").alias("within_30"),
            within(60).cast("long").alias("within_60"),
            within(90).cast("long").alias("within_90"),
            stable_round(
                within(60) / F.count(F.lit(1)).cast("double"), 6
            ).alias("sla60_rate"),
        )
        .orderBy("priority")
    )


_SKEW_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]


@register(
    "q_key_skew",
    """
    WITH per_key AS (
        SELECT CASE WHEN grouping(l_orderkey) = 0 THEN 'l_orderkey'
                    WHEN grouping(l_partkey)  = 0 THEN 'l_partkey'
                    ELSE 'l_suppkey' END AS key_col,
               count(*) AS c
        FROM lineitem
        GROUP BY GROUPING SETS ((l_orderkey), (l_partkey), (l_suppkey))
    )
    SELECT key_col,
           count(*) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_rows,
           floor(CAST(sum(c) AS DOUBLE) / count(*) * 100 + 0.5) / 100
               AS avg_rows,
           floor(max(c) / (CAST(sum(c) AS DOUBLE) / count(*)) * 10000 + 0.5)
               / 10000 AS skew_ratio
    FROM per_key GROUP BY key_col ORDER BY key_col
    """,
    doc="Join/shuffle-key skew diagnostic: for each candidate key "
    "column of the fact table, the per-key row-count distribution "
    "(distinct keys, max, mean, and max/mean skew ratio) — the "
    "pre-flight report that decides between a plain shuffle join, "
    "broadcast, or the salted lowering (operators/skew.py) BEFORE "
    "burning a 100 TB shuffle on a hot key. GROUPING SETS computes "
    "all three per-key count tables in ONE fact-table pass (one "
    "Expand+HashAggregate — the q_multi_rollup shape), each reduced "
    "to one summary row; counts exact LONGs, the ratio one "
    "fixed-order double per row.",
)
def q_key_skew(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # grouping() is only legal inside the grouping-sets aggregate, so
    # emit the masks there and derive the key label from them after.
    per_key = li.groupingSets([[c] for c in _SKEW_COLS], *_SKEW_COLS).agg(
        F.count(F.lit(1)).alias("c"),
        F.grouping("l_orderkey").alias("g_o"),
        F.grouping("l_partkey").alias("g_p"),
    )
    key_col = (
        F.when(F.col("g_o") == 0, "l_orderkey")
        .when(F.col("g_p") == 0, "l_partkey")
        .otherwise("l_suppkey")
    )
    return (
        per_key.select(key_col.alias("key_col"), "c")
        .groupBy("key_col")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").cast("long").alias("max_rows"),
            stable_round(
                F.sum("c").cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_rows"),
            stable_round(
                F.max("c") / (F.sum("c").cast("double") / F.count(F.lit(1))),
                4,
            ).alias("skew_ratio"),
        )
        .orderBy("key_col")
    )


@register(
    "q_mutual_information",
    """
    WITH cells AS (
        SELECT event_type AS x, CAST(hour(ts) >= 12 AS INT) AS y,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ), tot AS (SELECT sum(n) AS t FROM cells),
    marg AS (
        SELECT x, y, n, t,
               sum(n) OVER (PARTITION BY x) AS nx,
               sum(n) OVER (PARTITION BY y) AS ny
        FROM cells, tot
    ), terms AS (
        SELECT CAST((n / CAST(t AS DOUBLE))
                    * ln((n / CAST(t AS DOUBLE))
                         / ((nx / CAST(t AS DOUBLE))
                            * (ny / CAST(t AS DOUBLE))))
                    AS DECIMAL(28,12)) AS term
        FROM marg
    )
    SELECT CAST((SELECT count(*) FROM cells) AS BIGINT) AS n_cells,
           floor(CAST(sum(term) AS DOUBLE) * 1000000000 + 0.5) / 1000000000
               AS mutual_info_nats
    FROM terms
    """,
    doc="Mutual information between two categorical views of the event "
    "stream (event type × AM/PM half-day): I(X;Y) = Σ p(x,y)·"
    "ln(p(x,y)/(p(x)p(y))) — the dependence/feature-relevance "
    "primitive behind feature selection and leakage audits. One hash "
    "aggregate to the O(|X|·|Y|) contingency grid; marginals are "
    "windows on that grid; each term is DECIMAL-quantized before the "
    "final sum (order-insensitive); the grand total is a 1-row "
    "contract scalar. Zero-count cells never materialize, and "
    "0·ln(0) = 0 is exactly the convention their absence encodes.",
)
def q_mutual_information(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        F.col("event_type").alias("x"),
        (F.hour("ts") >= 12).cast("int").alias("y"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").alias("t"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    marg = cells.crossJoin(F.broadcast(tot)).select(
        "n",
        "t",
        F.sum("n").over(wx).alias("nx"),
        F.sum("n").over(wy).alias("ny"),
    )
    p = F.col("n") / F.col("t").cast("double")
    px = F.col("nx") / F.col("t").cast("double")
    py = F.col("ny") / F.col("t").cast("double")
    term = (p * F.log(p / (px * py))).cast("decimal(28,12)")
    # one term row per contingency cell, so n_cells folds into the SAME
    # aggregate — no eager driver-side count during plan construction
    return marg.select(term.alias("term")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        stable_round(F.sum("term").cast("double"), 9).alias(
            "mutual_info_nats"
        ),
    )
