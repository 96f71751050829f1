"""Second-wave oracle queries, statistical/behavioral tier: Benford,
PageRank, market baskets, attribution, SCD2, Gini/Pareto, RFM, A/B
testing, survival analysis, skew profiling, mutual information, and
the other corpus-level statistics. Split from plans/advanced.py in
round 11 (mechanical, zero behavior change; registration order
preserved by the trailing import in advanced.py).
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
    # The distinct basket-item set feeds FIVE consumers (both self-join
    # sides, both marginal joins, the order total) and the plan showed
    # zero exchange reuse — scan + distinct executed per consumer. Lazy
    # localCheckpoint pins it once (the triangle_count / node_overlap
    # discipline); at 100 TB one materialization of the deduped pair
    # set beats five scan+shuffle+dedup passes over the fact table.
    items = t.lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct().localCheckpoint(eager=False)
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
    # Both sides of the edge-derivation self-join read this distinct
    # set; pin it so scan + dedup run once (triangle_count already pins
    # the canonical edge set it derives from this).
    items = t.lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct().localCheckpoint(eager=False)
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
    "fine while customers ≪ facts (the frame is post-aggregation) — "
    "and the billion-customer swap is WIRED (round 14, "
    "operators/quantiles.rfm): strategy='auto' keeps ntile at every "
    "oracle-checked SF via the zero-job Catalyst size gate and "
    "switches to quantile-boundary scoring (one approx-boundary "
    "aggregate broadcast + map-side CASE, no global sort; tolerance "
    "contract + executed sf1 probe in "
    "tests/test_quantile_strategies.py) above 8 GiB of input.",
)
def q_rfm(spark, sf_dir):
    from ..operators.quantiles import rfm

    orders = load_table(spark, sf_dir, "orders")
    return rfm(orders, strategy="auto")


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
    # Aggregate BEFORE the join (round 15, guide §2.3): max(l_shipdate)
    # per order needs only lineitem, so the per-orderkey reduction runs
    # on the bare fact scan (map-side combined — lineitem files are
    # clustered by orderkey, so the partial aggregate collapses most
    # groups before the exchange) and the join then carries one row per
    # order instead of every line item. max commutes with the join
    # (orders is unique per orderkey): identical days_to_ship values.
    last_ship = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("__last_ship")
    )
    per_order = o.join(last_ship, last_ship.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("__last_ship"), F.col("o_orderdate").cast("date")
        ).alias("days_to_ship"),
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
