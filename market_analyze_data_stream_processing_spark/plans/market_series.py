"""Market-analytics queries, series tier (SURVEY.md §2.4/2.5/2.6/2.9
[D] operators) replayed over the synthetic ``events`` stream table,
prices-shaped: ticker ≈ event_type, price ≈ value, seq = event_id
(deterministic tiebreak for duplicate timestamps).

These are the reference's producer/consumer computations — rolling MAs,
lag variation, multi-lag momentum, trend, daily OHLC summary, latest-per-
key, keep-last dedup, EWMA/MACD/RSI — as declarative window/agg plans.
Batch-over-stream equivalence: the same operator functions are reused by
streaming/. Split from plans/market.py in round 11 (mechanical, zero
behavior change); siblings: market_bars (volume/daily-bar indicators),
market_stats (risk/microstructure/statistics tier).
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
from ..operators.stats import (
    corr_moments_sql,
    corr_value_sql,
    quantize,
    quantize_sql,
)
from ..operators.analytics import (
    daily_summary,
    keep_last,
    latest_per_key,
    with_lag_variation,
    with_momentum_lags,
    with_moving_averages,
    with_trend,
)
from ..sources.tables import load_table, plan_memo
from .registry import register

#: DuckDB CTE mirroring _bars() below.
_BARS_CTE = """
WITH bars AS (
    SELECT event_type AS ticker, ts, value AS price, event_id AS seq
    FROM events
)
"""


@plan_memo
def _bars(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("ticker"),
        "ts",
        F.col("value").alias("price"),
        F.col("event_id").alias("seq"),
    )


@register(
    "q_ma_rolling",
    _BARS_CTE
    + """
    SELECT ticker, seq,
           floor(CAST(sum(CAST(price AS DECIMAL(18,4))) OVER w10  AS DOUBLE) / count(price) OVER w10  * 10000 + 0.5) / 10000 AS ma10,
           floor(CAST(sum(CAST(price AS DECIMAL(18,4))) OVER w50  AS DOUBLE) / count(price) OVER w50  * 10000 + 0.5) / 10000 AS ma50,
           floor(CAST(sum(CAST(price AS DECIMAL(18,4))) OVER w200 AS DOUBLE) / count(price) OVER w200 * 10000 + 0.5) / 10000 AS ma200,
           CASE WHEN count(price) OVER w50 < 50 THEN 0.0
                ELSE floor(CAST(sum(CAST(price AS DECIMAL(18,4))) OVER w50 AS DOUBLE) / count(price) OVER w50 * 10000 + 0.5) / 10000 END AS ma50_gated
    FROM bars
    WINDOW w10  AS (PARTITION BY ticker ORDER BY ts, seq ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
           w50  AS (PARTITION BY ticker ORDER BY ts, seq ROWS BETWEEN 49 PRECEDING AND CURRENT ROW),
           w200 AS (PARTITION BY ticker ORDER BY ts, seq ROWS BETWEEN 199 PRECEDING AND CURRENT ROW)
    """,
    doc="A3/W3 rolling MA10/50/200 + A4 gated emission (0.0 until window "
    "fills). Each MA is a RUNNING-SUM DIFFERENCE (sum over unbounded "
    "preceding, lagged by n) — O(1) per row, versus Spark's sliding-frame "
    "WindowExec which re-aggregates the full frame per row (O(200) for "
    "ma200; Spark has no retract path). Decimal accumulation makes "
    "S(i)-S(i-n) exactly equal to the frame sum, so oracle hashes are "
    "unchanged. Two WindowExecs share one shuffle + one sort; a hot key "
    "degrades to serial-but-bounded — the halo-block lowering demonstrated "
    "by q_ewma is the drop-in fix if a single key ever dominates.",
)
def q_ma_rolling(spark, sf_dir):
    # Pass 1: incremental running sum/count (UnboundedPreceding frames are
    # O(1) per row). Pass 2 reads only lag() offsets of pass-1 columns —
    # same (ticker, ts, seq) partitioning+sort, so Catalyst stacks the two
    # WindowExecs on ONE exchange and ONE sort; no frame re-aggregation.
    bars = _bars(spark, sf_dir)
    base = Window.partitionBy("ticker").orderBy("ts", "seq")
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    cum = bars.select(
        "ticker",
        "seq",
        "ts",
        F.sum(F.col("price").cast("decimal(18,4)")).over(run).alias("s"),
        F.count("price").over(run).alias("c"),
    )

    def ma_exact(n):
        # Decimal running-sum difference == the n-row frame sum, exactly.
        s_n = F.col("s") - F.coalesce(
            F.lag("s", n).over(base), F.lit(0).cast("decimal(28,4)")
        )
        c_n = F.col("c") - F.coalesce(F.lag("c", n).over(base), F.lit(0))
        return stable_round(s_n.cast("double") / c_n, 4), c_n

    ma10, _ = ma_exact(10)
    ma50, cnt50 = ma_exact(50)
    ma200, _ = ma_exact(200)
    return cum.select(
        "ticker",
        "seq",
        ma10.alias("ma10"),
        ma50.alias("ma50"),
        ma200.alias("ma200"),
        F.when(cnt50 < 50, F.lit(0.0)).otherwise(ma50).alias("ma50_gated"),
    )


@register(
    "q_lag_variation",
    _BARS_CTE
    + """
    SELECT ticker, seq, round(price, 6) AS price,
           round(coalesce(lag(price) OVER w, 0.0), 6) AS prev_price,
           floor(CASE WHEN lag(price) OVER w IS NULL OR lag(price) OVER w = 0 THEN 0.0
                      ELSE (price - lag(price) OVER w) / lag(price) OVER w * 100 END
                 * 1000000 + 0.5) / 1000000 AS variation_pct
    FROM bars
    WINDOW w AS (PARTITION BY ticker ORDER BY ts, seq)
    """,
    doc="A2/F15: day-over-day variation %% with the reference's zero/missing → 0.0 guard.",
)
def q_lag_variation(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    out = with_lag_variation(
        bars, value_col="price", key="ticker", order=["ts", "seq"], round_to=6
    )
    return out.select(
        "ticker",
        "seq",
        F.round("price", 6).alias("price"),
        F.round(F.coalesce("prev_value", F.lit(0.0)), 6).alias("prev_price"),
        "variation_pct",
    )


@register(
    "q_momentum_multilag",
    _BARS_CTE
    + """
    SELECT ticker, seq,
           round(coalesce(lag(price, 2)  OVER w, 0.0), 6) AS price_10min_ago,
           round(coalesce(lag(price, 6)  OVER w, 0.0), 6) AS price_30min_ago,
           round(coalesce(lag(price, 12) OVER w, 0.0), 6) AS price_1h_ago,
           round(coalesce(lag(price, 36) OVER w, 0.0), 6) AS price_3h_ago,
           round(coalesce(lag(price, 72) OVER w, 0.0), 6) AS price_6h_ago,
           floor(CASE WHEN coalesce(lag(price, 12) OVER w, 0.0) = 0 THEN 0.0
                      ELSE (price - lag(price, 12) OVER w) / lag(price, 12) OVER w * 100
                 END * 1000000 + 0.5) / 1000000 AS var_1h
    FROM bars
    WINDOW w AS (PARTITION BY ticker ORDER BY ts, seq)
    """,
    doc="A6/X3: intraday momentum — 2/6/12/36/72-bar lags (10m/30m/1h/3h/6h), "
    "0.0 fallback when insufficient history (producer.py:255-264).",
)
def q_momentum_multilag(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    out = with_momentum_lags(
        bars, value_col="price", key="ticker", order=["ts", "seq"], round_to=6
    )
    return out.select(
        "ticker", "seq",
        "price_10min_ago", "price_30min_ago", "price_1h_ago",
        "price_3h_ago", "price_6h_ago", "var_1h",
    )


@register(
    "q_trend_classify",
    _BARS_CTE
    + """
    SELECT ticker, seq, round(price, 6) AS price, floor(ma50 * 10000 + 0.5) / 10000 AS ma50,
           CASE WHEN price > ma50 THEN 'BULLISH'
                WHEN price < ma50 THEN 'BEARISH'
                ELSE 'NEUTRAL' END AS trend
    FROM (
        SELECT ticker, seq, price,
               CAST(sum(CAST(price AS DECIMAL(18,4))) OVER w AS DOUBLE)
                   / count(price) OVER w AS ma50
        FROM bars
        WINDOW w AS (PARTITION BY ticker ORDER BY ts, seq
                     ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
    )
    """,
    doc="A5: BULLISH/BEARISH/NEUTRAL vs MA50; NEUTRAL only on exact tie "
    "(single-row window ⇒ first bar of each series is NEUTRAL).",
)
def q_trend_classify(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    out = with_moving_averages(
        bars, value_col="price", key="ticker", order=["ts", "seq"], windows=(50,),
        exact=True,
    )
    out = with_trend(out, value_col="price", ma_col="ma50")
    return out.select(
        "ticker", "seq",
        F.round("price", 6).alias("price"),
        stable_round(F.col("ma50"), 4).alias("ma50"),
        "trend",
    )


@register(
    "q_daily_summary",
    _BARS_CTE
    + """
    , ranked AS (
        SELECT ticker, date_trunc('day', ts) AS day, price,
               row_number() OVER (PARTITION BY ticker, date_trunc('day', ts)
                                  ORDER BY ts, seq) AS rn_a,
               row_number() OVER (PARTITION BY ticker, date_trunc('day', ts)
                                  ORDER BY ts DESC, seq DESC) AS rn_d
        FROM bars
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           round(max(CASE WHEN rn_a = 1 THEN price END), 6) AS open_px,
           round(max(CASE WHEN rn_d = 1 THEN price END), 6) AS close_px,
           round(max(price), 6) AS high_px,
           round(min(price), 6) AS low_px,
           count(*) AS n_bars,
           floor(CASE WHEN round(max(CASE WHEN rn_a = 1 THEN price END), 6) IS NULL
                      OR round(max(CASE WHEN rn_a = 1 THEN price END), 6) = 0 THEN 0.0
                      ELSE (round(max(CASE WHEN rn_d = 1 THEN price END), 6)
                            - round(max(CASE WHEN rn_a = 1 THEN price END), 6))
                           / round(max(CASE WHEN rn_a = 1 THEN price END), 6) * 100 END
                 * 1000000 + 0.5) / 1000000 AS variation_pct
    FROM ranked
    GROUP BY ticker, day
    """,
    doc="A1/X2: per ticker-day OHLC summary (open=first, close=last by (ts,seq)) "
    "+ A2 variation. Spark side: min_by/max_by on composite sort key — one "
    "shuffle, no window pass.",
)
def q_daily_summary(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    return daily_summary(
        bars, value_col="price", volume_col=None, key="ticker", ts_col="ts", seq_col="seq"
    )


@register(
    "q_latest_per_key",
    _BARS_CTE
    + """
    SELECT ticker, seq, round(price, 6) AS price,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
    FROM (
        SELECT *, row_number() OVER (PARTITION BY ticker ORDER BY ts DESC, seq DESC) AS rn
        FROM bars
    ) WHERE rn = 1
    """,
    doc="A8/T5/S7: latest row per key (the reference's LATEST_* upsert reads).",
)
def q_latest_per_key(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    out = latest_per_key(bars, key="ticker", order=["ts", "seq"])
    return out.select(
        "ticker", "seq",
        F.round("price", 6).alias("price"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    )


@register(
    "q_keep_last_dedup",
    """
    SELECT user_id, event_type, event_id, round(value, 6) AS value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="W5/S4/X7: keep-last-on-collision upsert dedup (consumer.py:102-104 "
    "CSV keep-last; Chroma upsert-by-id).",
)
def q_keep_last_dedup(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    out = keep_last(e, key=["user_id", "event_type"], order=["ts", "event_id"])
    return out.select("user_id", "event_type", "event_id", F.round("value", 6).alias("value"))


@register(
    "q_tumbling_hourly",
    _BARS_CTE
    + """
    SELECT ticker, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           count(*) AS n_events,
           round(sum(price), 6) AS sum_value,
           round(min(price), 6) AS min_value,
           round(max(price), 6) AS max_value
    FROM bars
    GROUP BY ticker, date_trunc('hour', ts)
    """,
    doc="X2 batch equivalence: tumbling hourly window aggregate per ticker.",
)
def q_tumbling_hourly(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    return (
        bars.groupBy("ticker", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("price"), 6).alias("sum_value"),
            F.round(F.min("price"), 6).alias("min_value"),
            F.round(F.max("price"), 6).alias("max_value"),
        )
        .withColumn("hour", F.date_format("hour", "yyyy-MM-dd HH:00"))
    )


@register(
    "q_topn_per_feed",
    _BARS_CTE
    + """
    SELECT ticker, seq, round(price, 6) AS price, rn
    FROM (
        SELECT ticker, seq, price,
               row_number() OVER (PARTITION BY ticker ORDER BY ts DESC, seq DESC) AS rn
        FROM bars
    ) WHERE rn <= 3
    """,
    doc="T2: head-N per feed (first 3 RSS entries per ticker, producer.py:97).",
)
def q_topn_per_feed(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy(F.desc("ts"), F.desc("seq"))
    return (
        bars.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("ticker", "seq", F.round("price", 6).alias("price"), "rn")
    )


@register(
    "q_asof_last_value",
    """
    SELECT event_id, user_id, round(value, 6) AS value, round(last_click_value, 6) AS last_click_value
    FROM (
        SELECT event_id, user_id, event_type, value,
               last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_value
        FROM events
    ) WHERE event_type = 'purchase'
    """,
    doc="J1 generalized as-of join: for each purchase, the user's most recent "
    "prior click value — windowed last_value(ignore nulls), no physical join.",
)
def q_asof_last_value(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_val = F.when(F.col("event_type") == "click", F.col("value"))
    return (
        e.withColumn("last_click_value", F.last(click_val, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id",
            F.round("value", 6).alias("value"),
            F.round("last_click_value", 6).alias("last_click_value"),
        )
    )


@register(
    "q_json_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE event_type = 'error'
    """,
    doc="F16: JSON payload field extraction (the topic-payload decode path).",
)
def q_json_extract(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.where(F.col("event_type") == "error")
        .select("event_id", F.get_json_object("props", "$.k").cast("long").alias("k_val"))
    )


@register(
    "q_decay_score",
    """
    WITH x AS (
        SELECT event_id, value,
               epoch_us(ts) AS ts_us,
               max(epoch_us(ts)) OVER () AS now_us
        FROM events
    )
    SELECT event_id,
           round(exp(-((now_us - ts_us) / 1000000.0) / 14400.0), 6) AS decay,
           round(0.6 * (value / 100.0) + 0.4 * exp(-((now_us - ts_us) / 1000000.0) / 14400.0), 6) AS score
    FROM x
    """,
    doc="F12/F13: exponential time-decay freshness + 0.6*sim + 0.4*decay "
    "composite re-rank score (rag_engine.py:147-163); 'now' = max event time. "
    "'now' comes from a 1-row aggregate broadcast-cross-joined back in — a "
    "global window (max over ()) would funnel every row through a single "
    "partition, a scale-killer at 100 TB.",
)
def q_decay_score(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    now = e.agg(F.max(F.unix_micros("ts")).alias("__now_us"))
    e = e.crossJoin(F.broadcast(now))
    now_us = F.col("__now_us")
    age_sec = (now_us - F.unix_micros("ts")) / 1e6
    decay = F.exp(-age_sec / 14400.0)
    sim = F.col("value") / 100.0
    return e.select(
        "event_id",
        F.round(decay, 6).alias("decay"),
        F.round(F.lit(0.6) * sim + F.lit(0.4) * decay, 6).alias("score"),
    )


@register(
    "q_humanize_fmt",
    """
    SELECT event_id,
           -- the scaled quotient snaps to the 2-decimal grid (floor
           -- form) BEFORE formatting: Java's %.2f HALF_UPs the
           -- double's shortest decimal repr while C printf rounds its
           -- binary expansion, so un-snapped data-level half-cases
           -- (x.xx5) format differently — found by the x100
           -- magnitude-stress differential
           CASE WHEN value IS NULL THEN NULL
                WHEN value * 1000000 >= 1000000000
                     THEN printf('%.2fB', floor(value * 1000000 / 1000000000
                                                * 100 + 0.5) / 100)
                WHEN value * 1000000 >= 1000000
                     THEN printf('%.2fM', floor(value * 1000000 / 1000000
                                                * 100 + 0.5) / 100)
                WHEN value * 1000000 >= 1000
                     THEN printf('%.2fK', floor(value * 1000000 / 1000
                                                * 100 + 0.5) / 100)
                ELSE printf('%.2f', floor(value * 1000000 * 100 + 0.5) / 100)
           END AS human,
           CASE WHEN value < 5 THEN 'small' WHEN value < 15 THEN 'medium'
                WHEN value >= 15 THEN 'large' END AS bucket
    FROM events
    """,
    doc="F3/F4: number humanization ladder (main.py:21-33) + bucketing "
    "when-ladder. NULL-total: a valueless row humanizes AND buckets to "
    "NULL — an otherwise('large') branch mislabels null rows, and "
    "Spark's format_string renders a NULL %.2f as the garbage string "
    "'nu' where DuckDB printf yields NULL. UNIT-BOUNDARY RENDERING "
    "(accepted, documented): the unit branch is picked on the UN-"
    "snapped value and the mantissa is snapped AFTER the division, so "
    "a value just under a boundary (v/1e6 = 999.999999996) renders as "
    "'1000.00M' rather than rolling over to '1.00B'. Both engines "
    "compute the identical branch + snap, so the cross-engine contract "
    "holds; snapping before the branch would double-round the mantissa "
    "for no parity gain.",
)
def q_humanize_fmt(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    v = F.col("value") * 1e6
    # snap-before-format (mirrors the oracle's floor form): Java %.2f
    # HALF_UPs the shortest repr, C printf rounds the binary expansion
    human = (
        F.when(v >= 1e9, F.format_string("%.2fB", stable_round(v / 1e9, 2)))
        .when(v >= 1e6, F.format_string("%.2fM", stable_round(v / 1e6, 2)))
        .when(v >= 1e3, F.format_string("%.2fK", stable_round(v / 1e3, 2)))
        .when(v.isNotNull(), F.format_string("%.2f", stable_round(v, 2)))
    )
    bucket = (
        F.when(F.col("value") < 5, "small")
        .when(F.col("value") < 15, "medium")
        .when(F.col("value") >= 15, "large")
    )
    return e.select("event_id", human.alias("human"), bucket.alias("bucket"))


@register(
    "q_message_daily_summary",
    _BARS_CTE
    + """
    , ranked AS (
        SELECT ticker, date_trunc('day', ts) AS day, price, ts, seq,
               row_number() OVER (PARTITION BY ticker, date_trunc('day', ts) ORDER BY ts, seq) AS rn_a,
               row_number() OVER (PARTITION BY ticker, date_trunc('day', ts) ORDER BY ts DESC, seq DESC) AS rn_d
        FROM bars
    ), daily AS (
        SELECT ticker, day,
               max(CASE WHEN rn_a = 1 THEN price END) AS open_px,
               max(CASE WHEN rn_d = 1 THEN price END) AS close_px,
               max(price) AS high_px, min(price) AS low_px,
               count(*) AS n_bars
        FROM ranked GROUP BY ticker, day
    ), seq AS (
        SELECT *, lag(close_px) OVER (PARTITION BY ticker ORDER BY day) AS prev_close,
               row_number() OVER (PARTITION BY ticker ORDER BY day DESC) AS rn
        FROM daily
    )
    SELECT ticker,
           'Daily Summary ' || ticker AS title,
           'Daily Summary for ' || ticker || ':\n'
             || '- Open: ' || printf('%.2f', open_px) || '\n'
             || '- Close: ' || printf('%.2f', close_px) || '\n'
             || '- Variation: ' || printf('%.2f', CASE WHEN prev_close IS NULL OR prev_close = 0
                                                       THEN 0.0
                                                       ELSE (close_px - prev_close) / prev_close * 100 END) || '%\n'
             || '- Volume: ' || CAST(n_bars AS VARCHAR) || '\n'
             || '- Low: ' || printf('%.2f', low_px) || '\n'
             || '- High: ' || printf('%.2f', high_px) || '\n' AS summary,
           'daily_summary' AS type,
           'system_summary' AS source
    FROM seq WHERE rn = 1 AND prev_close IS NOT NULL
    """,
    doc="F2/A1/A9 template parity: the producer's daily-summary message "
    "(producer.py:154-199) rendered from the bar table — latest day per "
    "ticker, yesterday's-close variation, byte-compatible text (regex "
    "round-trip tested in pytest). Oracle checks the rendered string.",
)
def q_message_daily_summary(spark, sf_dir):
    from ..operators.analytics import daily_summary
    from ..operators.messages import daily_summary_messages

    bars = _bars(spark, sf_dir)
    daily = daily_summary(
        bars, value_col="price", volume_col=None, key="ticker", ts_col="ts",
        seq_col="seq", round_to=9,
    )
    # daily_summary() returns day as yyyy-MM-dd string — already sortable;
    # shape it like a bar table for the message builder.
    shaped = daily.select(
        "ticker", F.col("day").alias("date"),
        F.col("open_px").alias("Open"), F.col("close_px").alias("Close"),
        F.col("high_px").alias("High"), F.col("low_px").alias("Low"),
        F.col("n_bars").alias("Volume"),
    )
    msg = daily_summary_messages(shaped, publish_time=F.lit(0))
    return msg.select("ticker", "title", "summary", "type", "source")


@register(
    "q_chart_frame",
    _BARS_CTE
    + """
    , ranked AS (
        SELECT ticker, date_trunc('day', ts) AS day, price,
               row_number() OVER (PARTITION BY ticker, date_trunc('day', ts) ORDER BY ts DESC, seq DESC) AS rn_d
        FROM bars
    ), daily AS (
        SELECT ticker, strftime(day, '%Y-%m-%d') AS date,
               max(CASE WHEN rn_d = 1 THEN price END) AS close
        FROM ranked GROUP BY ticker, day
    )
    SELECT ticker, date,
           floor(CAST(sum(CAST(close AS DECIMAL(18,4))) OVER w10 AS DOUBLE)
                 / count(close) OVER w10 * 10000 + 0.5) / 10000 AS ma10,
           CASE WHEN count(close) OVER w50 >= 50
                THEN floor(CAST(sum(CAST(close AS DECIMAL(18,4))) OVER w50 AS DOUBLE)
                           / count(close) OVER w50 * 10000 + 0.5) / 10000 END AS ma50
    FROM daily
    WINDOW w10 AS (PARTITION BY ticker ORDER BY date ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
           w50 AS (PARTITION BY ticker ORDER BY date ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
    """,
    doc="S5+A3/A4 serving path (main.py:87-153): chart frame — daily "
    "closes + MA10 overlay, MA50 NULL until its window fills (the "
    "dashboard's len(df)>n gate).",
)
def q_chart_frame(spark, sf_dir):
    from ..operators.analytics import daily_summary

    bars = _bars(spark, sf_dir)
    daily = daily_summary(
        bars, value_col="price", volume_col=None, key="ticker", ts_col="ts",
        seq_col="seq", round_to=9,
    ).select("ticker", F.col("day").alias("date"), F.col("close_px").alias("close"))
    base = Window.partitionBy("ticker").orderBy("date")

    def ma_exact(n):
        fr = base.rowsBetween(-(n - 1), 0)
        return stable_round(
            F.sum(F.col("close").cast("decimal(18,4)")).over(fr).cast("double")
            / F.count("close").over(fr),
            4,
        )

    cnt50 = F.count("close").over(base.rowsBetween(-49, 0))
    return daily.select(
        "ticker", "date",
        ma_exact(10).alias("ma10"),
        F.when(cnt50 >= 50, ma_exact(50)).alias("ma50"),
    )


@register(
    "q_series_correlation",
    _BARS_CTE
    + """
    , daily AS (
        SELECT ticker, date_trunc('day', ts) AS d,
               sum(CAST(price AS DECIMAL(18,4))) AS v
        FROM bars GROUP BY ticker, date_trunc('day', ts)
    ),
    pairs AS (
        SELECT a.ticker AS ticker_a, b.ticker AS ticker_b,
               count(*) AS n,
               CAST(sum(a.v) AS DOUBLE) AS sx, CAST(sum(b.v) AS DOUBLE) AS sy,
               CAST(sum(a.v * b.v) AS DOUBLE) AS sxy,
               CAST(sum(a.v * a.v) AS DOUBLE) AS sxx,
               CAST(sum(b.v * b.v) AS DOUBLE) AS syy
        FROM daily a JOIN daily b ON a.d = b.d AND a.ticker < b.ticker
        GROUP BY a.ticker, b.ticker
    )
    SELECT ticker_a, ticker_b, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN floor((n * sxy - sx * sy)
                           / (sqrt(n * sxx - sx * sx)
                              * sqrt(n * syy - sy * sy))
                           * 1000000 + 0.5) / 1000000 END AS r
    FROM pairs
    ORDER BY ticker_a, ticker_b
    """,
    doc="Time-series similarity (pairwise Pearson correlation of daily "
    "price-sum series, all ticker pairs aligned on day): the 'which "
    "series move together' market query. Engine-portable exactness: the "
    "five sufficient statistics are DECIMAL-exact sums (bit-identical "
    "across engines), combined into r with one double expression — "
    "float corr() accumulates in engine-dependent order and can't be "
    "hash-compared. Join keys on the day grid; at scale the pair "
    "fan-out is |tickers|^2/2 per day bucket, bounded by the universe "
    "size, never by row count.",
)
def q_series_correlation(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    daily = bars.groupBy(
        "ticker", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(F.col("price").cast("decimal(18,4)")).alias("v"))
    a = daily.select(F.col("ticker").alias("ticker_a"), "d", F.col("v").alias("va"))
    b = daily.select(F.col("ticker").alias("ticker_b"), "d", F.col("v").alias("vb"))
    pairs = (
        a.join(b, "d")
        .where(F.col("ticker_a") < F.col("ticker_b"))
        .groupBy("ticker_a", "ticker_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("va").cast("double").alias("sx"),
            F.sum("vb").cast("double").alias("sy"),
            F.sum(F.col("va") * F.col("vb")).cast("double").alias("sxy"),
            F.sum(F.col("va") * F.col("va")).cast("double").alias("sxx"),
            F.sum(F.col("vb") * F.col("vb")).cast("double").alias("syy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    # zero variance on either series (flat prices) leaves Pearson
    # undefined: explicit NULL, never an ANSI /0 crash
    r = F.when((vx > 0) & (vy > 0), (n * F.col("sxy") - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)))
    return pairs.select(
        "ticker_a", "ticker_b", "n", stable_round(r, 6).alias("r")
    ).orderBy("ticker_a", "ticker_b")


#: EWMA weights 0.9^j for j=0..99 by repeated multiplication — embedded
#: as identical double literals in BOTH engines (repr round-trips
#: exactly), so no pow() libm divergence can enter the differential.
_EWMA_WEIGHTS = [1.0]
for _ in range(99):
    _EWMA_WEIGHTS.append(_EWMA_WEIGHTS[-1] * 0.9)

_EWMA_NUM_SQL = " + ".join(
    f"coalesce(lag(price, {j}) OVER w * {w!r}, 0.0)"
    for j, w in enumerate(_EWMA_WEIGHTS)
)
_EWMA_DEN_SQL = " + ".join(
    f"(CASE WHEN lag(price, {j}) OVER w IS NOT NULL THEN {w!r} ELSE 0.0 END)"
    for j, w in enumerate(_EWMA_WEIGHTS)
)


@register(
    "q_ewma",
    _BARS_CTE
    + f"""
    SELECT ticker, seq,
           floor(({_EWMA_NUM_SQL}) / ({_EWMA_DEN_SQL}) * 1000000 + 0.5)
               / 1000000 AS ewma
    FROM bars
    WINDOW w AS (PARTITION BY ticker ORDER BY ts, seq)
    ORDER BY ticker, seq
    """,
    doc="Exponentially weighted moving average (alpha=0.1, adjusted, "
    "100-term truncated kernel) as an Arrow-batched numpy convolution "
    "over HALO BLOCKS: each key's row sequence is cut into 4096-row "
    "blocks and the 99 rows preceding a block are replicated into it, "
    "so every emitted row sees its full truncated kernel while no task "
    "ever holds more than one block (+ halo) in memory. This removes "
    "the one-task-per-key wall of a naive groupBy(key).applyInPandas — "
    "an oversized key (one hot ticker with billions of rows at 100 TB) "
    "parallelizes across blocks, and state per task is O(block), not "
    "O(history). The j-loop accumulates num[i] += price[i-j]*w_j in the "
    "SAME left-associated order as the oracle's lag-sum, so the double-"
    "op sequence is bitwise identical on both sides (hash-exact; halo "
    "rows are computed then dropped; +0.0 terms for missing lags are "
    "IEEE no-ops). The truncation (0.9^100 ~ 3e-5) is exactly what "
    "makes EWMA a *windowed* operator at scale instead of an unbounded "
    "scan-order recursion — the streaming-native recursive form is "
    "streaming/stateful.ewma_per_key_stateful.",
)
def q_ewma(spark, sf_dir):
    return ewma_blocked(_bars(spark, sf_dir))


def ewma_blocked(b, block_size: int = 4096):
    """Halo-block EWMA execution over a (ticker, ts, seq, price) frame;
    see q_ewma's registration doc. ``block_size`` must exceed the
    100-term kernel so a block's halo lives entirely in its predecessor;
    tests shrink it to force many boundary crossings. Block scaffolding
    is the shared ``operators/indicators.halo_block_apply``; the prefix
    denominators use the same left-associated accumulation as the
    oracle's CASE chain (``left_prefix``)."""
    import numpy as np
    import pandas as pd

    from ..operators.indicators import halo_block_apply, left_prefix

    weights = list(_EWMA_WEIGHTS)
    prefix = left_prefix(weights)
    HALO = len(weights) - 1  # preceding rows replicated into the next block

    def kernel_rows(pdf: pd.DataFrame, own) -> pd.DataFrame:
        price = pdf["price"].to_numpy(dtype=np.float64)
        n = len(price)
        # NULL-aware num/den, mirroring the oracle's coalesce/CASE
        # chains (q_macd's kernel discipline): a null price (NaN in the
        # Arrow batch) contributes nothing and its weight leaves the
        # denominator, instead of poisoning every window that sees it.
        # The denominator accumulates in the same left-associated
        # j-order as the old dense prefix table, so clean-data outputs
        # are bit-identical. A window with no prices at all is NULL.
        m = ~np.isnan(price)
        pz = np.where(m, price, 0.0)
        num = np.zeros(n, dtype=np.float64)
        den = np.zeros(n, dtype=np.float64)
        for j, wt in enumerate(weights):
            if j >= n:
                break
            num[j:] += pz[: n - j] * wt
            den[j:] += m[: n - j] * wt
        with np.errstate(invalid="ignore", divide="ignore"):
            ewma = np.floor(num / den * 1e6 + 0.5) / 1e6  # stable_round(·, 6)
        ewma[den == 0.0] = np.nan
        out = pd.array(ewma[own], dtype="Float64")
        out[np.isnan(ewma[own])] = pd.NA  # NaN -> NULL (oracle's 0/0)
        return pd.DataFrame(
            {
                "ticker": pdf["ticker"].to_numpy()[own],
                "seq": pdf["seq"].to_numpy()[own],
                "ewma": out,
            }
        )

    return halo_block_apply(
        b, kernel_rows, halo=HALO, block_size=block_size,
        out_schema="ticker string, seq bigint, ewma double",
    ).orderBy("ticker", "seq")


@register(
    "q_validity_intervals",
    _BARS_CTE
    + """
    SELECT ticker, seq,
           round(price, 6) AS price,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER w AS valid_to_us,
           (lead(epoch_us(ts)) OVER w IS NULL) AS is_current
    FROM bars
    WINDOW w AS (PARTITION BY ticker ORDER BY ts, seq)
    ORDER BY ticker, seq
    """,
    doc="SCD2-style validity intervals: each observation holds from its "
    "own timestamp until the next one for the same key (NULL = still "
    "current) — the dimension-versioning primitive behind as-of lookups "
    "and temporal joins, as ONE lead() window pass (single shuffle on "
    "the key; the streaming form is the keep-last upsert plus history "
    "append in streaming/upsert.py).",
)
def q_validity_intervals(spark, sf_dir):
    b = _bars(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy("ts", "seq")
    ts_us = F.unix_micros("ts")
    nxt = F.lead(ts_us).over(w)
    return (
        b.select(
            "ticker",
            "seq",
            F.round("price", 6).alias("price"),
            ts_us.alias("valid_from_us"),
            nxt.alias("valid_to_us"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("ticker", "seq")
    )


@register(
    "q_resample_weekly",
    _BARS_CTE
    + """
    , ranked AS (
        SELECT ticker, date_trunc('week', ts) AS week, price,
               row_number() OVER (PARTITION BY ticker, date_trunc('week', ts)
                                  ORDER BY ts, seq) AS rn_a,
               row_number() OVER (PARTITION BY ticker, date_trunc('week', ts)
                                  ORDER BY ts DESC, seq DESC) AS rn_d
        FROM bars
    )
    SELECT ticker, strftime(week, '%Y-%m-%d') AS week,
           round(max(CASE WHEN rn_a = 1 THEN price END), 6) AS open,
           round(max(price), 6) AS high,
           round(min(price), 6) AS low,
           round(max(CASE WHEN rn_d = 1 THEN price END), 6) AS close,
           count(*)::BIGINT AS n_bars
    FROM ranked
    GROUP BY ticker, week
    ORDER BY ticker, week
    """,
    doc="OHLC resampling to weekly candles (pandas resample('W').ohlc() "
    "re-expressed): open/close via min_by/max_by over a (ts, seq) struct "
    "ordering — the seq tiebreak keeps duplicate-timestamp ticks "
    "deterministic — so the WHOLE resample is one map-side-combined hash "
    "aggregate: no per-row window, no sort, one shuffle on "
    "(ticker, week). The oracle mirrors with the row_number-rank form "
    "(q_daily_summary's idiom), NOT DuckDB's arg_min: arg_min SKIPS "
    "null values while Spark's min_by keeps the first tick's price "
    "even when that tick is unpriced — the repo-wide first-ROW "
    "semantics (a candle that opens on a valueless tick has a NULL "
    "open, it doesn't borrow a later price).",
)
def q_resample_weekly(spark, sf_dir):
    from ..operators.timeseries import resample_ohlc

    candles = resample_ohlc(
        _bars(spark, sf_dir), key="ticker", ts="ts", price="price",
        seq="seq", unit="week",
    )
    return candles.select(
        "ticker",
        F.date_format("period", "yyyy-MM-dd").alias("week"),
        F.round("open", 6).alias("open"),
        F.round("high", 6).alias("high"),
        F.round("low", 6).alias("low"),
        F.round("close", 6).alias("close"),
        F.col("n_bars").cast("long").alias("n_bars"),
    ).orderBy("ticker", "week")


@register(
    "q_gapfill_daily",
    """
    WITH ranked AS (
        SELECT user_id % 97 AS sid, CAST(ts AS DATE) AS day, value,
               row_number() OVER (PARTITION BY user_id % 97, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ),
    daily AS (
        -- rank form, not arg_max: arg_max SKIPS null values while
        -- Spark's max_by keeps the last row's value even when null
        SELECT sid, day, max(CASE WHEN rn = 1 THEN value END) AS close
        FROM ranked GROUP BY sid, day
    ),
    spans AS (SELECT sid, min(day) AS a, max(day) AS b FROM daily GROUP BY sid),
    cal AS (
        SELECT sid, unnest(generate_series(a, b, INTERVAL 1 DAY))::DATE AS day
        FROM spans
    ),
    j AS (
        SELECT c.sid, c.day, d.close, (d.sid IS NULL) AS synthesized
        FROM cal c LEFT JOIN daily d ON c.sid = d.sid AND c.day = d.day
    )
    SELECT sid, strftime(day, '%Y-%m-%d') AS day,
           round(last_value(close IGNORE NULLS) OVER (
               PARTITION BY sid ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS close_filled,
           synthesized AS is_filled
    FROM j ORDER BY sid, day
    """,
    doc="Calendar gap-fill + forward-fill (pandas asfreq('D').ffill() "
    "re-expressed) over 97 sparse per-user-bucket daily series: each "
    "key's calendar is generated with sequence+explode (row growth = "
    "gap count only, never a global cross join), observations join back "
    "on (key, day), and the fill is one last(ignore nulls) window pass "
    "— one shuffle on the key, partition-parallel across keys. "
    "is_filled marks synthesized rows; no row before a key's first "
    "observation is ever created, so the fill is total. Last-of-day "
    "close uses the same tie-robust (ts, seq) ordering as the resampler.",
)
def q_gapfill_daily(spark, sf_dir):
    from ..operators.timeseries import gap_fill_daily

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        (F.col("user_id") % 97).alias("sid"),
        F.to_date("ts").alias("day"),
    ).agg(
        F.max_by("value", F.struct(F.col("ts"), F.col("event_id"))).alias("close")
    )
    filled = gap_fill_daily(daily, key="sid", day="day", value_cols=["close"])
    return filled.select(
        "sid",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("close", 6).alias("close_filled"),
        "is_filled",
    ).orderBy("sid", "day")


@register(
    "q_bollinger",
    _BARS_CTE
    + """
    , runs AS (
        SELECT ticker, ts, seq,
               sum(CAST(price AS DECIMAL(18,4))) OVER run AS sx,
               sum(CAST(price * price AS DECIMAL(28,8))) OVER run AS sx2,
               count(price) OVER run AS c
        FROM bars
        WINDOW run AS (PARTITION BY ticker ORDER BY ts, seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), frames AS (
        SELECT ticker, seq,
               sx  - coalesce(lag(sx,  20) OVER base, 0) AS sx_n,
               sx2 - coalesce(lag(sx2, 20) OVER base, 0) AS sx2_n,
               c   - coalesce(lag(c,   20) OVER base, 0) AS c_n
        FROM runs
        WINDOW base AS (PARTITION BY ticker ORDER BY ts, seq)
    ), bands AS (
        SELECT ticker, seq, c_n,
               CAST(sx_n AS DOUBLE) / c_n AS mean,
               sqrt(greatest(
                   (CAST(sx2_n AS DOUBLE)
                    - CAST(sx_n AS DOUBLE) * CAST(sx_n AS DOUBLE) / c_n)
                   / (c_n - 1), 0.0)) AS std
        FROM frames
    )
    SELECT ticker, seq,
           floor(mean * 10000 + 0.5) / 10000 AS bb_mid,
           CASE WHEN c_n >= 2
                THEN floor((mean + 2.0 * std) * 10000 + 0.5) / 10000 END AS bb_upper,
           CASE WHEN c_n >= 2
                THEN floor((mean - 2.0 * std) * 10000 + 0.5) / 10000 END AS bb_lower
    FROM bands
    """,
    doc="Bollinger bands (20-period mean ± 2·sample-stddev): the rolling "
    "second-moment indicator, lowered like q_ma_rolling — exact DECIMAL "
    "running-sum differences for Σx and Σx² (O(1)/row, no frame "
    "re-aggregation, no float accumulation order), float math only AFTER "
    "the exact differences in an expression order the oracle mirrors "
    "term by term. Bands null until the window holds ≥2 rows; near-zero "
    "variance float residue clamped at 0. One shuffle+sort serves all "
    "three output columns. The frame-diff CTE carries ts and orders "
    "by (ts, seq) exactly like the Spark side — ordering by seq alone "
    "relied on seq/ts co-monotonicity, which replayed-offset "
    "duplicates (new ids, old timestamps) break (replay-axis "
    "finding).",
)
def q_bollinger(spark, sf_dir):
    from ..functions.scalars import stable_round
    from ..operators.indicators import with_bollinger

    out = with_bollinger(_bars(spark, sf_dir), n=20, k=2.0)
    return out.select(
        "ticker",
        "seq",
        stable_round(F.col("bb_mid"), 4).alias("bb_mid"),
        stable_round(F.col("bb_upper"), 4).alias("bb_upper"),
        stable_round(F.col("bb_lower"), 4).alias("bb_lower"),
    )


@register(
    "q_rsi",
    _BARS_CTE
    + """
    , d AS (
        SELECT ticker, ts, seq,
               price - lag(price) OVER (PARTITION BY ticker ORDER BY ts, seq)
                   AS delta
        FROM bars
    ), g AS (
        SELECT ticker, ts, seq,
               CASE WHEN delta > 0 THEN delta  ELSE 0.0 END AS gain,
               CASE WHEN delta < 0 THEN -delta ELSE 0.0 END AS loss,
               CASE WHEN delta IS NOT NULL THEN 1 ELSE 0 END AS has
        FROM d
    ), runs AS (
        SELECT ticker, ts, seq,
               sum(CAST(gain AS DECIMAL(18,4))) OVER run AS sg,
               sum(CAST(loss AS DECIMAL(18,4))) OVER run AS sl,
               sum(has) OVER run AS sh
        FROM g
        WINDOW run AS (PARTITION BY ticker ORDER BY ts, seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), frames AS (
        SELECT ticker, seq,
               CAST(sg - coalesce(lag(sg, 14) OVER base, 0) AS DOUBLE) AS g_n,
               CAST(sl - coalesce(lag(sl, 14) OVER base, 0) AS DOUBLE) AS l_n,
               sh - coalesce(lag(sh, 14) OVER base, 0) AS h_n
        FROM runs
        WINDOW base AS (PARTITION BY ticker ORDER BY ts, seq)
    )
    SELECT ticker, seq,
           CASE WHEN h_n < 14 THEN NULL
                WHEN l_n = 0.0 AND g_n = 0.0 THEN 50.0
                WHEN l_n = 0.0 THEN 100.0
                ELSE floor((100.0 - 100.0 / (1.0 + g_n / l_n)) * 10000 + 0.5)
                     / 10000 END AS rsi
    FROM frames
    """,
    doc="Cutler's RSI (14-period, simple moving averages of gains and "
    "losses — the deterministic window-expressible variant; Wilder's "
    "recursive smoothing is the EWMA kernel's job, see q_ewma): "
    "100 - 100/(1 + SMA(gain)/SMA(loss)) with the same decimal "
    "running-sum-difference lowering as q_ma_rolling/q_bollinger. Null "
    "until 14 deltas exist; all-loss ⇒ 0, all-gain ⇒ 100, flat ⇒ 50 "
    "(zero-denominator conventions made explicit on both sides).",
)
def q_rsi(spark, sf_dir):
    from ..functions.scalars import stable_round
    from ..operators.indicators import with_rsi

    out = with_rsi(_bars(spark, sf_dir), n=14)
    return out.select(
        "ticker",
        "seq",
        stable_round(F.col("rsi"), 4).alias("rsi"),
    )


def _ewm_chain(col: str, weights: list[float]) -> tuple[str, str]:
    """Left-associated lag-sum numerator/denominator chains for an
    adjusted truncated EWM over ``col`` — the oracle mirror of the
    halo-block kernel's j-loop accumulation order (see q_ewma). Weight
    literals are cast ::DOUBLE explicitly: DuckDB otherwise types them
    DECIMAL, making the denominator chain decimal arithmetic (overflow
    past ~100 16-decimal terms, and not the kernel's IEEE ops)."""
    num = " + ".join(
        f"coalesce(lag({col}, {j}) OVER w * {w!r}::DOUBLE, 0.0)"
        for j, w in enumerate(weights)
    )
    den = " + ".join(
        f"(CASE WHEN lag({col}, {j}) OVER w IS NOT NULL THEN {w!r}::DOUBLE ELSE 0.0 END)"
        for j, w in enumerate(weights)
    )
    return num, den


def _macd_oracle_sql() -> str:
    from ..operators.indicators import (
        MACD_K_FAST,
        MACD_K_SIG,
        MACD_K_SLOW,
        ewm_weights,
    )

    numf, denf = _ewm_chain("price", ewm_weights(2.0 / 13.0, MACD_K_FAST))
    nums, dens = _ewm_chain("price", ewm_weights(2.0 / 27.0, MACD_K_SLOW))
    numg, deng = _ewm_chain("macd", ewm_weights(2.0 / 10.0, MACD_K_SIG))
    return (
        _BARS_CTE
        + f"""
    , m AS (
        SELECT ticker, ts, seq,
               ({numf}) / ({denf}) - ({nums}) / ({dens}) AS macd
        FROM bars
        WINDOW w AS (PARTITION BY ticker ORDER BY ts, seq)
    ), s AS (
        SELECT ticker, ts, seq, macd,
               ({numg}) / ({deng}) AS signal
        FROM m
        WINDOW w AS (PARTITION BY ticker ORDER BY ts, seq)
    )
    SELECT ticker, seq,
           floor(macd * 1000000 + 0.5) / 1000000 AS macd,
           floor(signal * 1000000 + 0.5) / 1000000 AS signal,
           floor((macd - signal) * 1000000 + 0.5) / 1000000 AS histogram
    FROM s
    """
    )


@register(
    "q_macd",
    _macd_oracle_sql(),
    doc="MACD(12/26/9) — adjusted truncated-kernel form, computed in ONE "
    "halo-block Arrow pass (operators/indicators.macd_blocked): "
    "macd = EMA12 - EMA26 over price, signal = EMA9 over the MACD "
    "SERIES, histogram = macd - signal. The composed convolution needs "
    "halo (K_slow-1)+(K_sig-1) = 160 rows; a hot key still "
    "parallelizes across 4096-row blocks with O(block) task state. "
    "The oracle chains 70+110 price lags for macd and 52 macd lags for "
    "signal in the kernel's exact left-associated accumulation order, "
    "so all three outputs hash-match bit-for-bit at 6-decimal stable "
    "rounding. The recursive adjust=False EMA remains the streaming "
    "kernel's job (streaming/stateful).",
)
def q_macd(spark, sf_dir):
    from ..functions.scalars import stable_round
    from ..operators.indicators import macd_blocked

    out = macd_blocked(_bars(spark, sf_dir))
    return out.select(
        "ticker",
        "seq",
        stable_round(F.col("macd"), 6).alias("macd"),
        stable_round(F.col("signal"), 6).alias("signal"),
        stable_round(F.col("histogram"), 6).alias("histogram"),
    )


@register(
    "q_drawdown",
    _BARS_CTE
    + """
    , dd AS (
        SELECT ticker, ts, seq, price,
               CASE WHEN max(price) OVER peak = 0.0 THEN NULL
                    ELSE price / max(price) OVER peak - 1.0 END AS drawdown
        FROM bars
        WINDOW peak AS (PARTITION BY ticker ORDER BY ts, seq
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ticker,
           floor(min(drawdown) * 1000000 + 0.5) / 1000000 AS max_drawdown,
           floor(arg_max(drawdown,
                 lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                 || lpad(CAST(seq AS VARCHAR), 20, '0')) * 1000000 + 0.5)
               / 1000000 AS final_drawdown,
           count(*)::BIGINT AS n_bars
    FROM dd GROUP BY ticker ORDER BY ticker
    """,
    doc="Maximum drawdown per ticker: drawdown = price / running-peak - 1 "
    "(one running-max window pass — the peak is an actual data value, no "
    "float accumulation), max_drawdown = min over rows, final_drawdown = "
    "the last row with a DEFINED drawdown (tie-robust (ts, seq) "
    "ordering; the null-key max_by mirrors DuckDB arg_max's null "
    "skipping). A zero running peak (a series opening at price 0) "
    "yields NULL drawdown on both sides — total under ANSI mode instead "
    "of a Spark DIVIDE_BY_ZERO. The aggregates are order-insensitive "
    "over bit-identical per-row quotients; the OUTPUT rounding uses the "
    "engine-portable floor form (the quotient is a computed double, "
    "where Spark's and DuckDB's round() half-case semantics can "
    "differ). One shuffle on the key serves both the window and the "
    "final aggregate.",
)
def q_drawdown(spark, sf_dir):
    b = _bars(spark, sf_dir)
    w = (
        Window.partitionBy("ticker")
        .orderBy("ts", "seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("price").over(w)
    dd = b.withColumn(
        "drawdown",
        F.when(peak != 0.0, F.col("price") / peak - 1.0),
    )
    return (
        dd.groupBy("ticker")
        .agg(
            stable_round(F.min("drawdown"), 6).alias("max_drawdown"),
            stable_round(
                F.max_by(
                    "drawdown",
                    F.when(
                        F.col("drawdown").isNotNull(),
                        F.struct(F.col("ts"), F.col("seq")),
                    ),
                ),
                6,
            ).alias("final_drawdown"),
            F.count(F.lit(1)).cast("long").alias("n_bars"),
        )
        .orderBy("ticker")
    )


@register(
    "q_beta_daily",
    """
    WITH ranked AS (
        SELECT event_type AS ticker, CAST(ts AS DATE) AS day, value,
               row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    ),
    daily AS (
        -- rank form, not arg_max (null-keeping max_by mirror)
        SELECT ticker, day, max(CASE WHEN rn_d = 1 THEN value END) AS close
        FROM ranked GROUP BY 1, 2
    ),
    rets AS (
        SELECT ticker, day,
               CASE WHEN lag(close) OVER w IS NULL
                      OR lag(close) OVER w = 0.0
                      OR abs(close / lag(close) OVER w - 1.0) >= 99.0
                    THEN NULL
                    ELSE CAST(close / lag(close) OVER w - 1.0
                              AS DECIMAL(8,6)) END AS r
        FROM daily
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ),
    mkt AS (
        SELECT day, CAST(sum(r) AS DECIMAL(18,6)) AS m
        FROM rets WHERE r IS NOT NULL GROUP BY day
    ),
    j AS (
        SELECT rets.ticker, CAST(rets.r AS DECIMAL(8,6)) AS r, mkt.m
        FROM rets JOIN mkt ON rets.day = mkt.day
        WHERE rets.r IS NOT NULL
    ),
    sums AS (
        SELECT ticker,
               count(*) AS n,
               sum(r) AS sx, sum(m) AS sy,
               sum(r * m) AS sxy, sum(m * m) AS syy
        FROM j GROUP BY ticker
    )
    SELECT ticker, n::BIGINT AS n_days,
           CASE WHEN n < 2
                     OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0.0
                THEN NULL
                ELSE floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                           * 1000000 + 0.5) / 1000000 END AS beta
    FROM sums ORDER BY ticker
    """,
    doc="Per-ticker beta vs the cross-sectional return basket: daily "
    "closes (tie-robust last-of-day), simple returns, market series = "
    "per-day SUM of returns (an equal-weight basket up to the constant "
    "ticker count — betas scale by 1/n_tickers vs the textbook mean "
    "basket; the sum form keeps every aggregate DECIMAL-EXACT, since a "
    "mean would reintroduce engine-specific decimal division). Returns "
    "are quantized to DECIMAL(8,6) — the scale is chosen so EVERY "
    "product stays within precision 38 on BOTH engines ((8,6)x(18,6) → "
    "(27,12); (18,6)² → (37,12)); a wider scale silently demotes "
    "Spark's product type and the moment sums stop being exact. With "
    "that, Σx, Σy, Σxy, Σy² are exact and the closed-form "
    "beta = (nΣxy - ΣxΣy)/(nΣy² - (Σy)²) is evaluated in double in an "
    "identical expression order — hash-exact. Totality under ANSI "
    "mode: a zero previous close, a return beyond the quantization "
    "range (|r| ≥ 99), and a zero variance denominator (a ticker with "
    "one return) all yield NULL on both sides instead of a Spark "
    "DIVIDE_BY_ZERO/overflow error. One shuffle to daily closes, one "
    "to per-day market sums (broadcast back), one to per-ticker sums.",
)
def q_beta_daily(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type").alias("ticker"), F.to_date("ts").alias("day")
    ).agg(
        F.max_by("value", F.struct(F.col("ts"), F.col("event_id"))).alias("close")
    )
    w = Window.partitionBy("ticker").orderBy("day")
    prev = F.lag("close").over(w)
    raw_r = F.col("close") / prev - 1.0
    rets = daily.select(
        "ticker",
        "day",
        F.when(
            prev.isNotNull() & (prev != 0.0), raw_r
        ).alias("rr"),
    ).select(
        "ticker",
        "day",
        F.when(F.abs(F.col("rr")) < 99.0, F.col("rr"))
        .cast("decimal(8,6)")
        .alias("r"),
    )
    nn = rets.where(F.col("r").isNotNull())
    mkt = nn.groupBy("day").agg(
        F.sum("r").cast("decimal(18,6)").alias("m")
    )
    j = nn.join(F.broadcast(mkt), "day")
    sums = j.groupBy("ticker").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("sx"),
        F.sum("m").alias("sy"),
        F.sum(F.col("r") * F.col("m")).alias("sxy"),
        F.sum(F.col("m") * F.col("m")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, syy = F.col("sxy").cast("double"), F.col("syy").cast("double")
    den = n_d * syy - sy * sy
    from ..functions.scalars import stable_round

    return sums.select(
        "ticker",
        F.col("n").cast("long").alias("n_days"),
        F.when(
            (F.col("n") >= 2) & (den != 0.0),
            stable_round((n_d * sxy - sx * sy) / den, 6),
        ).alias("beta"),
    ).orderBy("ticker")


@register(
    "q_stochastic",
    _BARS_CTE
    + """
    , k AS (
        SELECT ticker, ts, seq,
               CASE WHEN max(price) OVER w14 = min(price) OVER w14 THEN NULL
                    ELSE (price - min(price) OVER w14)
                         / (max(price) OVER w14 - min(price) OVER w14) * 100.0
               END AS pk_raw
        FROM bars
        WINDOW w14 AS (PARTITION BY ticker ORDER BY ts, seq
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ), q AS (
        SELECT ticker, ts, seq, CAST(pk_raw AS DECIMAL(10,6)) AS pk
        FROM k
    ), runs AS (
        SELECT ticker, ts, seq, pk,
               sum(pk) OVER run AS s,
               count(pk) OVER run AS c
        FROM q
        WINDOW run AS (PARTITION BY ticker ORDER BY ts, seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ticker, seq,
           floor(CAST(pk AS DOUBLE) * 10000 + 0.5) / 10000 AS pct_k,
           CASE WHEN c - coalesce(lag(c, 3) OVER base, 0) = 3
                THEN floor(CAST(s - coalesce(lag(s, 3) OVER base, 0) AS DOUBLE)
                           / 3.0 * 10000 + 0.5) / 10000 END AS pct_d
    FROM runs
    WINDOW base AS (PARTITION BY ticker ORDER BY ts, seq)
    """,
    doc="Stochastic oscillator %K/%D (14, 3): %K positions the close "
    "inside the rolling 14-bar [min, max] range — window EXTREMES are "
    "actual data values (order-insensitive, no float accumulation), and "
    "a flat window (max == min) yields NULL on both engines instead of "
    "an ANSI DIVIDE_BY_ZERO. %D is the 3-bar SMA of %K via the "
    "decimal-quantized running-sum difference (the q_ma_rolling "
    "lowering; a plain float window avg would be "
    "accumulation-order-dependent across engines), emitted only when 3 "
    "non-null %K values fill the frame. One shuffle+sort serves the "
    "range window, the running sums, and the lag pass; every window "
    "orders by (ts, seq) on both sides — seq-only ordering relied on "
    "seq/ts co-monotonicity, which replayed offsets break.",
)
def q_stochastic(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    base = Window.partitionBy("ticker").orderBy("ts", "seq")
    w14 = base.rowsBetween(-13, 0)
    hi, lo = F.max("price").over(w14), F.min("price").over(w14)
    pk_raw = F.when(hi != lo, (F.col("price") - lo) / (hi - lo) * 100.0)
    q = bars.select(
        "ticker", "ts", "seq", pk_raw.cast("decimal(10,6)").alias("pk")
    )
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    runs = q.select(
        "ticker",
        "ts",
        "seq",
        "pk",
        F.sum("pk").over(run).alias("s"),
        F.count("pk").over(run).alias("c"),
    )
    s_3 = F.col("s") - F.coalesce(
        F.lag("s", 3).over(base), F.lit(0).cast("decimal(20,6)")
    )
    c_3 = F.col("c") - F.coalesce(F.lag("c", 3).over(base), F.lit(0))
    return runs.select(
        "ticker",
        "seq",
        stable_round(F.col("pk").cast("double"), 4).alias("pct_k"),
        F.when(
            c_3 == 3, stable_round(s_3.cast("double") / 3.0, 4)
        ).alias("pct_d"),
    )


