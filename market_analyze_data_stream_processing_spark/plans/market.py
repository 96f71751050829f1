"""Market-analytics queries (SURVEY.md §2.4/2.5/2.6/2.9 [D] operators)
replayed over the synthetic ``events`` stream table, prices-shaped:
ticker ≈ event_type, price ≈ value, seq = event_id (deterministic
tiebreak for duplicate timestamps).

These are the reference's producer/consumer computations — rolling MAs,
lag variation, multi-lag momentum, trend, daily OHLC summary, latest-per-
key, keep-last dedup — as declarative window/agg plans. Batch-over-stream
equivalence: the same operator functions are reused by streaming/.
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
from ..sources.tables import load_table
from .registry import register

#: DuckDB CTE mirroring _bars() below.
_BARS_CTE = """
WITH bars AS (
    SELECT event_type AS ticker, ts, value AS price, event_id AS seq
    FROM events
)
"""


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


# ---------------------------------------------------------------------------
# Round-8 indicator tier: volume-aware and daily-bar indicators.
# ---------------------------------------------------------------------------

_VBARS_CTE = """
WITH vbars AS (
    SELECT event_type AS ticker, ts, value AS price, event_id AS seq,
           (user_id % 997) + 1 AS vol
    FROM events
)
"""

_DAILYBARS_CTE = """
WITH __db_ranked AS (
    -- rank form, not arg_max: arg_max SKIPS null values while Spark's
    -- max_by keeps the last tick's value even when that tick is
    -- unpriced (repo-wide first/last-ROW semantics)
    SELECT event_type AS ticker, CAST(ts AS DATE) AS day, value,
           row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
), dailybars AS (
    SELECT ticker, day, max(value) AS high, min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close
    FROM __db_ranked GROUP BY ticker, day
)
"""


def _vbars(spark, sf_dir):
    """Tick bars with a deterministic integral volume column: the events
    table carries no volume, so ``(user_id % 997) + 1`` stands in — an
    arbitrary-but-fixed positive BIGINT both engines derive identically."""
    return load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("ticker"),
        "ts",
        F.col("value").alias("price"),
        F.col("event_id").alias("seq"),
        ((F.col("user_id") % 997) + 1).cast("long").alias("vol"),
    )


def _daily_bars(spark, sf_dir):
    """Daily H/L/C bars per ticker (resample_ohlc at day grain)."""
    from ..operators.timeseries import resample_ohlc

    return (
        resample_ohlc(_bars(spark, sf_dir), unit="day")
        .withColumnRenamed("period", "day")
        .select("ticker", "day", "high", "low", "close")
    )


@register(
    "q_obv",
    _VBARS_CTE
    + """
    , d AS (
        SELECT ticker, ts, seq, vol,
               price - lag(price) OVER (PARTITION BY ticker ORDER BY ts, seq)
                   AS delta
        FROM vbars
    ), s AS (
        SELECT ticker, ts, seq,
               CASE WHEN delta > 0 THEN vol
                    WHEN delta < 0 THEN -vol ELSE 0 END AS sv
        FROM d
    )
    SELECT ticker, seq,
           CAST(sum(sv) OVER (PARTITION BY ticker ORDER BY ts, seq
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS obv
    FROM s
    """,
    doc="On-balance volume: running sum of sign(Δprice)·volume per "
    "ticker. Volume is integral ((user_id % 997) + 1 — the events table "
    "has no volume column, so a fixed derivation stands in), so the "
    "cumulative sum stays in exact LONG arithmetic: order-insensitive, "
    "no decimal quantization, bit-equal across engines by construction. "
    "One (ticker, ts, seq) shuffle+sort serves the lag and the running "
    "sum.",
)
def q_obv(spark, sf_dir):
    from ..operators.indicators import with_obv

    out = with_obv(_vbars(spark, sf_dir))
    return out.select("ticker", "seq", F.col("obv").cast("long").alias("obv"))


@register(
    "q_atr",
    _DAILYBARS_CTE
    + """
    , tr AS (
        SELECT ticker, day,
               CASE WHEN lag(close) OVER w IS NULL THEN high - low
                    ELSE greatest(high - low,
                                  abs(high - lag(close) OVER w),
                                  abs(low  - lag(close) OVER w)) END AS tr
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), runs AS (
        SELECT ticker, day, tr,
               sum(CAST(tr AS DECIMAL(18,6))) OVER run AS s,
               count(tr) OVER run AS c
        FROM tr
        WINDOW run AS (PARTITION BY ticker ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           floor(tr * 1000000 + 0.5) / 1000000 AS tr,
           CASE WHEN c - coalesce(lag(c, 14) OVER base, 0) >= 14
                THEN floor(CAST(s - coalesce(lag(s, 14) OVER base, 0) AS DOUBLE)
                           / (c - coalesce(lag(c, 14) OVER base, 0))
                           * 1000000 + 0.5) / 1000000 END AS atr
    FROM runs
    WINDOW base AS (PARTITION BY ticker ORDER BY day)
    """,
    doc="ATR(14) over daily H/L/C bars (resample_ohlc at day grain — "
    "one hash aggregate, then one (ticker, day) window pass). True "
    "range = max(H-L, |H-prev C|, |L-prev C|), degrading to H-L on each "
    "key's first bar; ATR is the 14-day SMA of TR via the exact decimal "
    "running-sum difference (the q_ma_rolling lowering — Wilder's "
    "recursive smoothing is the EWMA kernel's job, like q_rsi). Null "
    "until 14 true ranges exist.",
)
def q_atr(spark, sf_dir):
    from ..operators.indicators import with_atr

    out = with_atr(_daily_bars(spark, sf_dir), n=14)
    return out.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        stable_round(F.col("tr"), 6).alias("tr"),
        stable_round(F.col("atr"), 6).alias("atr"),
    )


@register(
    "q_vwap",
    _VBARS_CTE
    + """
    SELECT ticker, seq,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS session,
           floor(CAST(sum(CAST(floor(price * vol * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) OVER run
                      AS DOUBLE)
                 / sum(vol) OVER run * 10000 + 0.5) / 10000 AS vwap
    FROM vbars
    WINDOW run AS (PARTITION BY ticker, CAST(ts AS DATE) ORDER BY ts, seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Anchored (intraday) VWAP: within each (ticker, session-day), "
    "cumulative Σ(price·vol)/Σvol ordered by (ts, seq) — the running "
    "fair-value line that resets at each session open. Σ(price·vol) "
    "accumulates in DECIMAL (exact, order-insensitive), Σvol in LONG; "
    "the double division happens once per row AFTER the exact sums. One "
    "shuffle on (ticker, day): a key's sessions parallelize across "
    "partitions — no per-ticker serialization at scale.",
)
def q_vwap(spark, sf_dir):
    from ..operators.indicators import with_vwap_anchored

    out = with_vwap_anchored(_vbars(spark, sf_dir))
    return out.select(
        "ticker",
        "seq",
        F.date_format("session", "yyyy-MM-dd").alias("session"),
        stable_round(F.col("vwap"), 4).alias("vwap"),
    )


@register(
    "q_donchian",
    _BARS_CTE
    + """
    , ch AS (
        SELECT ticker, ts, seq, price,
               max(price) OVER w AS up,
               min(price) OVER w AS lo,
               count(price) OVER w AS c
        FROM bars
        WINDOW w AS (PARTITION BY ticker ORDER BY ts, seq
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT ticker, seq,
           CASE WHEN c >= 20 THEN up END AS dc_upper,
           CASE WHEN c >= 20 THEN lo END AS dc_lower,
           CASE WHEN c >= 20
                THEN floor((up + lo) / 2.0 * 10000 + 0.5) / 10000 END AS dc_mid,
           CASE WHEN lag(c) OVER base >= 20
                THEN price > lag(up) OVER base END AS breakout_up,
           CASE WHEN lag(c) OVER base >= 20
                THEN price < lag(lo) OVER base END AS breakout_down
    FROM ch
    WINDOW base AS (PARTITION BY ticker ORDER BY ts, seq)
    """,
    doc="Donchian channel (20): rolling high/low/mid plus breakout flags "
    "— price strictly beyond the PREVIOUS row's completed channel "
    "(comparing against the current channel would be vacuous: the "
    "current price is inside it by construction). Bounds are actual "
    "data values (no float accumulation); channel and flags null-gate "
    "until the window (respectively the previous row's window) is "
    "full. Two stacked Window operators share one (ticker, ts, seq) "
    "shuffle+sort; every window orders by (ts, seq) on both sides — "
    "seq-only ordering relied on seq/ts co-monotonicity, which "
    "replayed offsets break.",
)
def q_donchian(spark, sf_dir):
    from ..operators.indicators import with_donchian

    out = with_donchian(_bars(spark, sf_dir), n=20)
    return out.select(
        "ticker",
        "seq",
        "dc_upper",
        "dc_lower",
        stable_round(F.col("dc_mid"), 4).alias("dc_mid"),
        "breakout_up",
        "breakout_down",
    )


@register(
    "q_aroon",
    _BARS_CTE
    + """
    , r AS (
        SELECT ticker, ts, seq, price,
               row_number() OVER (PARTITION BY ticker ORDER BY ts, seq) AS rn
        FROM bars
    ), x AS (
        SELECT ticker, seq, rn,
               (max([price, CAST(rn AS DOUBLE)]) OVER w)[2] AS hi_rn,
               -((min([price, -CAST(rn AS DOUBLE)]) OVER w)[2]) AS lo_rn,
               count(price) OVER w AS c
        FROM r
        WINDOW w AS (PARTITION BY ticker ORDER BY ts, seq
                     ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
    )
    SELECT ticker, seq,
           CASE WHEN c >= 25
                THEN floor(100.0 * (24 - (rn - hi_rn)) / 24 * 10000 + 0.5)
                     / 10000 END AS aroon_up,
           CASE WHEN c >= 25
                THEN floor(100.0 * (24 - (rn - lo_rn)) / 24 * 10000 + 0.5)
                     / 10000 END AS aroon_down
    FROM x
    """,
    doc="Aroon up/down (25-row window): 100·(24 - rows_since_extreme)/24, "
    "most-recent extreme on ties for BOTH sides (the high tiebreak is "
    "free from lexicographic struct max; the low negates the row number "
    "so min-struct also lands on the latest). The windowed ARGMAX "
    "POSITION is max(struct(price, rn)) — an aggregate over data "
    "values, no float accumulation — mirrored in the oracle by DuckDB's "
    "lexicographic list max (rn < 2^53, so its DOUBLE image is exact). "
    "Null until the window holds 25 rows.",
)
def q_aroon(spark, sf_dir):
    from ..operators.indicators import with_aroon

    out = with_aroon(_bars(spark, sf_dir), n=25)
    return out.select(
        "ticker",
        "seq",
        stable_round(F.col("aroon_up"), 4).alias("aroon_up"),
        stable_round(F.col("aroon_down"), 4).alias("aroon_down"),
    )


@register(
    "q_cci",
    _DAILYBARS_CTE
    + """
    , t AS (
        SELECT ticker, day, (high + low + close) / 3.0 AS tp,
               row_number() OVER (PARTITION BY ticker ORDER BY day) AS rn
        FROM dailybars
    ), runs AS (
        SELECT ticker, day, tp, rn,
               sum(CAST(tp AS DECIMAL(18,6))) OVER run AS s,
               count(tp) OVER run AS c,
               list([CAST(rn AS DOUBLE), tp]) OVER w20 AS vals
        FROM t
        WINDOW run AS (PARTITION BY ticker ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w20 AS (PARTITION BY ticker ORDER BY day
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ), f AS (
        SELECT ticker, day, tp, vals,
               CAST(s - coalesce(lag(s, 20) OVER base, 0) AS DOUBLE)
                   / (c - coalesce(lag(c, 20) OVER base, 0)) AS sma,
               c - coalesce(lag(c, 20) OVER base, 0) AS cn
        FROM runs
        WINDOW base AS (PARTITION BY ticker ORDER BY day)
    ), m AS (
        SELECT ticker, day, tp, sma, cn,
               list_reduce(list_transform(list_sort(vals),
                                          x -> abs(x[2] - sma)),
                           (a, b) -> a + b) / cn AS mad
        FROM f
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           floor(tp * 1000000 + 0.5) / 1000000 AS tp,
           CASE WHEN cn >= 20 AND mad <> 0.0
                THEN floor((tp - sma) / (0.015 * mad) * 10000 + 0.5)
                     / 10000 END AS cci
    FROM m
    """,
    doc="CCI(20) over daily bars: (TP - SMA(TP,20)) / (0.015·MAD), "
    "TP=(H+L+C)/3, MAD = mean absolute deviation around the window's "
    "OWN mean. MAD cannot lower to a running-sum difference (each "
    "row's deviations center on that row's mean), so the honest "
    "lowering is a WINDOWED ARRAY FOLD: collect the 20-row frame "
    "(bounded — never a skew risk), sort by row number for a canonical "
    "order, left-fold Σ|tp - sma| in that exact order, and have the "
    "oracle replay the same sequence (list_sort + list_transform + "
    "list_reduce; Spark's 0.0-seeded fold and DuckDB's seedless "
    "first-element fold are IEEE-identical since 0.0 + x == x). SMA "
    "itself stays on the exact decimal running-sum difference. O(n) "
    "per row — the price of the statistic, stated rather than hidden. "
    "Null until the window is full or when MAD = 0 (flat window).",
)
def q_cci(spark, sf_dir):
    from ..operators.indicators import with_cci

    out = with_cci(_daily_bars(spark, sf_dir), n=20)
    return out.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        stable_round(F.col("tp"), 6).alias("tp"),
        stable_round(F.col("cci"), 4).alias("cci"),
    )


_ORDKEY = ("lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') "
           "|| lpad(CAST(event_id AS VARCHAR), 20, '0')")

_DAILYOHLC_CTE = """
WITH __do_ranked AS (
    -- rank form, not arg_min/arg_max: those SKIP null values while
    -- Spark's min_by/max_by keep the first/last tick's value even when
    -- that tick is unpriced (repo-wide first/last-ROW semantics)
    SELECT event_type AS ticker, CAST(ts AS DATE) AS day, value,
           row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
), dailyohlc AS (
    SELECT ticker, day,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close
    FROM __do_ranked GROUP BY ticker, day
)
"""

_DAILYVOL_CTE = """
WITH __dv_ranked AS (
    -- rank form, not arg_max (see _DAILYOHLC_CTE)
    SELECT event_type AS ticker, CAST(ts AS DATE) AS day, value,
           (user_id % 997) + 1 AS tick_vol,
           row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
), dailyvol AS (
    SELECT ticker, day, max(value) AS high, min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(sum(tick_vol) AS BIGINT) AS vol
    FROM __dv_ranked GROUP BY ticker, day
)
"""


def _daily_ohlc(spark, sf_dir):
    """Daily O/H/L/C bars per ticker (resample_ohlc at day grain)."""
    from ..operators.timeseries import resample_ohlc

    return (
        resample_ohlc(_bars(spark, sf_dir), unit="day")
        .withColumnRenamed("period", "day")
        .select("ticker", "day", "open", "high", "low", "close")
    )


def _daily_vol_bars(spark, sf_dir):
    """Daily H/L/C bars plus summed volume (from the _vbars derivation)."""
    v = _vbars(spark, sf_dir)
    order = F.struct(F.col("ts"), F.col("seq"))
    return v.groupBy("ticker", F.col("ts").cast("date").alias("day")).agg(
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.max_by(F.col("price"), order).alias("close"),
        F.sum("vol").alias("vol"),
    )


@register(
    "q_volatility_estimators",
    _DAILYOHLC_CTE
    + """
    , terms AS (
        SELECT ticker,
               ln(high / low) AS lhl, ln(close / open) AS lco,
               ln(high / close) AS lhc, ln(high / open) AS lho,
               ln(low / close) AS llc, ln(low / open) AS llo
        FROM dailyohlc WHERE low > 0
    )
    SELECT ticker, CAST(count(*) AS BIGINT) AS n_days,
           round(sqrt(avg(lhl * lhl) / 2.772588722239781), 6) AS park_vol,
           round(sqrt(greatest(avg(0.5 * lhl * lhl
                                   - 0.3862943611198906 * lco * lco), 0.0)), 6)
               AS gk_vol,
           round(sqrt(greatest(avg(lhc * lho + llc * llo), 0.0)), 6) AS rs_vol
    FROM terms GROUP BY ticker ORDER BY ticker
    """,
    doc="Range-based volatility estimators per ticker over daily OHLC "
    "bars: Parkinson (log-range), Garman-Klass (range + open-close "
    "drift term, clamped at 0), Rogers-Satchell (drift-independent). "
    "Two hash aggregates total (tick->daily resample, daily->ticker "
    "estimate) with map-side partials and a one-row-per-key output — "
    "no window pass, no per-key serialization; zero-low bars are "
    "excluded (degenerate under ANSI; n_days counts kept bars); the "
    "per-bar terms are "
    "fixed-order double expressions, so only the final mean is a float "
    "accumulation (round 6, the registry's float discipline).",
)
def q_volatility_estimators(spark, sf_dir):
    from ..operators.volatility import ohlc_volatility

    # low > 0 excludes degenerate zero-price bars: every OHLC value on a
    # true bar is >= low, so one predicate makes all six log-ratios
    # finite (and total under ANSI division).
    out = ohlc_volatility(_daily_ohlc(spark, sf_dir).where(F.col("low") > 0))
    return out.select(
        "ticker",
        "n_days",
        F.round("park_vol", 6).alias("park_vol"),
        F.round("gk_vol", 6).alias("gk_vol"),
        F.round("rs_vol", 6).alias("rs_vol"),
    ).orderBy("ticker")


@register(
    "q_autocorr",
    _DAILYBARS_CTE
    + """
    , r AS (
        SELECT ticker, day,
               CASE WHEN close > 0 AND lag(close) OVER w > 0
                    THEN """
    + quantize_sql("ln(close / lag(close) OVER w)")
    + """ END AS r
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), lagged AS (
        SELECT ticker, r,
               lag(r, 1) OVER w AS r1,
               lag(r, 2) OVER w AS r2,
               lag(r, 5) OVER w AS r5
        FROM r
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), m AS (
        SELECT ticker, count(r) AS n_returns,
               """
    + corr_moments_sql("r", "r1", "l1")
    + ",\n"
    + corr_moments_sql("r", "r2", "l2")
    + ",\n"
    + corr_moments_sql("r", "r5", "l5")
    + f"""
        FROM lagged GROUP BY ticker
    )
    SELECT ticker, CAST(n_returns AS BIGINT) AS n_returns,
           {stable_round_sql(corr_value_sql('l1'), 6)} AS acf_1,
           {stable_round_sql(corr_value_sql('l2'), 6)} AS acf_2,
           {stable_round_sql(corr_value_sql('l5'), 6)} AS acf_5
    FROM m ORDER BY ticker
    """,
    doc="Autocorrelation of daily log returns at lags 1/2/5 per ticker "
    "— the mean-reversion / momentum diagnostic. One (ticker, day) "
    "window pass materializes the lagged return columns, then ONE hash "
    "aggregate computes all three sample Pearson correlations through "
    "the exact-moment kernel (operators/stats.py: 1e-12-quantized "
    "returns, DECIMAL moment sums, variance>0 gate — built-in corr() "
    "DIVIDE_BY_ZEROs under ANSI on a flat series and is banned). "
    "Series-head and zero-close nulls drop out of each lag's pairs "
    "only; flat series yield NULL ACFs on every engine.",
)
def q_autocorr(spark, sf_dir):
    from ..operators.volatility import return_autocorr

    out = return_autocorr(_daily_bars(spark, sf_dir), lags=(1, 2, 5))
    return out.select(
        "ticker",
        "n_returns",
        stable_round(F.col("acf_1"), 6).alias("acf_1"),
        stable_round(F.col("acf_2"), 6).alias("acf_2"),
        stable_round(F.col("acf_5"), 6).alias("acf_5"),
    ).orderBy("ticker")


@register(
    "q_williams_mfi",
    _DAILYVOL_CTE
    + """
    , w AS (
        SELECT ticker, day, high, low, close, vol,
               max(high) OVER f AS hh, min(low) OVER f AS ll,
               count(close) OVER f AS cw
        FROM dailyvol
        WINDOW f AS (PARTITION BY ticker ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ), d AS (
        SELECT ticker, day, close, hh, ll, cw,
               (high + low + close)
                   - lag(high + low + close) OVER b AS delta,
               CAST(floor((high + low + close) * vol * 1000000.0 + 0.5)
                    / 1000000.0 AS DECIMAL(28,6)) AS mf
        FROM w
        WINDOW b AS (PARTITION BY ticker ORDER BY day)
    ), s AS (
        SELECT ticker, day, close, hh, ll, cw,
               CASE WHEN delta > 0 THEN mf
                    ELSE CAST(0 AS DECIMAL(28,6)) END AS pos,
               CASE WHEN delta < 0 THEN mf
                    ELSE CAST(0 AS DECIMAL(28,6)) END AS neg,
               CASE WHEN delta IS NULL THEN 0 ELSE 1 END AS has
        FROM d
    ), runs AS (
        SELECT ticker, day, close, hh, ll, cw,
               sum(CAST(pos AS DECIMAL(38,6))) OVER run AS sp,
               sum(CAST(neg AS DECIMAL(38,6))) OVER run AS sn,
               sum(has) OVER run AS sh
        FROM s
        WINDOW run AS (PARTITION BY ticker ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN cw >= 14 AND hh <> ll
                THEN floor(-100.0 * (hh - close) / (hh - ll) * 10000 + 0.5)
                     / 10000 END AS willr,
           CASE WHEN sh - coalesce(lag(sh, 14) OVER b, 0) >= 14 THEN
                CASE WHEN CAST(sn - coalesce(lag(sn, 14) OVER b,
                                             CAST(0 AS DECIMAL(38,6)))
                          AS DOUBLE) = 0.0
                     THEN CASE WHEN CAST(sp - coalesce(lag(sp, 14) OVER b,
                                                       CAST(0 AS DECIMAL(38,6)))
                                    AS DOUBLE) = 0.0
                               THEN 50.0 ELSE 100.0 END
                     ELSE floor((100.0 - 100.0 / (1.0
                              + CAST(sp - coalesce(lag(sp, 14) OVER b,
                                                   CAST(0 AS DECIMAL(38,6)))
                                     AS DOUBLE)
                              / CAST(sn - coalesce(lag(sn, 14) OVER b,
                                                   CAST(0 AS DECIMAL(38,6)))
                                     AS DOUBLE))) * 10000 + 0.5) / 10000 END
           END AS mfi
    FROM runs
    WINDOW b AS (PARTITION BY ticker ORDER BY day)
    ORDER BY ticker, day
    """,
    doc="Williams %R(14) + Money Flow Index(14) over daily H/L/C bars "
    "with summed volume. %R is a pure frame-extrema quotient (null on "
    "unfilled or flat windows); MFI is a volume-weighted RSI on the "
    "typical price, computed on 3*TP = H+L+C (the /3 cancels in "
    "posMF/negMF) so raw money flow casts to DECIMAL losslessly and "
    "the rolling flows use the exact running-sum-difference lowering. "
    "One (ticker, day) shuffle+sort serves every window pass.",
)
def q_williams_mfi(spark, sf_dir):
    from ..operators.indicators import with_mfi, with_williams_r

    daily = _daily_vol_bars(spark, sf_dir)
    out = with_mfi(with_williams_r(daily, n=14), n=14)
    return out.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        stable_round(F.col("willr"), 4).alias("willr"),
        stable_round(F.col("mfi"), 4).alias("mfi"),
    )


@register(
    "q_ichimoku",
    _BARS_CTE
    + """
    , ch AS (
        SELECT ticker, ts, seq, price,
               CASE WHEN count(price) OVER w9 >= 9
                    THEN (max(price) OVER w9 + min(price) OVER w9) / 2.0
               END AS tenkan,
               CASE WHEN count(price) OVER w26 >= 26
                    THEN (max(price) OVER w26 + min(price) OVER w26) / 2.0
               END AS kijun,
               CASE WHEN count(price) OVER w52 >= 52
                    THEN (max(price) OVER w52 + min(price) OVER w52) / 2.0
               END AS mid_s
        FROM bars
        WINDOW w9  AS (PARTITION BY ticker ORDER BY ts, seq
                       ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
               w26 AS (PARTITION BY ticker ORDER BY ts, seq
                       ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
               w52 AS (PARTITION BY ticker ORDER BY ts, seq
                       ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)
    )
    SELECT ticker, seq,
           floor(tenkan * 10000 + 0.5) / 10000 AS tenkan,
           floor(kijun * 10000 + 0.5) / 10000 AS kijun,
           floor(lag((tenkan + kijun) / 2.0, 26) OVER b * 10000 + 0.5) / 10000
               AS senkou_a,
           floor(lag(mid_s, 26) OVER b * 10000 + 0.5) / 10000 AS senkou_b,
           lead(price, 26) OVER b AS chikou
    FROM ch
    WINDOW b AS (PARTITION BY ticker ORDER BY ts, seq)
    """,
    doc="Ichimoku cloud at bar grain (9/26/52 bars): tenkan/kijun "
    "rolling midlines, senkou A/B displaced forward 26 bars (lag over "
    "the bar order — today's cloud was drawn 26 bars ago), chikou = "
    "price displaced back (lead 26). Every output is a midpoint of "
    "actual frame extrema — no accumulation — and all six window "
    "passes share ONE (ticker, ts, seq) shuffle+sort; null-gated "
    "until each lookback fills.",
)
def q_ichimoku(spark, sf_dir):
    from ..operators.indicators import with_ichimoku

    out = with_ichimoku(_bars(spark, sf_dir))
    return out.select(
        "ticker",
        "seq",
        stable_round(F.col("tenkan"), 4).alias("tenkan"),
        stable_round(F.col("kijun"), 4).alias("kijun"),
        stable_round(F.col("senkou_a"), 4).alias("senkou_a"),
        stable_round(F.col("senkou_b"), 4).alias("senkou_b"),
        "chikou",
    )


@register(
    "q_keltner",
    _DAILYBARS_CTE
    + """
    , tr AS (
        SELECT ticker, day, high, low, close,
               CASE WHEN lag(close) OVER w IS NULL THEN high - low
                    ELSE greatest(high - low,
                                  abs(high - lag(close) OVER w),
                                  abs(low  - lag(close) OVER w)) END AS tr
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), runs AS (
        SELECT ticker, day,
               sum(CAST(tr AS DECIMAL(18,6))) OVER run AS s_tr,
               count(tr) OVER run AS c_tr,
               sum(CAST(high + low + close AS DECIMAL(18,4))) OVER run AS s_tp,
               count(*) OVER run AS c_tp
        FROM tr
        WINDOW run AS (PARTITION BY ticker ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), m AS (
        SELECT ticker, day,
               CASE WHEN c_tp - coalesce(lag(c_tp, 10) OVER b, 0) >= 10
                    THEN CAST(s_tp - coalesce(lag(s_tp, 10) OVER b,
                                              CAST(0 AS DECIMAL(28,4)))
                              AS DOUBLE)
                         / (c_tp - coalesce(lag(c_tp, 10) OVER b, 0)) / 3.0
               END AS basis,
               CASE WHEN c_tr - coalesce(lag(c_tr, 10) OVER b, 0) >= 10
                    THEN CAST(s_tr - coalesce(lag(s_tr, 10) OVER b,
                                              CAST(0 AS DECIMAL(28,6)))
                              AS DOUBLE)
                         / (c_tr - coalesce(lag(c_tr, 10) OVER b, 0))
               END AS atr
        FROM runs
        WINDOW b AS (PARTITION BY ticker ORDER BY day)
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           floor(basis * 10000 + 0.5) / 10000 AS kc_mid,
           floor((basis + 2.0 * atr) * 10000 + 0.5) / 10000 AS kc_upper,
           floor((basis - 2.0 * atr) * 10000 + 0.5) / 10000 AS kc_lower
    FROM m
    ORDER BY ticker, day
    """,
    doc="Keltner channel (SMA form): basis = SMA(typical price, 10), "
    "bands = basis +/- 2*ATR(10) over daily bars. Computed on 3*TP = "
    "H+L+C (exact in double for fixed-point prices -> lossless DECIMAL "
    "running sums; the /3 happens once after the exact frame "
    "difference) and reuses the decimal ATR lowering of q_atr — both "
    "running sums and the frame differences share one (ticker, day) "
    "shuffle+sort. Bands null-gate until both windows fill.",
)
def q_keltner(spark, sf_dir):
    from ..operators.indicators import with_keltner

    out = with_keltner(_daily_bars(spark, sf_dir), n_ma=10, n_atr=10, k=2.0)
    return out.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        stable_round(F.col("kc_mid"), 4).alias("kc_mid"),
        stable_round(F.col("kc_upper"), 4).alias("kc_upper"),
        stable_round(F.col("kc_lower"), 4).alias("kc_lower"),
    )


@register(
    "q_capped_growth",
    _DAILYBARS_CTE
    + """
    , r AS (
        SELECT ticker, day,
               CASE WHEN lag(close) OVER w > 0
                    THEN least(greatest(close / lag(close) OVER w - 1.0,
                                        -0.05), 0.05) END AS rc
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), lr AS (
        -- snap-then-cast (quantize discipline): a bare double->DECIMAL
        -- cast is knife-edge-prone cross-engine on full-mantissa input
        SELECT ticker, day,
               coalesce(CAST(floor(ln(1.0 + rc) * 1000000000000.0 + 0.5)
                             / 1000000000000.0 AS DECIMAL(28,12)),
                        CAST(0 AS DECIMAL(28,12))) AS lr
        FROM r
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           CAST(sum(lr) OVER run AS DOUBLE) AS log_growth
    FROM lr
    WINDOW run AS (PARTITION BY ticker ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY ticker, day
    """,
    doc="Winsorized growth-of-$1 index per ticker: daily close returns "
    "clamped to +/-5% (so the compounding does NOT telescope to a "
    "price ratio — the cap is the point: robust compounding that a "
    "single bad print can't dominate), reported in LOG space: the "
    "DECIMAL(28,12) running sum of the log1p terms itself (growth = "
    "exp(log_growth), a presentation step left to the consumer). The "
    "log terms are quantized to DECIMAL(28,12) BEFORE the running "
    "sum, making the accumulation exact and order-independent (a "
    "plain double running sum is engine-implementation-dependent — "
    "segment-tree vs sequential); a final exp() would be a libm call "
    "whose 1-ULP JVM-vs-DuckDB divergence survives fixed-decimal "
    "rounding once the index grows large (the reproduced "
    "q_portfolio_return failure class). One (ticker, day) window "
    "pass.",
)
def q_capped_growth(spark, sf_dir):
    base = Window.partitionBy("ticker").orderBy("day")
    d = _daily_bars(spark, sf_dir)
    prev = F.lag("close").over(base)
    rc = F.when(
        prev > 0,
        F.least(F.greatest(F.col("close") / prev - 1.0, F.lit(-0.05)), F.lit(0.05)),
    )
    # snap-then-cast (quantize): bare double->DECIMAL is knife-edge-prone
    lr = F.coalesce(
        quantize(F.log(F.lit(1.0) + rc)),
        F.lit(0).cast("decimal(28,12)"),
    )
    staged = d.withColumn("__lr", lr)
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    return staged.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.sum("__lr").over(run).cast("double").alias("log_growth"),
    ).orderBy("ticker", "day")


@register(
    "q_twap",
    _BARS_CTE
    + """
    , t AS (
        SELECT ticker, CAST(ts AS DATE) AS day, price,
               lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dt
        FROM bars
        WINDOW w AS (PARTITION BY ticker, CAST(ts AS DATE) ORDER BY ts, seq)
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN sum(dt) > 0
                THEN floor(CAST(sum(CAST(floor(price * dt + 0.5) AS DECIMAL(28,4))) AS DOUBLE)
                           / sum(dt) * 10000 + 0.5) / 10000 END AS twap,
           CAST(count(dt) AS BIGINT) AS n_intervals
    FROM t WHERE dt IS NOT NULL
    GROUP BY ticker, day ORDER BY ticker, day
    """,
    doc="Time-weighted average price per (ticker, session-day): each "
    "tick's price weighted by the microseconds until the NEXT tick "
    "(the last tick of a day carries no interval and drops out) — the "
    "execution-quality benchmark that, unlike VWAP, is immune to "
    "volume bursts. dt is an integer difference of within-day "
    "timestamps (timezone-free by construction); price*dt casts to "
    "DECIMAL so the weighted sum is exact and order-free; one window "
    "pass on (ticker, day) then one hash aggregate.",
)
def q_twap(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    w = Window.partitionBy("ticker", F.col("ts").cast("date")).orderBy("ts", "seq")
    dt = F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    staged = bars.withColumns(
        {"day": F.col("ts").cast("date"), "dt": dt}
    ).where(F.col("dt").isNotNull())
    return (
        staged.groupBy("ticker", "day")
        .agg(
            stable_round(
                F.when(
                    F.sum("dt") > 0,
                    F.sum(# INTEGER-grid snap: dt is in MICROSECONDS, so price*dt reaches
                    # ~1e14 at stressed magnitudes — a 4-digit grid would cross
                    # the 2^53 exactness bound and saturate the LONG floor at
                    # 2^63 on gap rows; grid 1 keeps exactness to 9e15 with
                    # relative error ~1e-14, far below the 4dp output round
                    quantize(F.col("price") * F.col("dt"), 0, "decimal(28,4)"))
                    .cast("double")
                    / F.sum("dt"),
                ),
                4,
            ).alias("twap"),
            F.count("dt").alias("n_intervals"),
        )
        .select(
            "ticker",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "twap",
            "n_intervals",
        )
        .orderBy("ticker", "day")
    )


@register(
    "q_pivot_points",
    _DAILYBARS_CTE
    + """
    , p AS (
        SELECT ticker, day,
               lag(high)  OVER w AS ph,
               lag(low)   OVER w AS pl,
               lag(close) OVER w AS pc
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           floor((ph + pl + pc) / 3.0 * 10000 + 0.5) / 10000 AS pivot,
           floor((2.0 * ((ph + pl + pc) / 3.0) - pl) * 10000 + 0.5) / 10000
               AS r1,
           floor((2.0 * ((ph + pl + pc) / 3.0) - ph) * 10000 + 0.5) / 10000
               AS s1,
           floor(((ph + pl + pc) / 3.0 + (ph - pl)) * 10000 + 0.5) / 10000
               AS r2,
           floor(((ph + pl + pc) / 3.0 - (ph - pl)) * 10000 + 0.5) / 10000
               AS s2
    FROM p ORDER BY ticker, day
    """,
    doc="Classic floor-trader pivot levels for each session from the "
    "PREVIOUS day's H/L/C: P=(H+L+C)/3, R1=2P-L, S1=2P-H, R2=P+(H-L), "
    "S2=P-(H-L). Pure lag arithmetic on data values — no accumulation "
    "anywhere, one (ticker, day) window pass; null on each ticker's "
    "first session.",
)
def q_pivot_points(spark, sf_dir):
    base = Window.partitionBy("ticker").orderBy("day")
    d = _daily_bars(spark, sf_dir)
    ph = F.lag("high").over(base)
    pl = F.lag("low").over(base)
    pc = F.lag("close").over(base)
    piv = (ph + pl + pc) / 3.0
    return d.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        stable_round(piv, 4).alias("pivot"),
        stable_round(2.0 * piv - pl, 4).alias("r1"),
        stable_round(2.0 * piv - ph, 4).alias("s1"),
        stable_round(piv + (ph - pl), 4).alias("r2"),
        stable_round(piv - (ph - pl), 4).alias("s2"),
    ).orderBy("ticker", "day")


@register(
    "q_sharpe",
    _DAILYBARS_CTE
    + """
    , r AS (
        SELECT ticker,
               CASE WHEN close > 0 AND lag(close) OVER w > 0
                    THEN ln(close / lag(close) OVER w) END AS r
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    )
    SELECT ticker, CAST(count(r) AS BIGINT) AS n_returns,
           round(avg(r), 6) AS mean_r,
           round(stddev_samp(r), 6) AS std_r,
           round(avg(r) / stddev_samp(r) * 15.874507866387544, 6)
               AS sharpe_ann
    FROM r GROUP BY ticker ORDER BY ticker
    """,
    doc="Per-ticker annualized Sharpe ratio (rf=0) over daily log "
    "returns: mean/stddev * sqrt(252), zero-close returns nulled for "
    "ANSI totality. One window pass for returns + one hash aggregate; "
    "float moments round at 6 (registry float discipline).",
)
def q_sharpe(spark, sf_dir):
    from ..operators.volatility import sharpe_ratio

    out = sharpe_ratio(_daily_bars(spark, sf_dir))
    return out.select(
        "ticker",
        "n_returns",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("std_r", 6).alias("std_r"),
        F.round("sharpe_ann", 6).alias("sharpe_ann"),
    ).orderBy("ticker")


@register(
    "q_amihud",
    _VBARS_CTE
    + """
    , ranked AS (
        SELECT ticker, CAST(ts AS DATE) AS day, price, vol,
               row_number() OVER (PARTITION BY ticker, CAST(ts AS DATE)
                                  ORDER BY ts DESC, seq DESC) AS rn_d
        FROM vbars
    ), daily AS (
        -- rank form, not arg_max: arg_max SKIPS null prices while
        -- Spark's max_by keeps the last tick's value even when null
        SELECT ticker, day,
               max(CASE WHEN rn_d = 1 THEN price END) AS close,
               CAST(sum(CAST(floor(price * vol * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE)
                   AS dollar_vol
        FROM ranked GROUP BY 1, 2
    ), r AS (
        SELECT ticker, day, dollar_vol,
               CASE WHEN lag(close) OVER w > 0
                    THEN abs(close / lag(close) OVER w - 1.0) END AS abs_r
        FROM daily
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    )
    SELECT ticker, CAST(count(abs_r) AS BIGINT) AS n_days,
           floor(avg(abs_r / dollar_vol * 1000000.0) * 100000000 + 0.5)
               / 100000000 AS amihud_x1e6
    FROM r WHERE dollar_vol > 0
    GROUP BY ticker ORDER BY ticker
    """,
    doc="Amihud illiquidity per ticker: mean(|daily return| / dollar "
    "volume) x 1e6 — price impact per traded dollar, the standard "
    "liquidity screen. Dollar volume is the decimal-exact Σ(price*vol) "
    "per session (the q_vwap numerator), so each day's ratio is a "
    "fixed-order double both engines share; only the final mean is a "
    "float accumulation (round 8). Two hash aggregates + one window "
    "pass.",
)
def q_amihud(spark, sf_dir):
    from ..operators.volatility import amihud_illiquidity

    out = amihud_illiquidity(_daily_dollar_bars(spark, sf_dir))
    return out.select(
        "ticker",
        "n_days",
        stable_round(F.col("amihud_x1e6"), 8).alias("amihud_x1e6"),
    ).orderBy("ticker")


def _daily_dollar_bars(spark, sf_dir):
    """Daily (close, decimal-exact dollar volume) bars from _vbars."""
    v = _vbars(spark, sf_dir)
    order = F.struct(F.col("ts"), F.col("seq"))
    return v.groupBy("ticker", F.col("ts").cast("date").alias("day")).agg(
        F.max_by(F.col("price"), order).alias("close"),
        F.sum(quantize(F.col("price") * F.col("vol"), 6, "decimal(28,6)"))
        .cast("double")
        .alias("dollar_vol"),
    )


@register(
    "q_lead_lag",
    _DAILYBARS_CTE
    + """
    , r AS (
        SELECT ticker, day,
               CASE WHEN close > 0 AND lag(close) OVER w > 0
                    THEN """
    + quantize_sql("ln(close / lag(close) OVER w)")
    + """ END AS r
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), rr AS (
        SELECT ticker, day, r, lag(r) OVER (PARTITION BY ticker ORDER BY day)
                   AS r_prev
        FROM r
    ), m AS (
        SELECT a.ticker AS ticker_a, b.ticker AS ticker_b,
               """
    + ",\n".join(
        corr_moments_sql(x, y, p)
        for x, y, p in (
            ("a.r", "b.r", "c"),
            ("a.r", "b.r_prev", "ba"),
            ("b.r", "a.r_prev", "ab"),
        )
    )
    + f"""
        FROM rr a JOIN rr b ON a.day = b.day AND a.ticker < b.ticker
        GROUP BY a.ticker, b.ticker
    )
    SELECT ticker_a, ticker_b,
           {stable_round_sql(corr_value_sql('c'), 6)} AS contemp,
           {stable_round_sql(corr_value_sql('ba'), 6)} AS b_leads_a,
           {stable_round_sql(corr_value_sql('ab'), 6)} AS a_leads_b
    FROM m ORDER BY ticker_a, ticker_b
    """,
    doc="Lead-lag structure between every ticker pair: contemporaneous "
    "correlation of daily log returns plus both one-day cross-"
    "correlations (corr(a_t, b_{t-1}) = b leads a, and vice versa) — "
    "the price-discovery diagnostic. One window pass builds (r, "
    "r_prev) per ticker; the pair fan-out joins on the day grid "
    "(bounded by universe size squared per day, like "
    "q_series_correlation); the three correlations share one grouping "
    "through the exact-moment kernel (operators/stats.py — built-in "
    "corr() DIVIDE_BY_ZEROs under ANSI on a zero-variance side; flat "
    "series yield NULLs on every engine).",
)
def q_lead_lag(spark, sf_dir):
    from ..operators.stats import corr_from_moments, corr_moment_aggs, quantize

    base = Window.partitionBy("ticker").orderBy("day")
    d = _daily_bars(spark, sf_dir)
    prev = F.lag("close").over(base)
    r = F.when(
        (F.col("close") > 0) & (prev > 0), quantize(F.log(F.col("close") / prev))
    )
    rr = d.withColumn("__r", r).withColumn("__r_prev", F.lag("__r").over(base))
    a = rr.select(
        F.col("ticker").alias("ticker_a"),
        "day",
        F.col("__r").alias("ra"),
        F.col("__r_prev").alias("ra_prev"),
    )
    b = rr.select(
        F.col("ticker").alias("ticker_b"),
        "day",
        F.col("__r").alias("rb"),
        F.col("__r_prev").alias("rb_prev"),
    )
    m = (
        a.join(b, "day")
        .where(F.col("ticker_a") < F.col("ticker_b"))
        .groupBy("ticker_a", "ticker_b")
        .agg(
            *corr_moment_aggs(F.col("ra"), F.col("rb"), "c"),
            *corr_moment_aggs(F.col("ra"), F.col("rb_prev"), "ba"),
            *corr_moment_aggs(F.col("rb"), F.col("ra_prev"), "ab"),
        )
    )
    return m.select(
        "ticker_a",
        "ticker_b",
        stable_round(corr_from_moments("c"), 6).alias("contemp"),
        stable_round(corr_from_moments("ba"), 6).alias("b_leads_a"),
        stable_round(corr_from_moments("ab"), 6).alias("a_leads_b"),
    ).orderBy("ticker_a", "ticker_b")


@register(
    "q_volume_imbalance",
    _VBARS_CTE
    + """
    , d AS (
        SELECT ticker, CAST(ts AS DATE) AS day, vol,
               price - lag(price) OVER (PARTITION BY ticker ORDER BY ts, seq)
                   AS delta
        FROM vbars
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           CAST(sum(CASE WHEN delta > 0 THEN vol ELSE 0 END) AS BIGINT)
               AS up_vol,
           CAST(sum(CASE WHEN delta < 0 THEN vol ELSE 0 END) AS BIGINT)
               AS down_vol,
           CASE WHEN sum(CASE WHEN delta > 0 THEN vol ELSE 0 END)
                     + sum(CASE WHEN delta < 0 THEN vol ELSE 0 END) > 0
                THEN floor(CAST(sum(CASE WHEN delta > 0 THEN vol ELSE 0 END)
                                - sum(CASE WHEN delta < 0 THEN vol ELSE 0 END)
                           AS DOUBLE)
                           / (sum(CASE WHEN delta > 0 THEN vol ELSE 0 END)
                              + sum(CASE WHEN delta < 0 THEN vol ELSE 0 END))
                           * 1000000 + 0.5) / 1000000 END AS imbalance
    FROM d GROUP BY ticker, day ORDER BY ticker, day
    """,
    doc="Signed volume imbalance per (ticker, session): up-tick vs "
    "down-tick volume (tick rule on the price delta; the ticker-level "
    "lag crosses session boundaries by design — the first tick of a "
    "day signs against the prior close) and their normalized "
    "imbalance — the order-flow pressure gauge. Sums are exact LONG "
    "arithmetic; the one ratio divides exact integers (engine-stable), "
    "zero-activity days null-gate. One window pass + one hash "
    "aggregate.",
)
def q_volume_imbalance(spark, sf_dir):
    v = _vbars(spark, sf_dir)
    base = Window.partitionBy("ticker").orderBy("ts", "seq")
    delta = F.col("price") - F.lag("price").over(base)
    staged = v.withColumns(
        {
            "day": F.col("ts").cast("date"),
            "__up": F.when(delta > 0, F.col("vol")).otherwise(F.lit(0)),
            "__dn": F.when(delta < 0, F.col("vol")).otherwise(F.lit(0)),
        }
    )
    up, dn = F.sum("__up"), F.sum("__dn")
    return (
        staged.groupBy("ticker", "day")
        .agg(
            up.cast("long").alias("up_vol"),
            dn.cast("long").alias("down_vol"),
            stable_round(
                F.when(up + dn > 0, (up - dn).cast("double") / (up + dn)), 6
            ).alias("imbalance"),
        )
        .select(
            "ticker",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "up_vol",
            "down_vol",
            "imbalance",
        )
        .orderBy("ticker", "day")
    )


@register(
    "q_intraday_profile",
    _VBARS_CTE
    + """
    SELECT ticker, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_ticks,
           CAST(sum(vol) AS BIGINT) AS volume,
           floor(CAST(sum(CAST(price AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS avg_price
    FROM vbars GROUP BY ticker, EXTRACT(hour FROM ts)
    ORDER BY ticker, hour
    """,
    doc="Intraday seasonality profile: tick count, volume, and average "
    "price by hour-of-day per ticker — the U-shaped-activity "
    "diagnostic behind execution scheduling. One map-side-combined "
    "hash aggregate over the scan (24 x |tickers| output rows); price "
    "sums are DECIMAL-exact so the mean divides exact operands.",
)
def q_intraday_profile(spark, sf_dir):
    v = _vbars(spark, sf_dir)
    return (
        v.groupBy("ticker", F.hour("ts").cast("long").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("vol").cast("long").alias("volume"),
            stable_round(
                F.sum(F.col("price").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_price"),
        )
        .orderBy("ticker", "hour")
    )


@register(
    "q_risk_report",
    _DAILYOHLC_CTE
    + """
    , terms AS (
        SELECT ticker,
               ln(high / low) AS lhl, ln(close / open) AS lco,
               ln(high / close) AS lhc, ln(high / open) AS lho,
               ln(low / close) AS llc, ln(low / open) AS llo
        FROM dailyohlc WHERE low > 0
    ), vol AS (
        SELECT ticker, CAST(count(*) AS BIGINT) AS n_days,
               round(sqrt(avg(lhl * lhl) / 2.772588722239781), 6) AS park_vol,
               round(sqrt(greatest(avg(0.5 * lhl * lhl
                          - 0.3862943611198906 * lco * lco), 0.0)), 6) AS gk_vol,
               round(sqrt(greatest(avg(lhc * lho + llc * llo), 0.0)), 6) AS rs_vol
        FROM terms GROUP BY ticker
    ), r AS (
        SELECT ticker, day,
               CASE WHEN close > 0 AND lag(close) OVER w > 0
                    THEN ln(close / lag(close) OVER w) END AS r
        FROM dailyohlc
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), sharpe AS (
        SELECT ticker,
               round(avg(r) / stddev_samp(r) * 15.874507866387544, 6)
                   AS sharpe_ann
        FROM r GROUP BY ticker
    ), acf_m AS (
        SELECT ticker,
               """
    + corr_moments_sql("rq", "rq1", "l1")
    + f"""
        FROM (SELECT ticker, """ + quantize_sql("r") + """ AS rq,
                     lag(""" + quantize_sql("r") + f""")
                         OVER (PARTITION BY ticker ORDER BY day) AS rq1
              FROM r)
        GROUP BY ticker
    ), acf AS (
        SELECT ticker, {stable_round_sql(corr_value_sql('l1'), 6)} AS acf_1
        FROM acf_m
    ), dvol_ranked AS (
        SELECT event_type AS ticker, CAST(ts AS DATE) AS day, value, user_id,
               row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    ), dvol AS (
        -- rank form, not arg_max (null-keeping max_by mirror)
        SELECT ticker, day,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(sum(CAST(floor(value * ((user_id % 997) + 1) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6)))
                    AS DOUBLE) AS dollar_vol
        FROM dvol_ranked GROUP BY 1, 2
    ), ar AS (
        SELECT ticker, day, dollar_vol,
               CASE WHEN lag(close) OVER w > 0
                    THEN abs(close / lag(close) OVER w - 1.0) END AS abs_r
        FROM dvol
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), ami AS (
        SELECT ticker,
               floor(avg(abs_r / dollar_vol * 1000000.0) * 100000000 + 0.5)
                   / 100000000 AS amihud_x1e6
        FROM ar WHERE dollar_vol > 0 GROUP BY ticker
    ), dd AS (
        SELECT ticker,
               floor(min(ddown) * 1000000 + 0.5) / 1000000 AS max_drawdown
        FROM (
            SELECT event_type AS ticker,
                   CASE WHEN max(value) OVER peak = 0.0 THEN NULL
                        ELSE value / max(value) OVER peak - 1.0 END AS ddown
            FROM events
            WINDOW peak AS (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ) GROUP BY ticker
    )
    SELECT vol.ticker, vol.n_days, vol.park_vol, vol.gk_vol, vol.rs_vol,
           sharpe.sharpe_ann, acf.acf_1, ami.amihud_x1e6, dd.max_drawdown
    FROM vol
    JOIN sharpe USING (ticker)
    JOIN acf USING (ticker)
    JOIN ami USING (ticker)
    JOIN dd USING (ticker)
    ORDER BY vol.ticker
    """,
    doc="Composed per-ticker risk report — the dashboard row a risk "
    "desk reads: range-based volatilities, annualized Sharpe, lag-1 "
    "return autocorrelation, Amihud illiquidity, and maximum drawdown, "
    "all from the same operator library the standalone queries use "
    "(operators/volatility.py) and stitched with five broadcast-sized "
    "per-ticker joins. Demonstrates operator composition: each leg "
    "keeps its own exactness discipline (decimal dollar volume, "
    "null-gated zero closes, clamped estimator means) and the report "
    "inherits them unchanged.",
)
def q_risk_report(spark, sf_dir):
    from ..operators.volatility import (
        amihud_illiquidity,
        max_drawdown,
        ohlc_volatility,
        return_autocorr,
        sharpe_ratio,
    )

    daily = _daily_ohlc(spark, sf_dir)
    vol = ohlc_volatility(daily.where(F.col("low") > 0)).select(
        "ticker",
        "n_days",
        F.round("park_vol", 6).alias("park_vol"),
        F.round("gk_vol", 6).alias("gk_vol"),
        F.round("rs_vol", 6).alias("rs_vol"),
    )
    sh = sharpe_ratio(daily).select(
        "ticker", F.round("sharpe_ann", 6).alias("sharpe_ann")
    )
    ac = return_autocorr(daily, lags=(1,)).select(
        "ticker", stable_round(F.col("acf_1"), 6).alias("acf_1")
    )
    ami = amihud_illiquidity(_daily_dollar_bars(spark, sf_dir)).select(
        "ticker", stable_round(F.col("amihud_x1e6"), 8).alias("amihud_x1e6")
    )
    dd = max_drawdown(_bars(spark, sf_dir)).select(
        "ticker", stable_round(F.col("max_drawdown"), 6).alias("max_drawdown")
    )
    return (
        vol.join(sh, "ticker")
        .join(ac, "ticker")
        .join(ami, "ticker")
        .join(dd, "ticker")
        .orderBy("ticker")
    )


@register(
    "q_var_cvar",
    _DAILYBARS_CTE
    + """
    , r AS (
        SELECT ticker, day,
               CASE WHEN lag(close) OVER w > 0
                    THEN close / lag(close) OVER w - 1.0 END AS r
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), ranked AS (
        SELECT ticker, r,
               row_number() OVER (PARTITION BY ticker ORDER BY r, day)
                   AS rk,
               count(*) OVER (PARTITION BY ticker) AS n
        FROM r WHERE r IS NOT NULL
    )
    SELECT ticker,
           CAST(max(n) AS BIGINT) AS n_returns,
           CAST(max(CAST(ceiling(n * 0.05) AS BIGINT)) AS BIGINT) AS tail_k,
           max(CASE WHEN rk = CAST(ceiling(n * 0.05) AS BIGINT)
                    THEN r END) AS var_loss,
           round(avg(CASE WHEN rk <= CAST(ceiling(n * 0.05) AS BIGINT)
                          THEN r END), 6) AS cvar_loss
    FROM ranked GROUP BY ticker ORDER BY ticker
    """,
    doc="Historical 5% Value-at-Risk and Conditional VaR (expected "
    "shortfall) per ticker over daily simple returns. Order-statistic "
    "semantics, not interpolated percentile: the tail is the "
    "k = ceil(0.05 n) smallest returns, VaR is the k-th smallest — an "
    "actual data value, so no float blending and no engine-specific "
    "percentile interpolation — and CVaR is the mean of those k (the "
    "only float accumulation; round 6). Ties on the return value break "
    "by day, so the tail set is deterministic on both engines. The "
    "return lag and the (r, day) ranking share one hash partitioning "
    "on ticker: one shuffle, two in-partition sorts, one aggregate.",
)
def q_var_cvar(spark, sf_dir):
    from ..operators.volatility import historical_var_cvar

    out = historical_var_cvar(_daily_bars(spark, sf_dir), alpha=0.05)
    return out.select(
        "ticker",
        "n_returns",
        "tail_k",
        "var_loss",
        F.round("cvar_loss", 6).alias("cvar_loss"),
    ).orderBy("ticker")


@register(
    "q_seasonal_decompose",
    _DAILYBARS_CTE
    + """
    , t AS (
        SELECT ticker, day, close,
               CAST((day - DATE '1970-01-01') % 7 AS INT) AS phase,
               CASE WHEN count(close) OVER c = 7
                    THEN CAST(sum(CAST(close AS DECIMAL(18,4))) OVER c
                              AS DOUBLE) / 7.0 END AS trend
        FROM dailybars
        WINDOW c AS (PARTITION BY ticker ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), s AS (
        SELECT ticker, day, phase, close, trend,
               floor(avg(close - trend)
                         OVER (PARTITION BY ticker, phase)
                     * 1000000 + 0.5) / 1000000 AS seasonal
        FROM t
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day, phase, close,
           floor(trend * 10000 + 0.5) / 10000 AS trend,
           seasonal,
           floor((close - trend - seasonal) * 1000000 + 0.5) / 1000000 AS resid
    FROM s ORDER BY ticker, day
    """,
    doc="Classical additive seasonal decomposition (STL-lite) of each "
    "ticker's daily closes: close = trend + seasonal + resid. Trend is "
    "a CENTERED 7-day moving average whose frame sum accumulates in "
    "DECIMAL (exact, order-insensitive, bit-portable; only the /7 "
    "division is float); seasonal is the mean of (close - trend) per "
    "(ticker, epoch-day mod 7) — a calendar-convention-free weekday "
    "phase both engines derive identically (Spark dayofweek is "
    "1=Sunday, DuckDB 0=Sunday; epoch-mod sidesteps both); resid "
    "subtracts the ROUNDED seasonal so both engines difference the "
    "same post-round value. One shuffle+sort on ticker for the frame, "
    "one (ticker, phase) shuffle for the seasonal means; one row out "
    "per row in.",
)
def q_seasonal_decompose(spark, sf_dir):
    from ..operators.timeseries import seasonal_decompose

    out = seasonal_decompose(_daily_bars(spark, sf_dir), period=7)
    return out.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "phase",
        "close",
        stable_round(F.col("trend"), 4).alias("trend"),
        stable_round(F.col("seasonal"), 6).alias("seasonal"),
        stable_round(
            F.col("close") - F.col("trend") - stable_round(F.col("seasonal"), 6),
            6,
        ).alias("resid"),
    ).orderBy("ticker", "day")


@register(
    "q_event_study",
    _DAILYBARS_CTE
    + """
    , r AS (
        SELECT ticker, day,
               CASE WHEN lag(close) OVER w > 0
                    THEN close / lag(close) OVER w - 1.0 END AS r
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), f AS (
        SELECT ticker, day, r,
               lead(r, 1) OVER w AS f1,
               lead(r, 2) OVER w AS f2,
               lead(r, 3) OVER w AS f3
        FROM r
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    )
    SELECT ticker, CAST(count(*) AS BIGINT) AS n_signals,
           round(avg(f1), 6) AS car_1,
           round(avg(f2), 6) AS car_2,
           round(avg(f3), 6) AS car_3
    FROM f WHERE r < -0.02
    GROUP BY ticker ORDER BY ticker
    """,
    doc="Event study / signal backtest: condition on crash days "
    "(daily return < -2%) and measure the mean forward return 1, 2, "
    "and 3 sessions ahead — the standard 'does the signal predict "
    "anything' panel (mean-reversion if positive, momentum if "
    "negative). Forward returns are leads of the SAME return column, "
    "so the whole study is one (ticker, day) window pass + one hash "
    "aggregate: backtesting a signal over a 100 TB tick history never "
    "self-joins, never collects — the event alignment IS the lead "
    "window. Per-horizon means are float (round 6); forward returns "
    "past the series end are null and drop from the mean (avg skips "
    "nulls on both engines).",
)
def q_event_study(spark, sf_dir):
    base = Window.partitionBy("ticker").orderBy("day")
    d = _daily_bars(spark, sf_dir)
    prev = F.lag("close").over(base)
    r = F.when(prev > 0, F.col("close") / prev - 1.0)
    staged = d.withColumn("__r", r).select(
        "ticker",
        "day",
        "__r",
        F.lead("__r", 1).over(base).alias("__f1"),
        F.lead("__r", 2).over(base).alias("__f2"),
        F.lead("__r", 3).over(base).alias("__f3"),
    )
    return (
        staged.where(F.col("__r") < -0.02)
        .groupBy("ticker")
        .agg(
            F.count(F.lit(1)).alias("n_signals"),
            F.round(F.avg("__f1"), 6).alias("car_1"),
            F.round(F.avg("__f2"), 6).alias("car_2"),
            F.round(F.avg("__f3"), 6).alias("car_3"),
        )
        .orderBy("ticker")
    )


@register(
    "q_forecast_eval",
    _DAILYBARS_CTE
    + """
    , f AS (
        SELECT ticker, day, close,
               lag(close, 7) OVER (PARTITION BY ticker ORDER BY day) AS fc
        FROM dailybars
    )
    SELECT ticker, CAST(count(fc) AS BIGINT) AS n_evals,
           round(avg(abs(close - fc)), 6) AS mae,
           round(sqrt(avg((close - fc) * (close - fc))), 6) AS rmse,
           round(avg(CASE WHEN close > 0
                          THEN abs(close - fc) / close END), 6) AS mape
    FROM f WHERE fc IS NOT NULL
    GROUP BY ticker ORDER BY ticker
    """,
    doc="Forecast backtest of the seasonal-naive baseline (predict "
    "close[t] = close[t-7 sessions] — the model every fancier "
    "forecaster must beat): per-ticker MAE, RMSE, and MAPE. Each error "
    "term is fixed-order double arithmetic on two data values; only "
    "the final means are float accumulations (round 6; zero closes "
    "null their MAPE term for ANSI totality). One lag window + one "
    "hash aggregate — evaluating a forecast over the full history "
    "costs one shuffle, which is what makes backtest-every-night "
    "viable at 100 TB.",
)
def q_forecast_eval(spark, sf_dir):
    base = Window.partitionBy("ticker").orderBy("day")
    d = _daily_bars(spark, sf_dir)
    fc = F.lag("close", 7).over(base)
    err = F.col("close") - F.col("__fc")
    staged = d.withColumn("__fc", fc).where(F.col("__fc").isNotNull())
    return (
        staged.groupBy("ticker")
        .agg(
            F.count("__fc").alias("n_evals"),
            F.round(F.avg(F.abs(err)), 6).alias("mae"),
            F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
            F.round(
                F.avg(
                    F.when(F.col("close") > 0, F.abs(err) / F.col("close"))
                ),
                6,
            ).alias("mape"),
        )
        .orderBy("ticker")
    )


@register(
    "q_seasonal_anomalies",
    _DAILYBARS_CTE
    + """
    , t AS (
        SELECT ticker, day, close,
               CAST((day - DATE '1970-01-01') % 7 AS INT) AS phase,
               CASE WHEN count(close) OVER c = 7
                    THEN CAST(sum(CAST(close AS DECIMAL(18,4))) OVER c
                              AS DOUBLE) / 7.0 END AS trend
        FROM dailybars
        WINDOW c AS (PARTITION BY ticker ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), s AS (
        SELECT ticker, day, close, trend,
               floor(avg(close - trend)
                         OVER (PARTITION BY ticker, phase)
                     * 1000000 + 0.5) / 1000000 AS seasonal
        FROM t
    ), r AS (
        SELECT ticker, day, close,
               floor((close - trend - seasonal) * 1000000 + 0.5) / 1000000
                   AS resid
        FROM s WHERE trend IS NOT NULL
    ), med AS (
        SELECT ticker, quantile_cont(resid, 0.5) AS med FROM r
        GROUP BY ticker
    ), dev AS (
        SELECT r.ticker, r.day, r.close, r.resid, med.med,
               abs(r.resid - med.med) AS adev
        FROM r JOIN med USING (ticker)
    ), mad AS (
        SELECT ticker, quantile_cont(adev, 0.5) AS mad FROM dev
        GROUP BY ticker
    )
    SELECT d.ticker, strftime(d.day, '%Y-%m-%d') AS day, d.close, d.resid,
           floor(CASE WHEN m.mad > 0
                      THEN (d.resid - d.med) / (1.4826 * m.mad) END
                 * 10000 + 0.5) / 10000 AS robust_z,
           CAST(CASE WHEN m.mad > 0
                     AND abs((d.resid - d.med) / (1.4826 * m.mad)) > 3.0
                     THEN 1 ELSE 0 END AS INT) AS is_anomaly
    FROM dev d JOIN mad m USING (ticker)
    ORDER BY d.ticker, d.day
    """,
    doc="Composed anomaly monitor — what a price-alerting pipeline "
    "should actually page on: seasonal decomposition strips the trend "
    "(DECIMAL-exact centered MA) and the weekday effect, then the "
    "DESEASONALIZED residuals are screened with the robust median/MAD "
    "z-score (|z| > 3, normal-consistent 1.4826 scaling). Composition "
    "of two existing tiers (operators/timeseries.seasonal_decompose + "
    "the q_mad_outliers percentile pattern): raw-price screens flag "
    "every Monday open; residual screens flag only genuine breaks. "
    "Residuals round at 6 BEFORE the percentile passes, so med/MAD "
    "interpolate identical doubles on both engines; flat-residual "
    "tickers (MAD = 0) null their z for ANSI totality. Exact "
    "percentiles concentrate per-key; the 100 TB swap is "
    "approx_percentile / the KLL sketch lifecycle (q_mad_outliers's "
    "stated trade).",
)
def q_seasonal_anomalies(spark, sf_dir):
    from ..operators.timeseries import seasonal_decompose

    dec = seasonal_decompose(_daily_bars(spark, sf_dir), period=7)
    r = dec.where(F.col("trend").isNotNull()).select(
        "ticker",
        "day",
        "close",
        stable_round(
            F.col("close") - F.col("trend") - stable_round(F.col("seasonal"), 6),
            6,
        ).alias("resid"),
    )
    med = r.groupBy("ticker").agg(
        F.expr("percentile(resid, 0.5)").alias("med")
    )
    dev = r.join(F.broadcast(med), "ticker").withColumn(
        "adev", F.abs(F.col("resid") - F.col("med"))
    )
    mad = dev.groupBy("ticker").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    z = F.when(
        F.col("mad") > 0,
        (F.col("resid") - F.col("med")) / (F.lit(1.4826) * F.col("mad")),
    )
    return (
        dev.join(F.broadcast(mad), "ticker")
        .select(
            "ticker",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "close",
            "resid",
            stable_round(z, 4).alias("robust_z"),
            F.when(F.abs(z) > 3.0, 1).otherwise(0).cast("int").alias(
                "is_anomaly"
            ),
        )
        .orderBy("ticker", "day")
    )


@register(
    "q_portfolio_return",
    _VBARS_CTE
    + """
    , ranked AS (
        SELECT ticker, CAST(ts AS DATE) AS day, price,
               row_number() OVER (PARTITION BY ticker, CAST(ts AS DATE)
                                  ORDER BY ts DESC, seq DESC) AS rn_d
        FROM vbars
    ), daily AS (
        -- rank form, not arg_max (null-keeping max_by mirror)
        SELECT ticker, day, max(CASE WHEN rn_d = 1 THEN price END) AS close
        FROM ranked GROUP BY 1, 2
    ), r AS (
        SELECT ticker, day,
               CASE WHEN lag(close) OVER w > 0
                    THEN close / lag(close) OVER w - 1.0 END AS r
        FROM daily
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), w AS (
        SELECT ticker,
               CAST(sum(CAST(floor(price * vol * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE) AS dv
        FROM vbars GROUP BY ticker
    ), t AS (
        SELECT CAST(sum(CAST(floor(price * vol * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS DOUBLE) AS t
        FROM vbars
    ), port AS (
        -- snap-then-cast on the w*r terms and log terms (quantize
        -- discipline): bare double->DECIMAL casts knife-edge on
        -- full-mantissa input (fractional-stress finding)
        SELECT r.day, CAST(count(*) AS BIGINT) AS n_components,
               CAST(sum(CAST(floor(w.dv / t.t * r.r * 1000000000000.0 + 0.5)
                             / 1000000000000.0 AS DECIMAL(28,12)))
                    AS DOUBLE) AS port_r
        FROM r JOIN w USING (ticker) CROSS JOIN t
        WHERE r.r IS NOT NULL
        GROUP BY r.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n_components, port_r,
           CAST(sum(coalesce(
                     CAST(CASE WHEN port_r > -1.0
                               THEN floor(ln(1.0 + port_r)
                                          * 1000000000000.0 + 0.5)
                                    / 1000000000000.0 END
                          AS DECIMAL(28,12)),
                     CAST(0 AS DECIMAL(28,12)))) OVER run AS DOUBLE)
               AS log_growth
    FROM port
    WINDOW run AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ORDER BY day
    """,
    doc="Portfolio-level daily return and growth-of-$1 index: each "
    "ticker weighted by its share of total traded dollar volume (the "
    "liquidity-weighted index construction). Weights are ratios of two "
    "DECIMAL-exact dollar-volume sums (division in double — fixed "
    "order), each day's portfolio return is the sum of w*r terms "
    "QUANTIZED to DECIMAL(28,12) (order-free — a plain float sum over "
    "components is engine-order-dependent), and the growth index is "
    "reported in LOG space: the DECIMAL(28,12) running sum of "
    "ln(1+port_r) itself (growth-of-$1 = exp(log_growth), a "
    "presentation step left to the consumer). Emitting the log sum "
    "keeps the contract engine-exact end to end — the quantized ln "
    "terms are identical on both engines (12 decimal places sit far "
    "below libm's ~16-significant-digit ULP position for |ln| < 1), "
    "whereas a final exp() is a libm call whose 1-ULP JVM-vs-DuckDB "
    "divergence survives any fixed-decimal round once growth exceeds "
    "~1e9 (reproduced: 0/1/4 diff rows at sf0.001/0.01/0.1). The "
    "1-row corpus-total aggregate broadcasts (scalar-subquery form, "
    "the PLANLINT-allowlisted pattern); tickers missing a return that "
    "day contribute zero (fixed weights, no renormalization — the "
    "documented index convention). The final per-day frame is tiny "
    "(one row per session), so the presentation running sum is a "
    "single-partition window over days, not rows.",
)
def q_portfolio_return(spark, sf_dir):
    v = _vbars(spark, sf_dir)
    pv = quantize(F.col("price") * F.col("vol"), 6, "decimal(28,6)")
    w = v.groupBy("ticker").agg(F.sum(pv).cast("double").alias("dv"))
    t = v.agg(F.sum(pv).cast("double").alias("t"))
    d = _daily_dollar_bars(spark, sf_dir).select("ticker", "day", "close")
    base = Window.partitionBy("ticker").orderBy("day")
    prev = F.lag("close").over(base)
    r = (
        d.withColumn("r", F.when(prev > 0, F.col("close") / prev - 1.0))
        .where(F.col("r").isNotNull())
        .select("ticker", "day", "r")
    )
    # snap-then-cast (quantize): bare double->DECIMAL is knife-edge-prone
    term = quantize(F.col("dv") / F.col("t") * F.col("r"))
    port = (
        r.join(F.broadcast(w), "ticker")
        .crossJoin(F.broadcast(t))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.sum(term).cast("double").alias("port_r"),
        )
    )
    lr = F.coalesce(
        F.when(
            F.col("port_r") > -1.0,
            quantize(F.log(F.lit(1.0) + F.col("port_r"))),
        ),
        F.lit(0).cast("decimal(28,12)"),
    )
    run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        port.withColumn("__lr", lr)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_components",
            "port_r",
            F.sum("__lr").over(run).cast("double").alias("log_growth"),
        )
        .orderBy("day")
    )


@register(
    "q_roc_cmo",
    _BARS_CTE
    + """
    , d AS (
        SELECT ticker, ts, seq, price,
               lag(price, 12) OVER base AS prior,
               price - lag(price) OVER base AS delta
        FROM bars
        WINDOW base AS (PARTITION BY ticker ORDER BY ts, seq)
    ), g AS (
        SELECT ticker, ts, seq, price, prior,
               CASE WHEN delta > 0 THEN delta ELSE 0.0 END AS gv,
               CASE WHEN delta < 0 THEN -delta ELSE 0.0 END AS lv,
               CASE WHEN delta IS NOT NULL THEN 1 ELSE 0 END AS has
        FROM d
    ), runs AS (
        SELECT ticker, ts, seq, price, prior,
               sum(CAST(gv AS DECIMAL(18,4))) OVER run AS sg,
               sum(CAST(lv AS DECIMAL(18,4))) OVER run AS sl,
               sum(has) OVER run AS sh
        FROM g
        WINDOW run AS (PARTITION BY ticker ORDER BY ts, seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ticker, seq,
           CASE WHEN prior IS NOT NULL AND prior <> 0
                THEN floor((price / prior - 1.0) * 100.0 * 10000 + 0.5) / 10000
           END AS roc,
           CASE WHEN sh - coalesce(lag(sh, 14) OVER base, 0) >= 14 THEN
             CASE WHEN CAST(sg - coalesce(lag(sg, 14) OVER base, 0) AS DOUBLE) = 0.0
                   AND CAST(sl - coalesce(lag(sl, 14) OVER base, 0) AS DOUBLE) = 0.0
                  THEN 0.0
                  ELSE floor(
                    (CAST(sg - coalesce(lag(sg, 14) OVER base, 0) AS DOUBLE)
                     - CAST(sl - coalesce(lag(sl, 14) OVER base, 0) AS DOUBLE))
                    / (CAST(sg - coalesce(lag(sg, 14) OVER base, 0) AS DOUBLE)
                       + CAST(sl - coalesce(lag(sl, 14) OVER base, 0) AS DOUBLE))
                    * 100.0 * 10000 + 0.5) / 10000
             END
           END AS cmo
    FROM runs
    WINDOW base AS (PARTITION BY ticker ORDER BY ts, seq)
    """,
    doc="ROC(12) + Chande momentum oscillator CMO(14) per tick bar. ROC "
    "is a pure lag expression (no aggregation); CMO reuses the RSI "
    "gain/loss machinery — exact decimal running-sum differences, one "
    "(ticker, ts, seq) shuffle+sort for every lag and running sum — "
    "with the symmetric (Su−Sd)/(Su+Sd) output in [-100, 100]. Null "
    "until the lookbacks fill; a flat 14-row window emits 0.",
)
def q_roc_cmo(spark, sf_dir):
    from ..operators.indicators import with_roc_cmo

    out = with_roc_cmo(_bars(spark, sf_dir), n_roc=12, n_cmo=14)
    return out.select(
        "ticker",
        "seq",
        stable_round(F.col("roc"), 4).alias("roc"),
        stable_round(F.col("cmo"), 4).alias("cmo"),
    )


@register(
    "q_cmf_adl",
    _DAILYVOL_CTE
    + """
    , m AS (
        SELECT ticker, day, vol,
               CAST(CASE WHEN high - low = 0 THEN 0.0
                         ELSE ((close - low) - (high - close)) / (high - low)
                    END * vol AS DECIMAL(28,8)) AS mfv
        FROM dailyvol
    ), runs AS (
        SELECT ticker, day,
               sum(mfv) OVER run AS s_mfv,
               sum(CAST(vol AS BIGINT)) OVER run AS s_vol,
               count(vol) OVER run AS c
        FROM m
        WINDOW run AS (PARTITION BY ticker ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           floor(CAST(s_mfv AS DOUBLE) * 1000000 + 0.5) / 1000000 AS adl,
           CASE WHEN c - coalesce(lag(c, 20) OVER base, 0) >= 20
                 AND s_vol - coalesce(lag(s_vol, 20) OVER base, 0) <> 0
                THEN floor(CAST(s_mfv - coalesce(lag(s_mfv, 20) OVER base, 0) AS DOUBLE)
                           / (s_vol - coalesce(lag(s_vol, 20) OVER base, 0))
                           * 1000000 + 0.5) / 1000000 END AS cmf
    FROM runs
    WINDOW base AS (PARTITION BY ticker ORDER BY day)
    """,
    doc="Accumulation/distribution line + Chaikin money flow CMF(20) "
    "over daily H/L/C/volume bars (one hash aggregate builds the bars; "
    "one (ticker, day) window pass does the rest). The money-flow "
    "multiplier is a fixed-order double expression; MFM·vol is cast to "
    "DECIMAL(28,8) so the ADL cumulative sum and the CMF frame sums are "
    "exact and order-insensitive (the q_atr cast discipline); the "
    "volume frame sum stays in LONG. CMF null until 20 bars exist and "
    "null on an all-zero 20-bar volume sum (Spark's NULL-on-/0 vs "
    "IEEE ±inf would otherwise diverge engines on that edge).",
)
def q_cmf_adl(spark, sf_dir):
    from ..operators.indicators import with_cmf_adl

    out = with_cmf_adl(_daily_vol_bars(spark, sf_dir), n=20)
    return out.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        stable_round(F.col("adl"), 6).alias("adl"),
        stable_round(F.col("cmf"), 6).alias("cmf"),
    )


@register(
    "q_ulcer",
    _DAILYBARS_CTE
    + """
    , dd AS (
        SELECT ticker, day,
               CAST((close / max(close) OVER frame - 1.0) * 100.0
                    * ((close / max(close) OVER frame - 1.0) * 100.0)
                    AS DECIMAL(28,8)) AS dd2
        FROM dailybars
        WINDOW frame AS (PARTITION BY ticker ORDER BY day
                         ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ), runs AS (
        SELECT ticker, day,
               sum(dd2) OVER run AS s,
               count(dd2) OVER run AS c
        FROM dd
        WINDOW run AS (PARTITION BY ticker ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN c - coalesce(lag(c, 14) OVER base, 0) >= 14
                THEN floor(sqrt(CAST(s - coalesce(lag(s, 14) OVER base, 0) AS DOUBLE)
                                / (c - coalesce(lag(c, 14) OVER base, 0)))
                           * 1000000 + 0.5) / 1000000 END AS ulcer
    FROM runs
    WINDOW base AS (PARTITION BY ticker ORDER BY day)
    """,
    doc="Ulcer index(14) over daily close: sqrt of the 14-day mean "
    "squared percent drawdown from the 14-day rolling high. The rolling "
    "high is a direct frame max (the Donchian lowering); dd² rides the "
    "exact DECIMAL running-sum difference. Null until 14 bars exist. "
    "One (ticker, day) shuffle+sort serves frame max, running sum, and "
    "lags.",
)
def q_ulcer(spark, sf_dir):
    from ..operators.indicators import with_ulcer

    out = with_ulcer(_daily_bars(spark, sf_dir), n=14)
    return out.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        stable_round(F.col("ulcer"), 6).alias("ulcer"),
    )


@register(
    "q_vortex",
    _DAILYBARS_CTE
    + """
    , t AS (
        SELECT ticker, day,
               CAST(abs(high - lag(low)  OVER base) AS DECIMAL(18,6)) AS vmp,
               CAST(abs(low  - lag(high) OVER base) AS DECIMAL(18,6)) AS vmm,
               CAST(greatest(high - low,
                             abs(high - lag(close) OVER base),
                             abs(low  - lag(close) OVER base))
                    AS DECIMAL(18,6)) AS tr,
               CASE WHEN lag(close) OVER base IS NOT NULL THEN 1 ELSE 0 END AS has
        FROM dailybars
        WINDOW base AS (PARTITION BY ticker ORDER BY day)
    ), runs AS (
        SELECT ticker, day,
               sum(vmp) OVER run AS s_vmp,
               sum(vmm) OVER run AS s_vmm,
               sum(tr)  OVER run AS s_tr,
               sum(has) OVER run AS sh
        FROM t
        WINDOW run AS (PARTITION BY ticker ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), fin AS (
        SELECT ticker, day,
               CAST(s_vmp - coalesce(lag(s_vmp, 14) OVER base, 0) AS DOUBLE) AS vmp_n,
               CAST(s_vmm - coalesce(lag(s_vmm, 14) OVER base, 0) AS DOUBLE) AS vmm_n,
               CAST(s_tr  - coalesce(lag(s_tr, 14)  OVER base, 0) AS DOUBLE) AS tr_n,
               sh - coalesce(lag(sh, 14) OVER base, 0) AS h_n
        FROM runs
        WINDOW base AS (PARTITION BY ticker ORDER BY day)
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN h_n >= 14 AND tr_n <> 0.0
                THEN floor(vmp_n / tr_n * 1000000 + 0.5) / 1000000 END AS vi_plus,
           CASE WHEN h_n >= 14 AND tr_n <> 0.0
                THEN floor(vmm_n / tr_n * 1000000 + 0.5) / 1000000 END AS vi_minus
    FROM fin
    """,
    doc="Vortex indicator VI±(14) over daily H/L/C bars: Σ|H−prev L| "
    "and Σ|L−prev H| each normalized by Σ true range. Each key's first "
    "bar contributes nothing (all three terms null) and a __has counter "
    "gates emission until 14 full terms exist, so no partial windows "
    "leak. VM±/TR are cast to DECIMAL(18,6) for exact running-sum "
    "differences; one (ticker, day) shuffle+sort serves everything.",
)
def q_vortex(spark, sf_dir):
    from ..operators.indicators import with_vortex

    out = with_vortex(_daily_bars(spark, sf_dir), n=14)
    return out.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        stable_round(F.col("vi_plus"), 6).alias("vi_plus"),
        stable_round(F.col("vi_minus"), 6).alias("vi_minus"),
    )


@register(
    "q_candlestick",
    _DAILYOHLC_CTE
    + """
    , f AS (
        SELECT ticker, day, open, high, low, close,
               close - open AS body,
               high - low AS rng,
               high - greatest(open, close) AS upper_sh,
               least(open, close) - low AS lower_sh,
               lag(open)  OVER w AS p_open,
               lag(close) OVER w AS p_close
        FROM dailyohlc
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), flags AS (
        SELECT ticker, day,
               CASE WHEN rng > 0 AND abs(body) <= 0.1 * rng
                    THEN 1 ELSE 0 END AS doji,
               CASE WHEN rng > 0 AND body <> 0
                         AND lower_sh >= 2 * abs(body)
                         AND upper_sh <= abs(body)
                    THEN 1 ELSE 0 END AS hammer,
               CASE WHEN p_close < p_open AND body > 0
                         AND open <= p_close AND close >= p_open
                    THEN 1 ELSE 0 END AS bull_engulf,
               CASE WHEN p_close > p_open AND body < 0
                         AND open >= p_close AND close <= p_open
                    THEN 1 ELSE 0 END AS bear_engulf
        FROM f
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           doji, hammer, bull_engulf, bear_engulf
    FROM flags
    WHERE doji + hammer + bull_engulf + bear_engulf > 0
    ORDER BY ticker, day
    """,
    doc="Candlestick pattern screen over daily O/H/L/C bars: doji "
    "(body ≤ 10%% of range), hammer (lower shadow ≥ 2×body, upper "
    "shadow ≤ body), and bullish/bearish engulfing (body swallows the "
    "previous bar's opposite-sign body). All flags are pure "
    "comparisons on raw doubles — bit-identical on any engine, no "
    "rounding needed anywhere. One hash aggregate builds the bars, "
    "one (ticker, day) window pass reads the previous bar; the "
    "pattern screen itself is map-only codegen.",
)
def q_candlestick(spark, sf_dir):
    d = _daily_ohlc(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy("day")
    body = F.col("close") - F.col("open")
    rng = F.col("high") - F.col("low")
    upper_sh = F.col("high") - F.greatest("open", "close")
    lower_sh = F.least("open", "close") - F.col("low")
    f = d.withColumns(
        {
            "body": body,
            "rng": rng,
            "upper_sh": upper_sh,
            "lower_sh": lower_sh,
            "p_open": F.lag("open").over(w),
            "p_close": F.lag("close").over(w),
        }
    )
    flag = lambda c: F.when(c, 1).otherwise(0)
    out = f.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        flag(
            (F.col("rng") > 0) & (F.abs("body") <= 0.1 * F.col("rng"))
        ).alias("doji"),
        flag(
            (F.col("rng") > 0)
            & (F.col("body") != 0)
            & (F.col("lower_sh") >= 2 * F.abs("body"))
            & (F.col("upper_sh") <= F.abs("body"))
        ).alias("hammer"),
        flag(
            (F.col("p_close") < F.col("p_open"))
            & (F.col("body") > 0)
            & (F.col("open") <= F.col("p_close"))
            & (F.col("close") >= F.col("p_open"))
        ).alias("bull_engulf"),
        flag(
            (F.col("p_close") > F.col("p_open"))
            & (F.col("body") < 0)
            & (F.col("open") >= F.col("p_close"))
            & (F.col("close") <= F.col("p_open"))
        ).alias("bear_engulf"),
    )
    return out.where(
        F.col("doji") + F.col("hammer") + F.col("bull_engulf") + F.col("bear_engulf")
        > 0
    ).orderBy("ticker", "day")


@register(
    "q_cusum",
    _DAILYBARS_CTE
    + """
    , stats AS (
        SELECT ticker,
               sum(CAST(close AS DECIMAL(28,6))) AS sx,
               sum(CAST(close * close AS DECIMAL(38,8))) AS sx2,
               count(close) AS n
        FROM dailybars GROUP BY ticker
    ), tgt AS (
        SELECT ticker,
               CAST(sx AS DOUBLE) / n AS mu,
               CASE WHEN n > 1 THEN
                   sqrt(greatest((CAST(sx2 AS DOUBLE)
                                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                                 / (n - 1), 0.0))
               END AS sigma
        FROM stats
    ), y AS (
        SELECT d.ticker, d.day, t.sigma,
               CAST(floor((d.close - t.mu - 0.5::DOUBLE * t.sigma)
                          * 10000000000.0 + 0.5) / 10000000000.0
                    AS DECIMAL(28,10)) AS yu,
               CAST(floor((t.mu - 0.5::DOUBLE * t.sigma - d.close)
                          * 10000000000.0 + 0.5) / 10000000000.0
                    AS DECIMAL(28,10)) AS yd
        FROM dailybars d JOIN tgt t USING (ticker)
    ), p AS (
        SELECT ticker, day, sigma,
               sum(yu) OVER run AS pu,
               sum(yd) OVER run AS pd
        FROM y
        WINDOW run AS (PARTITION BY ticker ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s AS (
        SELECT ticker, day, sigma,
               CAST(pu - least(CAST(0 AS DECIMAL(38,10)), min(pu) OVER run)
                    AS DOUBLE) AS cusum_up,
               CAST(pd - least(CAST(0 AS DECIMAL(38,10)), min(pd) OVER run)
                    AS DOUBLE) AS cusum_dn
        FROM p
        WINDOW run AS (PARTITION BY ticker ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           floor(cusum_up * 1000000 + 0.5) / 1000000 AS cusum_up,
           floor(cusum_dn * 1000000 + 0.5) / 1000000 AS cusum_dn,
           CAST(cusum_up > 4.0::DOUBLE * sigma AS INT) AS alarm_up,
           CAST(cusum_dn > 4.0::DOUBLE * sigma AS INT) AS alarm_dn
    FROM s ORDER BY ticker, day
    """,
    doc="Two-sided tabular CUSUM control chart per ticker over daily "
    "closes (self-calibrated: μ/σ are the key's own DECIMAL-exact "
    "moments, slack k = 0.5σ, alarm h = 4σ). The max(0, ·) recursion is "
    "lowered to its EXACT closed form S_t = P_t − min(0, min_{i≤t} "
    "P_i) — a running sum plus a running min of it, two stacked "
    "WindowExecs on ONE (ticker, day) shuffle+sort; no per-row Python, "
    "no halo blocks, nothing sequential. Deviations are DECIMAL-"
    "quantized before the prefix sums so both windows are exact; the "
    "only float steps are the final subtraction and the σ expressions. "
    "operators/changepoint.py; streaming twin cusum_per_key_stateful "
    "keeps (P, min P) — O(1) state — and matches bit for bit.",
)
def q_cusum(spark, sf_dir):
    from ..operators.changepoint import with_cusum

    out = with_cusum(
        _daily_bars(spark, sf_dir), k_sigma=0.5, h_sigma=4.0
    )
    return out.select(
        "ticker",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        stable_round(F.col("cusum_up"), 6).alias("cusum_up"),
        stable_round(F.col("cusum_dn"), 6).alias("cusum_dn"),
        "alarm_up",
        "alarm_dn",
    ).orderBy("ticker", "day")


@register(
    "q_pairs_spread",
    _BARS_CTE
    + """
    , daily AS (
        SELECT ticker, date_trunc('day', ts) AS d,
               sum(CAST(price AS DECIMAL(18,4))) AS v
        FROM bars GROUP BY ticker, date_trunc('day', ts)
    ), spread AS (
        SELECT a.ticker AS ticker_a, b.ticker AS ticker_b, a.d,
               CASE WHEN a.v > 0 AND b.v > 0
                    THEN """
    + quantize_sql("ln(CAST(a.v AS DOUBLE) / CAST(b.v AS DOUBLE))")
    + """ END AS s
        FROM daily a JOIN daily b ON a.d = b.d AND a.ticker < b.ticker
    ), runs AS (
        SELECT ticker_a, ticker_b, d, s,
               sum(s) OVER run AS ss,
               sum(CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                              * 1000000000000.0 + 0.5) / 1000000000000.0
                        AS DECIMAL(38,12))) OVER run AS ss2,
               count(s) OVER run AS c
        FROM spread
        WINDOW run AS (PARTITION BY ticker_a, ticker_b ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), fin AS (
        SELECT ticker_a, ticker_b, d, s,
               CAST(ss - coalesce(lag(ss, 10) OVER w, 0) AS DOUBLE) AS s_n,
               CAST(ss2 - coalesce(lag(ss2, 10) OVER w, 0) AS DOUBLE) AS s2_n,
               c - coalesce(lag(c, 10) OVER w, 0) AS c_n
        FROM runs
        WINDOW w AS (PARTITION BY ticker_a, ticker_b ORDER BY d)
    )
    SELECT ticker_a, ticker_b, strftime(d, '%Y-%m-%d') AS day,
           floor(CAST(s AS DOUBLE) * 1000000 + 0.5) / 1000000 AS spread,
           CASE WHEN c_n >= 10
                     AND (s2_n - s_n * s_n / c_n) / (c_n - 1) > 0
                THEN floor((CAST(s AS DOUBLE) - s_n / c_n)
                           / sqrt((s2_n - s_n * s_n / c_n) / (c_n - 1))
                           * 1000000 + 0.5) / 1000000
           END AS zscore
    FROM fin ORDER BY ticker_a, ticker_b, day
    """,
    doc="Pairs-trading spread monitor: for every ticker pair, the "
    "log-ratio of daily dollar values and its 10-day rolling z-score "
    "(the mean-reversion entry/exit signal). The spread is DECIMAL-"
    "quantized at source so the rolling first/second moments ride the "
    "exact running-sum-difference lowering (one (pair, day) "
    "shuffle+sort for everything); z is emitted only when the window "
    "holds 10 full observations with positive variance. Pair fan-out "
    "is |tickers|² on the DAILY aggregate (K²·days rows, K = distinct "
    "tickers — tiny), never on raw ticks.",
)
def q_pairs_spread(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    daily = bars.groupBy(
        "ticker", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(F.col("price").cast("decimal(18,4)")).alias("v"))
    a = daily.select(F.col("ticker").alias("ticker_a"), "d", F.col("v").alias("va"))
    b = daily.select(F.col("ticker").alias("ticker_b"), "d", F.col("v").alias("vb"))
    spread = (
        a.join(b, "d")
        .where(F.col("ticker_a") < F.col("ticker_b"))
        .select(
            "ticker_a",
            "ticker_b",
            "d",
            # a non-positive daily value leaves the log-ratio undefined:
            # NULL (the row still exists; the rolling moments skip it).
            # snap-then-cast (stats.quantize) pins the grid point
            # identically cross-engine.
            F.when(
                (F.col("va") > 0) & (F.col("vb") > 0),
                quantize(
                    F.log(
                        F.col("va").cast("double") / F.col("vb").cast("double")
                    )
                ),
            ).alias("s"),
        )
    )
    w = Window.partitionBy("ticker_a", "ticker_b").orderBy("d")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    runs = spread.select(
        "ticker_a",
        "ticker_b",
        "d",
        "s",
        F.sum("s").over(run).alias("ss"),
        F.sum(
            quantize(
                F.col("s").cast("double") * F.col("s").cast("double"),
                grid="decimal(38,12)",
            )
        )
        .over(run)
        .alias("ss2"),
        F.count("s").over(run).alias("c"),
    )
    s_n = (F.col("ss") - F.coalesce(F.lag("ss", 10).over(w), F.lit(0))).cast("double")
    s2_n = (F.col("ss2") - F.coalesce(F.lag("ss2", 10).over(w), F.lit(0))).cast(
        "double"
    )
    c_n = F.col("c") - F.coalesce(F.lag("c", 10).over(w), F.lit(0))
    var = (s2_n - s_n * s_n / c_n) / (c_n - 1)
    z = F.when(
        (c_n >= 10) & (var > 0),
        (F.col("s").cast("double") - s_n / c_n) / F.sqrt(var),
    )
    return runs.select(
        "ticker_a",
        "ticker_b",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        stable_round(F.col("s").cast("double"), 6).alias("spread"),
        stable_round(z, 6).alias("zscore"),
    ).orderBy("ticker_a", "ticker_b", "day")


@register(
    "q_theil_sen",
    _DAILYBARS_CTE
    + """
    , pairs AS (
        SELECT a.ticker,
               (b.close - a.close)
                   / date_diff('day', a.day, b.day) AS slope,
               a.day AS d_i, b.day AS d_j
        FROM dailybars a
        JOIN dailybars b ON a.ticker = b.ticker AND a.day < b.day
    ), ranked AS (
        SELECT ticker, slope,
               row_number() OVER (PARTITION BY ticker
                                  ORDER BY slope, d_i, d_j) AS rn,
               count(*) OVER (PARTITION BY ticker) AS n
        FROM pairs
    )
    SELECT ticker,
           CAST(max(n) AS BIGINT) AS n_pairs,
           floor(max(CASE WHEN rn = (max_n + 1) // 2 THEN slope END)
                 * 1000000 + 0.5) / 1000000 AS slope
    FROM (SELECT *, max(n) OVER (PARTITION BY ticker) AS max_n FROM ranked)
    GROUP BY ticker ORDER BY ticker
    """,
    doc="Theil–Sen robust trend estimator per ticker: the LOWER MEDIAN "
    "of all pairwise daily-close slopes (c_j−c_i)/(d_j−d_i), i<j — "
    "outlier-resistant where OLS is not. The median is rank-based "
    "(row_number under a fully tiebroken (slope, d_i, d_j) order, pick "
    "rank ⌊(n+1)/2⌋) — no interpolation, so the answer is a DATA VALUE "
    "and engine-exact by construction. Pair fan-out is O(days²) per "
    "key on the DAILY aggregate (435 pairs per 30-day key) — at longer "
    "histories the standard fix is pair sampling or the "
    "Siegel-repeated-median per-anchor variant, both the same join "
    "shape with a rank prune.",
)
def q_theil_sen(spark, sf_dir):
    d = _daily_bars(spark, sf_dir).select("ticker", "day", "close")
    a = d.select("ticker", F.col("day").alias("d_i"), F.col("close").alias("c_i"))
    b = d.select(
        F.col("ticker").alias("t2"),
        F.col("day").alias("d_j"),
        F.col("close").alias("c_j"),
    )
    pairs = a.join(
        b, (a.ticker == b.t2) & (a.d_i < b.d_j)
    ).select(
        "ticker",
        ((F.col("c_j") - F.col("c_i")) / F.datediff("d_j", "d_i")).alias("slope"),
        "d_i",
        "d_j",
    )
    w = Window.partitionBy("ticker").orderBy("slope", "d_i", "d_j")
    seg = Window.partitionBy("ticker")
    ranked = pairs.select(
        "ticker",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(seg).alias("n"),
    ).withColumn("max_n", F.max("n").over(seg))
    return (
        ranked.groupBy("ticker")
        .agg(
            F.max("n").cast("long").alias("n_pairs"),
            stable_round(
                F.max(
                    F.when(
                        F.col("rn") == F.floor((F.col("max_n") + 1) / 2),
                        F.col("slope"),
                    )
                ),
                6,
            ).alias("slope"),
        )
        .orderBy("ticker")
    )


@register(
    "q_multi_rollup",
    _VBARS_CTE
    + f"""
    , g AS (
        SELECT ticker, ts, price, vol,
               date_trunc('day', ts)   AS day,
               date_trunc('week', ts)  AS week,
               date_trunc('month', ts) AS month,
               {_ORDKEY.replace("event_id", "seq")} AS ok
        FROM vbars
    ), rolled AS (
        SELECT ticker, day, week, month,
               max(price) AS high, min(price) AS low,
               -- null-keeping last-by-ok without a per-grain rank pass:
               -- pack price behind the fixed-width (40-char) order key,
               -- take the max, strip the key. arg_max would SKIP null
               -- prices; Spark's max_by keeps the last tick's value.
               -- double<->varchar round-trips exactly (shortest repr).
               CAST(nullif(substr(max(ok || ':'
                                      || coalesce(CAST(price AS VARCHAR), '')),
                                  42), '') AS DOUBLE) AS close,
               CAST(sum(vol) AS BIGINT) AS vol,
               count(*) AS n_ticks
        FROM g
        GROUP BY GROUPING SETS ((ticker, day), (ticker, week),
                                (ticker, month))
    )
    SELECT ticker,
           CASE WHEN day IS NOT NULL THEN 'day'
                WHEN week IS NOT NULL THEN 'week'
                ELSE 'month' END AS grain,
           strftime(coalesce(day, week, month), '%Y-%m-%d') AS period,
           high, low, close, vol, n_ticks
    FROM rolled
    ORDER BY ticker, grain, period
    """,
    doc="Hypertable-style multi-resolution continuous aggregate: "
    "day/week/month OHLC+volume candles for every ticker in ONE scan — "
    "GROUPING SETS expands to a single Expand+HashAggregate, so three "
    "granularities cost one fact-table pass instead of three (the "
    "TimescaleDB continuous-aggregate / materialized-rollup shape). "
    "Close is tie-robust max_by over the (ts, seq) order key; volume "
    "stays in LONG. Uses the native DataFrame groupingSets API "
    "(Spark 4).",
)
def q_multi_rollup(spark, sf_dir):
    v = _vbars(spark, sf_dir)
    order = F.struct(F.col("ts"), F.col("seq"))
    g = v.select(
        "ticker",
        "price",
        "vol",
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("month", "ts").alias("month"),
        order.alias("ok"),
    )
    rolled = g.groupingSets(
        [["ticker", "day"], ["ticker", "week"], ["ticker", "month"]],
        "ticker",
        "day",
        "week",
        "month",
    ).agg(
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.max_by("price", F.col("ok")).alias("close"),
        F.sum("vol").cast("long").alias("vol"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    grain = (
        F.when(F.col("day").isNotNull(), "day")
        .when(F.col("week").isNotNull(), "week")
        .otherwise("month")
    )
    return rolled.select(
        "ticker",
        grain.alias("grain"),
        F.date_format(F.coalesce("day", "week", "month"), "yyyy-MM-dd").alias(
            "period"
        ),
        "high",
        "low",
        "close",
        "vol",
        "n_ticks",
    ).orderBy("ticker", "grain", "period")


@register(
    "q_roll_spread",
    _DAILYBARS_CTE
    + f"""
    , d AS (
        -- snap-then-cast deltas (quantize discipline), then the cross
        -- product stays in PURE DECIMAL arithmetic — exact at scale
        -- 12, no double round-trip (the x1000 magnitude stress caught
        -- the old double-product bare cast diverging once |d1*d0|
        -- outgrew the 12-digit grid's ulp). (19,6) HERE because
        -- DuckDB widens the product to w1+w2 (exactly the 38 cap;
        -- same-width 18s overflow its int64 multiply); the Spark side
        -- uses (18,6) operands because ITS (19,6) product would type
        -- as (38,11) under allowPrecisionLoss and HALF_UP every
        -- product at 1e-11. Same values, same exact scale-12 result.
        SELECT ticker, day,
               CAST(floor((close - lag(close) OVER w) * 1000000 + 0.5)
                    / 1000000 AS DECIMAL(19,6)) AS d1,
               CAST(floor((lag(close) OVER w - lag(close, 2) OVER w)
                          * 1000000 + 0.5) / 1000000
                    AS DECIMAL(19,6)) AS d0
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), m AS (
        SELECT ticker,
               count(*) AS n,
               sum(d1 * d0) AS sxy,
               sum(d1) AS sx, sum(d0) AS sy
        FROM d WHERE d1 IS NOT NULL AND d0 IS NOT NULL
        GROUP BY ticker
    )
    SELECT ticker, CAST(n AS BIGINT) AS n,
           -- split-cast: DuckDB's wide-decimal->double cast
           -- double-rounds past 2^53 (functions/scalars.py
           -- decimal_to_double_split) — the x1000 stress caught it
           floor(({decimal_to_double_split_sql('sxy')}
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                 / (n - 1) * 1000000 + 0.5) / 1000000 AS autocov,
           CASE WHEN ({decimal_to_double_split_sql('sxy')}
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                     / (n - 1) < 0
                THEN floor(2.0 * sqrt(-(({decimal_to_double_split_sql('sxy')}
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                     / (n - 1))) * 1000000 + 0.5) / 1000000
           END AS roll_spread
    FROM m WHERE n > 1 ORDER BY ticker
    """,
    doc="Roll's implied bid-ask spread (market microstructure): "
    "2·sqrt(−cov(Δp_t, Δp_{t−1})) per ticker from the first-order "
    "serial autocovariance of daily price changes — bounce-induced "
    "negative autocovariance implies an effective spread; non-negative "
    "autocovariance (trending series) yields null, Roll's own "
    "condition. Deltas and their cross-products are DECIMAL-quantized "
    "so the moment sums are exact and order-insensitive; the "
    "covariance/sqrt are one fixed-order double expression per ticker. "
    "One window pass + one hash aggregate.",
)
def q_roll_spread(spark, sf_dir):
    d = _daily_bars(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy("day")
    # snap-then-cast deltas; the cross product then stays in PURE
    # DECIMAL arithmetic with engine-appropriate operand widths: Spark
    # needs (18,6) so the product types as (37,12) — EXACT; (19,6)
    # operands would type as (38,11) under allowPrecisionLoss and
    # HALF_UP every product at 1e-11 (self-review catch). The oracle
    # uses (19,6) because DuckDB's same-width-18 multiply overflows
    # int64 and its product widens to exactly the 38 cap. Same
    # values, same scale-12 products, different declared widths.
    d1 = stable_round(F.col("close") - F.lag("close").over(w), 6).cast(
        "decimal(18,6)"
    )
    d0 = stable_round(
        F.lag("close").over(w) - F.lag("close", 2).over(w), 6
    ).cast("decimal(18,6)")
    pairs = (
        d.withColumn("d1", d1)
        .withColumn("d0", d0)
        .where(F.col("d1").isNotNull() & F.col("d0").isNotNull())
    )
    m = pairs.groupBy("ticker").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("d1") * F.col("d0")).alias("sxy"),
        F.sum("d1").alias("sx"),
        F.sum("d0").alias("sy"),
    )
    # split-cast sxy (wide fine-scale decimal): DuckDB's direct cast
    # double-rounds past 2^53 — functions/scalars.decimal_to_double_split
    cov = (
        decimal_to_double_split(F.col("sxy"))
        - F.col("sx").cast("double") * F.col("sy").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    return (
        m.where(F.col("n") > 1)
        .select(
            "ticker",
            F.col("n").cast("long").alias("n"),
            stable_round(cov, 6).alias("autocov"),
            F.when(cov < 0, stable_round(2.0 * F.sqrt(-cov), 6)).alias(
                "roll_spread"
            ),
        )
        .orderBy("ticker")
    )


@register(
    "q_hurst",
    _DAILYBARS_CTE
    + """
    , r AS (
        SELECT ticker, day,
               """
    + quantize_sql("ln(close / lag(close) OVER w)")
    + """ AS r
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
        QUALIFY close > 0 AND lag(close) OVER w > 0
    ), idxed AS (
        SELECT ticker, r,
               row_number() OVER (PARTITION BY ticker ORDER BY day) - 1 AS idx
        FROM r
    ), blocked AS (
        SELECT ticker, r, idx, m,
               CAST(floor(idx / m) AS BIGINT) AS blk
        FROM idxed, unnest([4, 7, 14]) AS t(m)
    ), full_blocks AS (
        SELECT * FROM (
            SELECT ticker, m, blk, r, idx,
                   count(*) OVER wb AS cnt,
                   sum(r) OVER wb AS s_r,
                   sum(CAST(floor(CAST(r AS DOUBLE) * CAST(r AS DOUBLE)
                                  * 1000000000000.0 + 0.5) / 1000000000000.0
                            AS DECIMAL(38,12))) OVER wb AS s_r2,
                   sum(r) OVER (PARTITION BY ticker, m, blk ORDER BY idx
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
                   row_number() OVER (PARTITION BY ticker, m, blk
                                      ORDER BY idx) AS k
            FROM blocked
            WINDOW wb AS (PARTITION BY ticker, m, blk)
        ) WHERE cnt = m
    ), z AS (
        SELECT ticker, m, blk, k, s_r, s_r2,
               CAST(cum AS DOUBLE) - k * (CAST(s_r AS DOUBLE) / m) AS zv
        FROM full_blocks
    ), rs AS (
        SELECT ticker, m, blk,
               max(zv) - min(zv) AS rng,
               sqrt((CAST(max(s_r2) AS DOUBLE)
                     - CAST(max(s_r) AS DOUBLE) * CAST(max(s_r) AS DOUBLE) / m)
                    / m) AS s
        FROM z GROUP BY ticker, m, blk
    ), mean_rs AS (
        -- snap-then-cast on every fine-grid cast (quantize discipline)
        SELECT ticker, m,
               ln(CAST(sum(CAST(floor(rng / s * 1000000000000.0 + 0.5)
                                / 1000000000000.0 AS DECIMAL(28,12)))
                       AS DOUBLE)
                  / count(*)) AS y,
               ln(CAST(m AS DOUBLE)) AS x
        FROM rs WHERE s > 0 GROUP BY ticker, m
    ), fit AS (
        SELECT ticker,
               count(*) AS np,
               sum(CAST(floor(x * 1000000000000.0 + 0.5)
                        / 1000000000000.0 AS DECIMAL(28,12))) AS sx,
               sum(CAST(floor(y * 1000000000000.0 + 0.5)
                        / 1000000000000.0 AS DECIMAL(28,12))) AS sy,
               sum(CAST(floor(x * y * 1000000000000.0 + 0.5)
                        / 1000000000000.0 AS DECIMAL(38,12))) AS sxy,
               sum(CAST(floor(x * x * 1000000000000.0 + 0.5)
                        / 1000000000000.0 AS DECIMAL(38,12))) AS sxx
        FROM mean_rs GROUP BY ticker
    )
    SELECT ticker, CAST(np AS BIGINT) AS n_sizes,
           floor((np * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (np * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS hurst
    FROM fit WHERE np > 1 ORDER BY ticker
    """,
    doc="Hurst exponent by classical rescaled-range (R/S) analysis per "
    "ticker: daily log returns are cut into complete blocks of sizes "
    "4/7/14 (the size axis explodes JVM-side — no join); per block, "
    "R = range of the cumulative mean-deviations and S = population "
    "stddev, both from DECIMAL-exact block sums (Z_k = cum_k − k·μ, so "
    "the 'cumulative deviation' needs NO second pass over the block); "
    "H = least-squares slope of ln(mean R/S) on ln(size), the fit "
    "moments DECIMAL-quantized per point. H≈0.5 random walk, >0.5 "
    "trending, <0.5 mean-reverting. Everything rides (ticker, size, "
    "block) windows on ONE shuffle + two tiny hash aggregates.",
)
def q_hurst(spark, sf_dir):
    d = _daily_bars(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy("day")
    prev = F.lag("close").over(w)
    # positivity gate on BOTH closes: a zero price leaves the log
    # return undefined (ANSI DIVIDE_BY_ZERO / DuckDB ln(0) error
    # otherwise) — the row drops out of the R/S block grid entirely
    r = (
        d.withColumn("__prev", prev)
        .where((F.col("close") > 0) & (F.col("__prev") > 0))
        .select(
            "ticker",
            "day",
            quantize(F.log(F.col("close") / F.col("__prev"))).alias("r"),
        )
    )
    idxed = r.select(
        "ticker", "r", (F.row_number().over(w) - 1).alias("idx")
    )
    blocked = idxed.withColumn("m", F.explode(F.array(F.lit(4), F.lit(7), F.lit(14)))).withColumn(
        "blk", F.floor(F.col("idx") / F.col("m")).cast("long")
    )
    wb = Window.partitionBy("ticker", "m", "blk")
    run = wb.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    fb = blocked.select(
        "ticker",
        "m",
        "blk",
        "idx",
        F.count(F.lit(1)).over(wb).alias("cnt"),
        F.sum("r").over(wb).alias("s_r"),
        F.sum(
            quantize(
                F.col("r").cast("double") * F.col("r").cast("double"),
                grid="decimal(38,12)",
            )
        )
        .over(wb)
        .alias("s_r2"),
        F.sum("r").over(run).alias("cum"),
        F.row_number().over(wb.orderBy("idx")).alias("k"),
    ).where(F.col("cnt") == F.col("m"))
    z = fb.withColumn(
        "zv",
        F.col("cum").cast("double")
        - F.col("k") * (F.col("s_r").cast("double") / F.col("m")),
    )
    rs = z.groupBy("ticker", "m", "blk").agg(
        (F.max("zv") - F.min("zv")).alias("rng"),
        F.sqrt(
            (
                F.max("s_r2").cast("double")
                - F.max("s_r").cast("double")
                * F.max("s_r").cast("double")
                / F.col("m")
            )
            / F.col("m")
        ).alias("s"),
    )
    # snap-then-cast (quantize) on every fine-grid cast below — bare
    # double->DECIMAL casts knife-edge cross-engine on arbitrary doubles
    mean_rs = (
        rs.where(F.col("s") > 0)
        .groupBy("ticker", "m")
        .agg(
            F.log(
                F.sum(quantize(F.col("rng") / F.col("s"))).cast("double")
                / F.count(F.lit(1))
            ).alias("y")
        )
        .withColumn("x", F.log(F.col("m").cast("double")))
    )
    fit = mean_rs.groupBy("ticker").agg(
        F.count(F.lit(1)).alias("np"),
        F.sum(quantize(F.col("x"))).alias("sx"),
        F.sum(quantize(F.col("y"))).alias("sy"),
        F.sum(quantize(F.col("x") * F.col("y"), grid="decimal(38,12)")).alias("sxy"),
        F.sum(quantize(F.col("x") * F.col("x"), grid="decimal(38,12)")).alias("sxx"),
    )
    hurst = (
        F.col("np") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.col("np") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return (
        fit.where(F.col("np") > 1)
        .select(
            "ticker",
            F.col("np").cast("long").alias("n_sizes"),
            stable_round(hurst, 6).alias("hurst"),
        )
        .orderBy("ticker")
    )


@register(
    "q_spearman",
    _BARS_CTE
    + """
    , daily AS (
        SELECT ticker, date_trunc('day', ts) AS d,
               sum(CAST(price AS DECIMAL(18,4))) AS v
        FROM bars GROUP BY ticker, date_trunc('day', ts)
    ), pairs AS (
        SELECT a.ticker AS ticker_a, b.ticker AS ticker_b, a.d,
               a.v AS va, b.v AS vb
        FROM daily a JOIN daily b ON a.d = b.d AND a.ticker < b.ticker
    ), ranked AS (
        SELECT ticker_a, ticker_b,
               row_number() OVER (PARTITION BY ticker_a, ticker_b
                                  ORDER BY va NULLS LAST, d) AS ra,
               row_number() OVER (PARTITION BY ticker_a, ticker_b
                                  ORDER BY vb NULLS LAST, d) AS rb
        FROM pairs
    )
    SELECT ticker_a, ticker_b,
           CAST(count(*) AS BIGINT) AS n,
           floor((count(*) * CAST(sum(ra * rb) AS DOUBLE)
                  - CAST(sum(ra) AS DOUBLE) * CAST(sum(rb) AS DOUBLE))
                 / (count(*) * CAST(sum(ra * ra) AS DOUBLE)
                    - CAST(sum(ra) AS DOUBLE) * CAST(sum(ra) AS DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS spearman
    FROM ranked GROUP BY ticker_a, ticker_b
    HAVING count(*) > 1
    ORDER BY ticker_a, ticker_b
    """,
    doc="Spearman rank correlation per ticker pair over daily dollar "
    "values — the monotone-association complement to the Pearson "
    "q_series_correlation (robust to outliers and nonlinearity). Ranks "
    "come from row_number under a fully tiebroken (value, day) order, "
    "so EVERY moment (Σr, Σr², Σr_a·r_b) is INTEGER arithmetic — the "
    "whole statistic is exact with zero decimal casts, the strongest "
    "possible cross-engine reproducibility. (With distinct ranks "
    "Σra² = Σrb², so the symmetric denominator reduces to the variance "
    "of either.) Pair fan-out on the daily aggregate, never ticks; two "
    "rank windows + one hash aggregate.",
)
def q_spearman(spark, sf_dir):
    bars = _bars(spark, sf_dir)
    daily = bars.groupBy(
        "ticker", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(F.col("price").cast("decimal(18,4)")).alias("v"))
    a = daily.select(F.col("ticker").alias("ticker_a"), "d", F.col("v").alias("va"))
    b = daily.select(
        F.col("ticker").alias("ticker_b"),
        F.col("d").alias("d2"),
        F.col("v").alias("vb"),
    )
    pairs = a.join(
        b, (F.col("d") == F.col("d2")) & (F.col("ticker_a") < F.col("ticker_b"))
    ).select("ticker_a", "ticker_b", "d", "va", "vb")
    pw = Window.partitionBy("ticker_a", "ticker_b")
    # NULLS LAST pinned explicitly: Spark's ASC default is NULLS FIRST
    # while DuckDB's is NULLS LAST — an unpinned rank of a null-valued
    # day silently flips the whole correlation's sign cross-engine
    ranked = pairs.select(
        "ticker_a",
        "ticker_b",
        F.row_number().over(
            pw.orderBy(F.col("va").asc_nulls_last(), "d")
        ).alias("ra"),
        F.row_number().over(
            pw.orderBy(F.col("vb").asc_nulls_last(), "d")
        ).alias("rb"),
    )
    n = F.count(F.lit(1))
    num = n * F.sum(F.col("ra") * F.col("rb")).cast("double") - F.sum(
        "ra"
    ).cast("double") * F.sum("rb").cast("double")
    den = n * F.sum(F.col("ra") * F.col("ra")).cast("double") - F.sum(
        "ra"
    ).cast("double") * F.sum("ra").cast("double")
    return (
        ranked.groupBy("ticker_a", "ticker_b")
        .agg(
            n.cast("long").alias("n"),
            stable_round(num / den, 6).alias("spearman"),
        )
        .where(F.col("n") > 1)
        .orderBy("ticker_a", "ticker_b")
    )


@register(
    "q_volume_profile",
    _VBARS_CTE
    + """
    , hist AS (
        SELECT ticker,
               CAST(floor(price / 20.0) AS INT) AS bucket,
               CAST(sum(vol) AS BIGINT) AS v
        FROM vbars GROUP BY 1, 2
    )
    SELECT ticker, bucket, v,
           floor(v / CAST(sum(v) OVER (PARTITION BY ticker) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS share,
           CAST(row_number() OVER (PARTITION BY ticker
                                   ORDER BY v DESC, bucket NULLS LAST) = 1
                AS INT) AS is_poc
    FROM hist ORDER BY ticker, bucket
    """,
    doc="Volume profile (market profile): per ticker, traded volume "
    "histogrammed into fixed price buckets with each bucket's share "
    "and the POINT OF CONTROL (highest-volume bucket, bucket-id "
    "tiebreak) flagged — where positions concentrate, the "
    "support/resistance primitive. One hash aggregate reduces ticks "
    "to the O(tickers × buckets) grid; the share/POC windows run on "
    "that grid, never on ticks. Volume stays in LONG end to end.",
)
def q_volume_profile(spark, sf_dir):
    v = _vbars(spark, sf_dir)
    hist = v.groupBy(
        "ticker",
        F.floor(F.col("price") / F.lit(20.0)).cast("int").alias("bucket"),
    ).agg(F.sum("vol").cast("long").alias("v"))
    seg = Window.partitionBy("ticker")
    # NULLS LAST pinned (Spark ASC default is NULLS FIRST, DuckDB's is
    # NULLS LAST): on a volume tie the unpriced-ticks bucket must never
    # out-rank a real price bucket for point-of-control
    poc = Window.partitionBy("ticker").orderBy(
        F.desc("v"), F.col("bucket").asc_nulls_last()
    )
    return hist.select(
        "ticker",
        "bucket",
        "v",
        stable_round(F.col("v") / F.sum("v").over(seg).cast("double"), 6).alias(
            "share"
        ),
        (F.row_number().over(poc) == 1).cast("int").alias("is_poc"),
    ).orderBy("ticker", "bucket")


@register(
    "q_cross_momentum",
    _DAILYBARS_CTE
    + """
    , r AS (
        SELECT ticker, day, close,
               close / lag(close, 5) OVER w - 1.0 AS r5,
               lead(close) OVER w / close - 1.0 AS r1_next
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), ranked AS (
        SELECT day, ticker, r5, r1_next,
               row_number() OVER (PARTITION BY day
                                  ORDER BY r5 DESC, ticker) AS rk,
               count(*) OVER (PARTITION BY day) AS k
        FROM r WHERE r5 IS NOT NULL AND r1_next IS NOT NULL
    ), legs AS (
        -- snap-then-cast (quantize discipline) on the leg terms
        SELECT day,
               sum(CASE WHEN rk <= 2
                        THEN CAST(floor(r1_next * 1000000000000.0 + 0.5)
                                  / 1000000000000.0
                             AS DECIMAL(28,12)) END) AS s_long,
               sum(CASE WHEN rk > k - 2
                        THEN CAST(floor(r1_next * 1000000000000.0 + 0.5)
                                  / 1000000000000.0
                             AS DECIMAL(28,12)) END) AS s_short,
               sum(CASE WHEN rk <= 2 THEN 1 ELSE 0 END) AS n_long,
               sum(CASE WHEN rk > k - 2 THEN 1 ELSE 0 END) AS n_short,
               max(k) AS k
        FROM ranked GROUP BY day
    ), daily_ls AS (
        SELECT day, n_long, n_short,
               CAST(s_long AS DOUBLE) / n_long
                   - CAST(s_short AS DOUBLE) / n_short AS ls
        FROM legs WHERE k >= 4 AND n_long = 2 AND n_short = 2
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n_long AS BIGINT) AS n_long,
           CAST(n_short AS BIGINT) AS n_short,
           floor(ls * 1000000 + 0.5) / 1000000 AS ls_return,
           CAST(sum(CAST(floor(CASE WHEN ls > -1.0 THEN ln(1.0 + ls)
                                    ELSE 0.0 END * 1000000000000.0 + 0.5)
                         / 1000000000000.0 AS DECIMAL(28,12)))
                    OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS DOUBLE) AS log_growth
    FROM daily_ls ORDER BY day
    """,
    doc="Cross-sectional momentum factor backtest (winner−loser "
    "portfolio): each day, rank tickers by trailing 5-day return "
    "(ticker tiebreak), go long the top 2 / short the bottom 2, score "
    "with each leg's NEXT-day return (no look-ahead: the signal uses "
    "closes through t, the payoff is t→t+1), and compound the "
    "long-short spread into a LOG-space growth index: the "
    "DECIMAL-quantized log1p running sum itself (order-independent — "
    "the q_portfolio_return discipline; growth = exp(log_growth) is a "
    "consumer-side presentation step, because a final exp() is a libm "
    "call whose 1-ULP cross-engine divergence survives fixed-decimal "
    "rounding once the index grows large). The per-day rank window "
    "runs on the O(tickers) daily frame; leg sums are DECIMAL-exact; "
    "days without both full legs are dropped.",
)
def q_cross_momentum(spark, sf_dir):
    d = _daily_bars(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy("day")
    r = d.select(
        "ticker",
        "day",
        (F.col("close") / F.lag("close", 5).over(w) - 1.0).alias("r5"),
        (F.lead("close").over(w) / F.col("close") - 1.0).alias("r1_next"),
    ).where(F.col("r5").isNotNull() & F.col("r1_next").isNotNull())
    dw = Window.partitionBy("day")
    ranked = r.select(
        "day",
        "r1_next",
        F.row_number().over(dw.orderBy(F.desc("r5"), "ticker")).alias("rk"),
        F.count(F.lit(1)).over(dw).alias("k"),
    )
    dec = quantize  # snap-then-cast — bare casts knife-edge cross-engine
    legs = ranked.groupBy("day").agg(
        F.sum(F.when(F.col("rk") <= 2, dec(F.col("r1_next")))).alias("s_long"),
        F.sum(
            F.when(F.col("rk") > F.col("k") - 2, dec(F.col("r1_next")))
        ).alias("s_short"),
        F.sum(F.when(F.col("rk") <= 2, 1).otherwise(0)).alias("n_long"),
        F.sum(F.when(F.col("rk") > F.col("k") - 2, 1).otherwise(0)).alias(
            "n_short"
        ),
        F.max("k").alias("k"),
    )
    ls = (
        F.col("s_long").cast("double") / F.col("n_long")
        - F.col("s_short").cast("double") / F.col("n_short")
    )
    daily_ls = legs.where(
        (F.col("k") >= 4) & (F.col("n_long") == 2) & (F.col("n_short") == 2)
    ).select("day", "n_long", "n_short", ls.alias("ls"))
    lr = quantize(
        F.when(F.col("ls") > -1.0, F.log(F.lit(1.0) + F.col("ls"))).otherwise(
            F.lit(0.0)
        )
    )
    run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily_ls.withColumn("__lr", lr)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_long").cast("long").alias("n_long"),
            F.col("n_short").cast("long").alias("n_short"),
            stable_round(F.col("ls"), 6).alias("ls_return"),
            F.sum("__lr").over(run).cast("double").alias("log_growth"),
        )
        .orderBy("day")
    )


@register(
    "q_kyle_lambda",
    _VBARS_CTE
    + """
    , d AS (
        SELECT ticker, ts, seq, vol,
               price - lag(price) OVER w AS dp
        FROM vbars
        WINDOW w AS (PARTITION BY ticker ORDER BY ts, seq)
    ), sv AS (
        SELECT ticker,
               CAST(dp AS DECIMAL(18,6)) AS dp,
               CAST(CASE WHEN dp > 0 THEN vol
                         WHEN dp < 0 THEN -vol ELSE 0 END AS BIGINT) AS q
        FROM d WHERE dp IS NOT NULL
    ), m AS (
        SELECT ticker, count(*) AS n,
               sum(q) AS sq,
               sum(dp) AS sdp,
               sum(q * q) AS sqq,
               sum(CAST(CAST(dp AS DOUBLE) * q AS DECIMAL(38,10))) AS sdq
        FROM sv GROUP BY ticker
    )
    SELECT ticker, CAST(n AS BIGINT) AS n,
           floor((n * CAST(sdq AS DOUBLE)
                  - CAST(sq AS DOUBLE) * CAST(sdp AS DOUBLE))
                 / (n * CAST(sqq AS DOUBLE)
                    - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                 * 1000000000 + 0.5) / 1000000000 AS kyle_lambda
    FROM m WHERE n > 1
          AND n * CAST(sqq AS DOUBLE)
              - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) <> 0
    ORDER BY ticker
    """,
    doc="Kyle's lambda (price impact): per ticker, the OLS slope of "
    "tick price change on tick-rule SIGNED volume — how many price "
    "units one unit of net order flow moves, the classic liquidity/"
    "impact estimator beside q_amihud and q_roll_spread. Signed "
    "volume is exact LONG (so Σq, Σq² are integer-exact); Δp and "
    "Δp·q are DECIMAL-quantized; the slope is one fixed-order double "
    "expression per ticker. One window lag + one hash aggregate; "
    "degenerate no-flow keys (zero signed-volume variance) drop out.",
)
def q_kyle_lambda(spark, sf_dir):
    v = _vbars(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy("ts", "seq")
    d = v.withColumn("dp", F.col("price") - F.lag("price").over(w)).where(
        F.col("dp").isNotNull()
    )
    q = (
        F.when(F.col("dp") > 0, F.col("vol"))
        .when(F.col("dp") < 0, -F.col("vol"))
        .otherwise(F.lit(0))
        .cast("long")
    )
    sv = d.select(
        "ticker", F.col("dp").cast("decimal(18,6)").alias("dp"), q.alias("q")
    )
    m = sv.groupBy("ticker").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("dp").alias("sdp"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum((F.col("dp").cast("double") * F.col("q")).cast("decimal(38,10)")).alias(
            "sdq"
        ),
    )
    num = F.col("n") * F.col("sdq").cast("double") - F.col("sq").cast(
        "double"
    ) * F.col("sdp").cast("double")
    den = F.col("n") * F.col("sqq").cast("double") - F.col("sq").cast(
        "double"
    ) * F.col("sq").cast("double")
    return (
        m.where((F.col("n") > 1) & (den != 0))
        .select(
            "ticker",
            F.col("n").cast("long").alias("n"),
            stable_round(num / den, 9).alias("kyle_lambda"),
        )
        .orderBy("ticker")
    )


@register(
    "q_underwater",
    _DAILYBARS_CTE
    + """
    , uw AS (
        SELECT ticker, day,
               CASE WHEN close < max(close) OVER (PARTITION BY ticker
                         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) THEN 1 ELSE 0 END AS under
        FROM dailybars
    ), grp AS (
        SELECT ticker, day, under,
               row_number() OVER (PARTITION BY ticker ORDER BY day)
               - row_number() OVER (PARTITION BY ticker, under ORDER BY day)
                   AS g
        FROM uw
    ), runs AS (
        SELECT ticker, count(*) AS run_len, min(day) AS run_start
        FROM grp WHERE under = 1
        GROUP BY ticker, g
    ), best AS (
        SELECT ticker, run_len, run_start,
               row_number() OVER (PARTITION BY ticker
                                  ORDER BY run_len DESC, run_start) AS rk
        FROM runs
    )
    SELECT ticker,
           CAST(run_len AS BIGINT) AS max_underwater_days,
           strftime(run_start, '%Y-%m-%d') AS start_day
    FROM best WHERE rk = 1 ORDER BY ticker
    """,
    doc="Longest underwater period per ticker (time-UNDER-water, the "
    "duration complement of q_drawdown's depth): days strictly below "
    "the running peak, consecutive runs identified by the classic "
    "gaps-and-islands double row_number difference — run-length "
    "encoding as two windows + one aggregate, no iteration, no "
    "self-join. The running max, both row_numbers, and the per-run "
    "aggregate all ride (ticker, day)-partitioned operators; counts "
    "exact LONGs end to end (no floats anywhere but none needed).",
)
def q_underwater(spark, sf_dir):
    d = _daily_bars(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy("day")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    uw = d.select(
        "ticker",
        "day",
        F.when(F.col("close") < F.max("close").over(run), 1)
        .otherwise(0)
        .alias("under"),
    )
    g = (
        F.row_number().over(w)
        - F.row_number().over(
            Window.partitionBy("ticker", "under").orderBy("day")
        )
    ).alias("g")
    runs = (
        uw.select("ticker", "day", "under", g)
        .where(F.col("under") == 1)
        .groupBy("ticker", "g")
        .agg(F.count(F.lit(1)).alias("run_len"), F.min("day").alias("run_start"))
    )
    rk = Window.partitionBy("ticker").orderBy(F.desc("run_len"), "run_start")
    return (
        runs.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select(
            "ticker",
            F.col("run_len").cast("long").alias("max_underwater_days"),
            F.date_format("run_start", "yyyy-MM-dd").alias("start_day"),
        )
        .orderBy("ticker")
    )


@register(
    "q_swing_points",
    _DAILYBARS_CTE
    + """
    , ctx AS (
        SELECT ticker, day, high, low,
               max(high) OVER w2 AS hmax, count(*) OVER w2 AS cnt,
               min(low)  OVER w2 AS lmin
        FROM dailybars
        WINDOW w2 AS (PARTITION BY ticker ORDER BY day
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
    )
    SELECT ticker, strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN high = hmax THEN 1 ELSE 0 END AS swing_high,
           CASE WHEN low = lmin THEN 1 ELSE 0 END AS swing_low,
           high, low
    FROM ctx
    WHERE cnt = 5 AND (high = hmax OR low = lmin)
    ORDER BY ticker, day
    """,
    doc="Swing-point detection (the support/resistance primitive): a "
    "bar is a swing high/low when its high/low is the extreme of the "
    "centered 5-bar neighborhood (ROWS 2 PRECEDING..2 FOLLOWING — a "
    "centered frame, exercised nowhere else in the registry); edge "
    "bars with truncated neighborhoods are excluded by the frame "
    "count. Pure comparisons on data values — no rounding, "
    "bit-identical anywhere. One (ticker, day) shuffle+sort.",
)
def q_swing_points(spark, sf_dir):
    d = _daily_bars(spark, sf_dir)
    w2 = (
        Window.partitionBy("ticker").orderBy("day").rowsBetween(-2, 2)
    )
    ctx = d.select(
        "ticker",
        "day",
        "high",
        "low",
        F.max("high").over(w2).alias("hmax"),
        F.min("low").over(w2).alias("lmin"),
        F.count(F.lit(1)).over(w2).alias("cnt"),
    )
    return (
        ctx.where(
            (F.col("cnt") == 5)
            & ((F.col("high") == F.col("hmax")) | (F.col("low") == F.col("lmin")))
        )
        .select(
            "ticker",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (F.col("high") == F.col("hmax")).cast("int").alias("swing_high"),
            (F.col("low") == F.col("lmin")).cast("int").alias("swing_low"),
            "high",
            "low",
        )
        .orderBy("ticker", "day")
    )


@register(
    "q_overnight_gaps",
    _DAILYOHLC_CTE
    + """
    , g AS (
        SELECT ticker, day, open, high, low,
               lag(close) OVER w AS pc
        FROM dailyohlc
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), m AS (
        SELECT ticker,
               CASE WHEN open > pc THEN 1 ELSE 0 END AS up,
               CASE WHEN open < pc THEN 1 ELSE 0 END AS down,
               CASE WHEN low <= pc AND pc <= high THEN 1 ELSE 0 END
                   AS filled,
               CAST(CASE WHEN pc <> 0
                         THEN floor((open / pc - 1.0) * 100.0
                                    * 1000000000 + 0.5) / 1000000000
                    END AS DECIMAL(28,9)) AS gap_pct
        FROM g WHERE pc IS NOT NULL
    )
    SELECT ticker,
           count(*) AS n_days,
           CAST(sum(up) AS BIGINT) AS n_gap_up,
           CAST(sum(down) AS BIGINT) AS n_gap_down,
           CAST(sum(filled) AS BIGINT) AS n_filled,
           floor(CAST(sum(gap_pct) AS DOUBLE) / count(*) * 1000000 + 0.5)
               / 1000000 AS mean_gap_pct
    FROM m GROUP BY ticker ORDER BY ticker
    """,
    doc="Overnight gap analytics per ticker: count of up/down opening "
    "gaps vs the prior close, how many gaps the SAME session filled "
    "(prior close re-touched inside the day's low..high range — the "
    "'gaps get filled' trading claim, testable), and the mean gap "
    "percent. Gap percents are stable_rounded to 9dp and DECIMAL-"
    "quantized before the per-ticker mean so accumulation order can't "
    "flip the hash; the fill test is pure comparisons on data values. "
    "One lag window + one hash aggregate.",
)
def q_overnight_gaps(spark, sf_dir):
    d = _daily_ohlc(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy("day")
    g = d.withColumn("pc", F.lag("close").over(w)).where(
        F.col("pc").isNotNull()
    )
    gap_pct = F.when(
        F.col("pc") != 0,
        stable_round((F.col("open") / F.col("pc") - 1.0) * 100.0, 9),
    ).cast("decimal(28,9)")
    m = g.select(
        "ticker",
        (F.col("open") > F.col("pc")).cast("int").alias("up"),
        (F.col("open") < F.col("pc")).cast("int").alias("down"),
        ((F.col("low") <= F.col("pc")) & (F.col("pc") <= F.col("high")))
        .cast("int")
        .alias("filled"),
        gap_pct.alias("gap_pct"),
    )
    return (
        m.groupBy("ticker")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("up").cast("long").alias("n_gap_up"),
            F.sum("down").cast("long").alias("n_gap_down"),
            F.sum("filled").cast("long").alias("n_filled"),
            stable_round(
                F.sum("gap_pct").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_gap_pct"),
        )
        .orderBy("ticker")
    )


@register(
    "q_ljung_box",
    _DAILYBARS_CTE
    + """
    , r AS (
        SELECT ticker, day,
               CASE WHEN close > 0 AND lag(close) OVER w > 0
                    THEN """
    + quantize_sql("ln(close / lag(close) OVER w)")
    + """ END AS r
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), lagged AS (
        SELECT ticker, r,
               lag(r, 1) OVER w AS r1, lag(r, 2) OVER w AS r2,
               lag(r, 3) OVER w AS r3, lag(r, 4) OVER w AS r4,
               lag(r, 5) OVER w AS r5
        FROM r
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), m AS (
        SELECT ticker, count(r) AS n,
               """
    + ",\n".join(
        corr_moments_sql("r", f"r{k}", f"l{k}") for k in (1, 2, 3, 4, 5)
    )
    + f"""
        FROM lagged GROUP BY ticker
    ), acf AS (
        SELECT ticker, n,
               {stable_round_sql(corr_value_sql('l1'), 6)} AS p1,
               {stable_round_sql(corr_value_sql('l2'), 6)} AS p2,
               {stable_round_sql(corr_value_sql('l3'), 6)} AS p3,
               {stable_round_sql(corr_value_sql('l4'), 6)} AS p4,
               {stable_round_sql(corr_value_sql('l5'), 6)} AS p5
        FROM m
    )
    SELECT ticker, CAST(n AS BIGINT) AS n_returns,
           floor(n * (n + 2.0)
                 * (p1 * p1 / (n - 1) + p2 * p2 / (n - 2)
                    + p3 * p3 / (n - 3) + p4 * p4 / (n - 4)
                    + p5 * p5 / (n - 5))
                 * 10000 + 0.5) / 10000 AS q_stat,
           CAST(n * (n + 2.0)
                * (p1 * p1 / (n - 1) + p2 * p2 / (n - 2)
                   + p3 * p3 / (n - 3) + p4 * p4 / (n - 4)
                   + p5 * p5 / (n - 5)) > 11.0705 AS INT) AS reject_5pct
    FROM acf WHERE n > 5 ORDER BY ticker
    """,
    doc="Ljung–Box portmanteau test per ticker: Q = n(n+2)·Σ ρ̂ₖ²/(n−k) "
    "over return autocorrelations at lags 1–5, with the χ²(5) 5%% "
    "rejection flag (11.0705) — 'is this series white noise?', the "
    "model-adequacy gate run before fitting anything. ACFs reuse the "
    "q_autocorr lowering (one window pass materializes all five lag "
    "columns, ONE hash aggregate computes five corr()s) and are pinned "
    "at 6dp before entering Q, so the statistic is a fixed-order "
    "expression on engine-agreed inputs.",
)
def q_ljung_box(spark, sf_dir):
    from ..operators.volatility import return_autocorr

    lags = (1, 2, 3, 4, 5)
    out = return_autocorr(_daily_bars(spark, sf_dir), lags=lags)
    n = F.col("n_returns")
    ps = [stable_round(F.col(f"acf_{k}"), 6) for k in lags]
    q = (
        n
        * (n + F.lit(2.0))
        * sum(p * p / (n - k) for k, p in zip(lags, ps))
    )
    return (
        out.where(n > 5)
        .select(
            "ticker",
            n.cast("long").alias("n_returns"),
            stable_round(q, 4).alias("q_stat"),
            (q > 11.0705).cast("int").alias("reject_5pct"),
        )
        .orderBy("ticker")
    )


@register(
    "q_seasonality_strength",
    _DAILYBARS_CTE
    + """
    , t AS (
        SELECT ticker, day, close,
               CAST((day - DATE '1970-01-01') % 7 AS INT) AS phase,
               CASE WHEN count(close) OVER c = 7
                    THEN CAST(sum(CAST(close AS DECIMAL(18,4))) OVER c
                              AS DOUBLE) / 7.0 END AS trend
        FROM dailybars
        WINDOW c AS (PARTITION BY ticker ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), s AS (
        SELECT ticker, day, close, trend,
               floor(avg(close - trend)
                         OVER (PARTITION BY ticker, phase)
                     * 1000000 + 0.5) / 1000000 AS seasonal
        FROM t
    ), comp AS (
        SELECT ticker,
               CAST(floor((close - trend - seasonal) * 1000000 + 0.5)
                    / 1000000 AS DECIMAL(28,6)) AS r,
               CAST(floor((close - trend) * 1000000 + 0.5) / 1000000
                    AS DECIMAL(28,6)) AS sr,
               CAST(floor((close - seasonal) * 1000000 + 0.5) / 1000000
                    AS DECIMAL(28,6)) AS tr,
               -- 6-digit square grid: squared deviations scale with
               -- price^2, so the 12-digit grid crosses the 2^53
               -- exactness bound (and at 2^63 Spark's LONG floor
               -- saturates) once |dev| > ~3e3 — found by the x100
               -- magnitude-stress differential; 1e-6 holds to |dev|
               -- ~ 9.5e4 and the strengths round at 6dp anyway
               CAST(floor((close - trend - seasonal)
                          * (close - trend - seasonal)
                          * 1000000 + 0.5) / 1000000
                    AS DECIMAL(38,6)) AS r2,
               CAST(floor((close - trend) * (close - trend)
                          * 1000000 + 0.5) / 1000000
                    AS DECIMAL(38,6)) AS sr2,
               CAST(floor((close - seasonal) * (close - seasonal)
                          * 1000000 + 0.5) / 1000000
                    AS DECIMAL(38,6)) AS tr2
        FROM s WHERE trend IS NOT NULL
    ), m AS (
        SELECT ticker, count(*) AS n,
               CAST(sum(r)  AS DOUBLE) AS s_r,  CAST(sum(r2)  AS DOUBLE) AS s_r2,
               CAST(sum(sr) AS DOUBLE) AS s_sr, CAST(sum(sr2) AS DOUBLE) AS s_sr2,
               CAST(sum(tr) AS DOUBLE) AS s_tr, CAST(sum(tr2) AS DOUBLE) AS s_tr2
        FROM comp GROUP BY ticker
    )
    SELECT ticker, CAST(n AS BIGINT) AS n_obs,
           CASE WHEN (s_sr2 - s_sr * s_sr / n) > 0
                THEN floor(greatest(0.0,
                        1.0 - (s_r2 - s_r * s_r / n)
                              / (s_sr2 - s_sr * s_sr / n))
                     * 1000000 + 0.5) / 1000000 END AS seasonal_strength,
           CASE WHEN (s_tr2 - s_tr * s_tr / n) > 0
                THEN floor(greatest(0.0,
                        1.0 - (s_r2 - s_r * s_r / n)
                              / (s_tr2 - s_tr * s_tr / n))
                     * 1000000 + 0.5) / 1000000 END AS trend_strength
    FROM m WHERE n > 1 ORDER BY ticker
    """,
    doc="Seasonality and trend strength per ticker (Hyndman's tsfeatures "
    "definitions): F_s = max(0, 1 − Var(R)/Var(S+R)) and F_t = max(0, "
    "1 − Var(R)/Var(T+R)) on the SAME decomposition as "
    "q_seasonal_decompose — the scalar the monitoring layer thresholds "
    "to decide if a series deserves seasonal modeling at all. The raw "
    "variance RATIOS would compound float noise, so every component "
    "(R, S+R, T+R and their squares) is stable_rounded then DECIMAL-"
    "quantized before the moment sums; the strengths are one "
    "fixed-order expression per ticker on exact sums. Adds ONE hash "
    "aggregate on top of the decompose plan's two shuffles.",
)
def q_seasonality_strength(spark, sf_dir):
    from ..operators.timeseries import seasonal_decompose

    out = seasonal_decompose(_daily_bars(spark, sf_dir), period=7)
    seasonal6 = stable_round(F.col("seasonal"), 6)
    r = stable_round(F.col("close") - F.col("trend") - seasonal6, 6)
    sr = stable_round(F.col("close") - F.col("trend"), 6)
    tr = stable_round(F.col("close") - seasonal6, 6)

    def sq(x):
        # 6-digit square grid — price^2-scaled values cross the 12-digit
        # grid's 2^53 exactness bound past |dev| ~ 3e3 (magnitude-stress
        # finding); see the oracle comment
        return stable_round(x * x, 6).cast("decimal(38,6)")

    comp = out.where(F.col("trend").isNotNull()).select(
        "ticker",
        r.cast("decimal(28,6)").alias("r"),
        sr.cast("decimal(28,6)").alias("sr"),
        tr.cast("decimal(28,6)").alias("tr"),
        sq(F.col("close") - F.col("trend") - seasonal6).alias("r2"),
        sq(F.col("close") - F.col("trend")).alias("sr2"),
        sq(F.col("close") - seasonal6).alias("tr2"),
    )
    m = comp.groupBy("ticker").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(c).cast("double").alias(f"s_{c}")
            for c in ("r", "r2", "sr", "sr2", "tr", "tr2")
        ],
    )
    n = F.col("n")

    def var(s, s2):
        return F.col(s2) - F.col(s) * F.col(s) / n

    v_r = var("s_r", "s_r2")
    v_sr = var("s_sr", "s_sr2")
    v_tr = var("s_tr", "s_tr2")
    return (
        m.where(n > 1)
        .select(
            "ticker",
            n.cast("long").alias("n_obs"),
            F.when(
                v_sr > 0,
                stable_round(F.greatest(F.lit(0.0), 1.0 - v_r / v_sr), 6),
            ).alias("seasonal_strength"),
            F.when(
                v_tr > 0,
                stable_round(F.greatest(F.lit(0.0), 1.0 - v_r / v_tr), 6),
            ).alias("trend_strength"),
        )
        .orderBy("ticker")
    )


@register(
    "q_higher_moments",
    _DAILYBARS_CTE
    + """
    , r AS (
        SELECT ticker,
               CAST(CASE WHEN close > 0 AND lag(close) OVER w > 0
                    THEN floor(ln(close / lag(close) OVER w)
                               * 1000000000000 + 0.5) / 1000000000000
                    END AS DECIMAL(28,12)) AS r
        FROM dailybars
        WINDOW w AS (PARTITION BY ticker ORDER BY day)
    ), m AS (
        SELECT ticker, count(r) AS n,
               CAST(sum(r) AS DOUBLE) AS s1,
               CAST(sum(CAST(floor(CAST(r AS DOUBLE) * CAST(r AS DOUBLE)
                                   * 1000000000000 + 0.5) / 1000000000000
                             AS DECIMAL(38,12))) AS DOUBLE) AS s2,
               CAST(sum(CAST(floor(CAST(r AS DOUBLE) * CAST(r AS DOUBLE)
                                   * CAST(r AS DOUBLE)
                                   * 1000000000000 + 0.5) / 1000000000000
                             AS DECIMAL(38,12))) AS DOUBLE) AS s3,
               CAST(sum(CAST(floor(CAST(r AS DOUBLE) * CAST(r AS DOUBLE)
                                   * CAST(r AS DOUBLE) * CAST(r AS DOUBLE)
                                   * 1000000000000 + 0.5) / 1000000000000
                             AS DECIMAL(38,12))) AS DOUBLE) AS s4
        FROM r WHERE r IS NOT NULL GROUP BY ticker
    ), c AS (
        SELECT ticker, n,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3 / n - 3.0 * (s1 / n) * (s2 / n)
                    + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
               s4 / n - 4.0 * (s1 / n) * (s3 / n)
                    + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM m WHERE n > 3
    )
    SELECT ticker, CAST(n AS BIGINT) AS n_returns,
           floor(m3 / (m2 * sqrt(m2)) * 1000000 + 0.5) / 1000000 AS skewness,
           floor((m4 / (m2 * m2) - 3.0) * 1000000 + 0.5) / 1000000
               AS excess_kurtosis,
           floor(n / 6.0 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                            + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                              / 4.0)
                 * 10000 + 0.5) / 10000 AS jarque_bera,
           CAST(n / 6.0 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                           + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                             / 4.0) > 5.9915 AS INT) AS reject_normal_5pct
    FROM c WHERE m2 > 0 ORDER BY ticker
    """,
    doc="Higher-moment return statistics per ticker: population "
    "skewness, excess kurtosis, and the Jarque–Bera normality test "
    "with the χ²(2) 5%% rejection flag (5.9915) — fat tails and "
    "asymmetry are what the Gaussian risk models (q_sharpe, "
    "q_var_cvar's parametric cousins) silently assume away. Log "
    "returns and every power term r², r³, r⁴ are stable_rounded to "
    "12dp and DECIMAL-quantized before the moment sums (the cast-"
    "divergence discipline), so all four sums are exact and the "
    "central-moment algebra is one fixed-order expression per ticker. "
    "One window lag + ONE hash aggregate.",
)
def q_higher_moments(spark, sf_dir):
    d = _daily_bars(spark, sf_dir)
    w = Window.partitionBy("ticker").orderBy("day")
    prev = F.lag("close").over(w)
    r = F.when(
        (F.col("close") > 0) & (prev > 0),
        stable_round(F.log(F.col("close") / prev), 12),
    ).cast("decimal(28,12)")
    rd = d.select("ticker", r.alias("r")).where(F.col("r").isNotNull())
    x = F.col("r").cast("double")

    def p(e):
        return F.sum(stable_round(e, 12).cast("decimal(38,12)")).cast("double")

    m = rd.groupBy("ticker").agg(
        F.count("r").alias("n"),
        F.sum("r").cast("double").alias("s1"),
        p(x * x).alias("s2"),
        p(x * x * x).alias("s3"),
        p(x * x * x * x).alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3.0 * mu * (F.col("s2") / n) + 2.0 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4.0 * mu * (F.col("s3") / n)
        + 6.0 * mu * mu * (F.col("s2") / n)
        - 3.0 * mu * mu * mu * mu
    )
    skew = m3 / (m2 * F.sqrt(m2))
    exk = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    return (
        m.where((n > 3))
        .withColumn("__m2", m2)
        .where(F.col("__m2") > 0)
        .select(
            "ticker",
            n.cast("long").alias("n_returns"),
            stable_round(skew, 6).alias("skewness"),
            stable_round(exk, 6).alias("excess_kurtosis"),
            stable_round(jb, 4).alias("jarque_bera"),
            (jb > 5.9915).cast("int").alias("reject_normal_5pct"),
        )
        .orderBy("ticker")
    )
