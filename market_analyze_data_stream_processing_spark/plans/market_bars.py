"""Market-analytics queries, volume/daily-bar indicator tier — the
round-8 indicator family (OBV, ATR, VWAP, Donchian, Aroon, CCI,
Ichimoku, Keltner, TWAP, pivots, volatility estimators, ...) plus the
shared vbars/dailybars/daily-OHLC frame builders their oracles mirror.
Split from plans/market.py in round 11 (mechanical, zero behavior
change); siblings: market_series, market_stats.
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

from .market_series import _BARS_CTE, _bars  # noqa: F401

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


@plan_memo
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


@plan_memo
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


@plan_memo
def _daily_ohlc(spark, sf_dir):
    """Daily O/H/L/C bars per ticker (resample_ohlc at day grain)."""
    from ..operators.timeseries import resample_ohlc

    return (
        resample_ohlc(_bars(spark, sf_dir), unit="day")
        .withColumnRenamed("period", "day")
        .select("ticker", "day", "open", "high", "low", "close")
    )


@plan_memo
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


@plan_memo
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
    from ..operators.stats import (
        corr_from_moments_named,
        corr_moment_aggs_named,
        quantize,
    )

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
            *corr_moment_aggs_named("ra", "rb", "c"),
            *corr_moment_aggs_named("ra", "rb_prev", "ba"),
            *corr_moment_aggs_named("rb", "ra_prev", "ab"),
        )
    )
    return m.select(
        "ticker_a",
        "ticker_b",
        stable_round(corr_from_moments_named("c"), 6).alias("contemp"),
        stable_round(corr_from_moments_named("ba"), 6).alias("b_leads_a"),
        stable_round(corr_from_moments_named("ab"), 6).alias("a_leads_b"),
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

