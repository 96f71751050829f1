"""Market-analytics queries, risk/microstructure/statistics tier —
risk reports, VaR/CVaR, event studies, seasonal decomposition, Hurst,
Spearman, Ljung-Box, Roll spread, Kyle lambda, portfolio growth, and
the other heavy statistical contracts over the shared bar frames.
Split from plans/market.py in round 11 (mechanical, zero behavior
change); siblings: market_series, market_bars.
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

from .market_series import _BARS_CTE, _bars  # noqa: F401
from .market_bars import (  # noqa: F401
    _DAILYBARS_CTE,
    _DAILYOHLC_CTE,
    _DAILYVOL_CTE,
    _ORDKEY,
    _VBARS_CTE,
    _daily_bars,
    _daily_dollar_bars,
    _daily_ohlc,
    _daily_vol_bars,
    _vbars,
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
