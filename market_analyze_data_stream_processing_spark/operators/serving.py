"""Serving/read layer (SURVEY.md §3.4: the dashboard's data paths —
sidebar market watch, chart frames) as batch reads over the engine's
output tables. The Streamlit shell itself stays out of the engine; these
functions produce exactly the frames it renders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import humanize_number, pct_change, relative_time
from .analytics import latest_per_key, with_moving_averages


def market_watch(docs: DataFrame, now: float) -> DataFrame:
    """main.py:156-217 (S7 + A7 + F3/F4): latest intraday_metrics row per
    ticker → live price, delta %% vs last close, humanized volume-ish
    metric, relative-time freshness."""
    metrics = docs.where(F.col("type") == "intraday_metrics")
    latest = latest_per_key(metrics, key="ticker", order=["timestamp", "id"])
    delta = pct_change(F.col("current_price"), F.col("last_close"))
    return latest.select(
        "ticker",
        F.round("current_price", 2).alias("price"),
        F.round(delta, 2).alias("delta_pct"),
        F.col("currency"),
        F.col("market_state"),
        humanize_number(F.col("current_price") * 1e6).alias("notional_h"),
        relative_time(F.col("timestamp"), F.lit(float(now))).alias("freshness"),
    )


def chart_frame(prices: DataFrame, ticker: str) -> DataFrame:
    """main.py:87-153 (S5 + A3/A4): per-ticker OHLC rows + MA overlays,
    MA50/MA200 emitted only once their windows fill (the reference's
    len(df)>n gates). Partition-pruned read when prices is stored
    partitioned by ticker."""
    bars = prices.where(F.col("ticker") == ticker)
    out = with_moving_averages(
        bars, value_col="Close", key="ticker", order="date", windows=(10,)
    )
    gated = with_moving_averages(
        out, value_col="Close", key="ticker", order="date",
        windows=(50, 200), min_fill=True,
    )
    return gated.select(
        "ticker", "date", "Open", "High", "Low", "Close", "Volume",
        F.round("ma10", 4).alias("ma10"),
        F.when(F.col("ma50") != 0.0, F.round("ma50", 4)).alias("ma50"),
        F.when(F.col("ma200") != 0.0, F.round("ma200", 4)).alias("ma200"),
    ).orderBy("date")
