"""Producer-parity message synthesis + serving layer (SURVEY §3.1/§3.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.messages import (
    daily_summary_messages,
    intraday_metrics_messages,
    technical_messages,
    to_kafka_frame,
)
from market_analyze_data_stream_processing_spark.operators.retrieval import (
    with_summary_extraction,
)
from market_analyze_data_stream_processing_spark.operators.serving import (
    chart_frame,
    market_watch,
)

NOW = 1700000000


@pytest.fixture(scope="module")
def daily_bars(spark):
    rows = []
    for i in range(1, 12):
        rows.append(("MC.PA", f"2024-01-{i:02d}", 100.0 + i, 110.0 + i, 95.0 + i,
                     105.0 + i, 1000 * i))
    rows.append(("SOLO", "2024-01-01", 1.0, 1.0, 1.0, 1.0, 1))  # <2 bars: guarded
    return spark.createDataFrame(
        rows, ["ticker", "date", "Open", "High", "Low", "Close", "Volume"]
    )


def test_daily_summary_text_and_count_guard(daily_bars):
    out = daily_summary_messages(daily_bars, publish_time=F.lit(NOW)).collect()
    assert [r["ticker"] for r in out] == ["MC.PA"]  # SOLO guarded out (A9)
    text = out[0]["summary"]
    assert "Daily Summary for MC.PA:" in text
    assert "- Open: 111.00" in text and "- Close: 116.00" in text
    assert "- Volume: 11000" in text
    # variation vs yesterday's close: (116-115)/115*100 = 0.87
    assert "- Variation: 0.87%" in text


def test_daily_summary_roundtrips_regex_extraction(spark, daily_bars):
    msg = daily_summary_messages(daily_bars, publish_time=F.lit(NOW))
    docs_shaped = msg.select(
        F.col("ticker"), F.col("type"), F.col("content").alias("document")
    )
    got = with_summary_extraction(docs_shaped).collect()[0]
    # F8 extraction recovers the rendered numbers exactly
    assert got["opening_price"] == 111.0 and got["closing_price"] == 116.0
    assert got["low_price"] == 106.0 and got["high_price"] == 121.0
    assert got["volume"] == 11000
    assert got["variation_pct"] == pytest.approx(0.87)


def test_technical_message_trend_and_ma_gates(daily_bars):
    import math

    out = {r["ticker"]: r for r in technical_messages(
        daily_bars.where("ticker = 'MC.PA'"), publish_time=F.lit(NOW)).collect()}
    m = out["MC.PA"]
    assert m["id"] == "LATEST_TECH_MC.PA"
    assert m["mean_10"] > 0  # 11 bars: MA10 filled
    assert m["mean_200"] == 0.0  # unfilled → 0.0 parity (producer.py:325-327)
    # mean_50 is NOT coerced in the reference: rolling(50).mean() on 11
    # bars is NaN, trend NEUTRAL (NaN comparisons false), text 'nan'
    assert math.isnan(m["mean_50"])
    assert "(NEUTRAL)" in m["title"]
    assert "Medium Term Trend (MA50): NEUTRAL" in m["summary"]
    assert "MA 50d: nan. " in m["summary"]


def test_technical_message_filled_ma50_trend(spark):
    rows = [("LONG", f"2024-{1 + i // 28:02d}-{1 + i % 28:02d}", 100.0 + i)
            for i in range(60)]  # 60 ascending closes: MA50 filled, price > MA
    bars = spark.createDataFrame(rows, ["ticker", "date", "Close"])
    m = technical_messages(bars, publish_time=F.lit(NOW)).collect()[0]
    assert m["mean_50"] == pytest.approx(sum(110.0 + i for i in range(50)) / 50)
    assert "(BULLISH)" in m["title"]
    assert "Medium Term Trend (MA50): BULLISH" in m["summary"]


def test_intraday_metrics_lags_and_emoji_text(spark):
    rows = [("MC.PA", i, 100.0 + i) for i in range(1, 9)]  # 8 five-min bars
    bars = spark.createDataFrame(rows, ["ticker", "bar_ts", "Close"])
    out = intraday_metrics_messages(bars, publish_time=F.lit(NOW)).collect()[0]
    assert out["id"] == "LATEST_METRICS_MC.PA"
    assert out["price_10min_ago"] == 106.0  # lag 2 of 108
    assert out["price_30min_ago"] == 102.0  # lag 6
    assert out["price_1h_ago"] == 0.0  # insufficient history → 0.0
    assert "Momentum Analysis MC.PA (Price: 108.00):" in out["summary"]
    assert "- 10min:  \U0001f7e9 1.89%" in out["summary"]  # (108-106)/106
    assert "1h" not in out["summary"].split("Momentum")[1].split("30min")[0] or True
    # lines for unavailable lags are absent
    assert "- 1h:" not in out["summary"]


def test_to_kafka_frame_shape(spark, daily_bars):
    msg = daily_summary_messages(daily_bars, publish_time=F.lit(NOW))
    kf = to_kafka_frame(msg, topic="daily-summary")
    assert kf.columns == ["key", "value", "topic"]
    row = kf.collect()[0]
    import json

    payload = json.loads(row["value"])
    assert row["key"] == "MC.PA" and row["topic"] == "daily-summary"
    assert payload["type"] == "daily_summary" and "Daily Summary" in payload["title"]


def test_market_watch_frame(spark):
    docs = spark.createDataFrame(
        [
            ("LATEST_METRICS_MC.PA", "MC.PA", "intraday_metrics", 700.0, 690.0,
             float(NOW - 120), "EUR", "REGULAR"),
            ("old", "MC.PA", "intraday_metrics", 600.0, 500.0,
             float(NOW - 9000), "EUR", "REGULAR"),
            ("LATEST_METRICS_AIR.PA", "AIR.PA", "intraday_metrics", 130.0, 0.0,
             float(NOW - 30), "EUR", "CLOSED"),
            ("news1", "MC.PA", "news", 0.0, 0.0, float(NOW), "EUR", "REGULAR"),
        ],
        "id string, ticker string, type string, current_price double, "
        "last_close double, timestamp double, currency string, market_state string",
    )
    out = {r["ticker"]: r for r in market_watch(docs, NOW).collect()}
    assert set(out) == {"MC.PA", "AIR.PA"}
    assert out["MC.PA"]["price"] == 700.0  # latest row won
    assert out["MC.PA"]["delta_pct"] == pytest.approx(1.45)
    assert out["AIR.PA"]["delta_pct"] == 0.0  # zero last_close guard
    assert out["MC.PA"]["freshness"] == "2m ago"


def test_chart_frame_ma_gating(daily_bars):
    out = chart_frame(daily_bars, "MC.PA").collect()
    assert len(out) == 11
    last = out[-1]
    assert last["ma10"] is not None
    assert last["ma50"] is None and last["ma200"] is None  # windows unfilled
