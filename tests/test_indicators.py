"""Technical indicators: row-level semantics on handcrafted series (the
q_bollinger / q_rsi oracle differentials cover the corpus; these pin the
edge conventions)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.indicators import (
    with_bollinger,
    with_rsi,
)


def _bars(spark, prices, ticker="A"):
    rows = [
        (ticker, f"2024-01-01 10:{i:02d}:00", float(p), i)
        for i, p in enumerate(prices)
    ]
    return spark.createDataFrame(
        rows, "ticker string, ts string, price double, seq long"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_bollinger_matches_sample_stats(spark):
    prices = [10.0, 12.0, 11.0, 13.0, 14.0]
    out = {r["seq"]: r for r in with_bollinger(_bars(spark, prices), n=3, k=2.0).collect()}
    # first row: single observation — mid defined, bands null
    assert out[0]["bb_mid"] == 10.0
    assert out[0]["bb_upper"] is None and out[0]["bb_lower"] is None
    # seq 3: window = [12, 11, 13]
    mean = 12.0
    std = math.sqrt(((12 - mean) ** 2 + (11 - mean) ** 2 + (13 - mean) ** 2) / 2)
    assert abs(out[3]["bb_mid"] - mean) < 1e-9
    assert abs(out[3]["bb_upper"] - (mean + 2 * std)) < 1e-9
    assert abs(out[3]["bb_lower"] - (mean - 2 * std)) < 1e-9


def test_bollinger_constant_series_zero_width(spark):
    out = with_bollinger(_bars(spark, [5.0] * 4), n=3).collect()
    last = max(out, key=lambda r: r["seq"])
    assert last["bb_upper"] == last["bb_mid"] == last["bb_lower"] == 5.0


def test_rsi_edge_conventions(spark):
    # strictly rising: all gains -> 100; strictly falling: all losses -> 0
    up = with_rsi(_bars(spark, [1.0, 2.0, 3.0, 4.0]), n=3).collect()
    down = with_rsi(_bars(spark, [4.0, 3.0, 2.0, 1.0]), n=3).collect()
    flat = with_rsi(_bars(spark, [2.0, 2.0, 2.0, 2.0]), n=3).collect()
    by_seq = lambda rows: {r["seq"]: r["rsi"] for r in rows}
    # null until n deltas exist (seq 0..2 have 0..2 deltas)
    assert by_seq(up)[2] is None
    assert by_seq(up)[3] == 100.0
    assert by_seq(down)[3] == 0.0
    assert by_seq(flat)[3] == 50.0


def test_rsi_mixed_window_value(spark):
    # deltas: +3, -1, +2 over n=3 -> gains 5, losses 1 -> rsi = 100-100/(1+5)
    out = {r["seq"]: r["rsi"] for r in with_rsi(_bars(spark, [1.0, 4.0, 3.0, 5.0]), n=3).collect()}
    assert abs(out[3] - (100.0 - 100.0 / 6.0)) < 1e-9
