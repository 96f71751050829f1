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


def test_macd_block_boundaries_are_invisible(spark):
    """Halo-block invariance: a tiny block size (many boundary
    crossings) must produce bit-identical macd/signal/histogram to the
    single-block run — the property that makes a hot key splittable."""
    from market_analyze_data_stream_processing_spark.operators.indicators import (
        macd_blocked,
    )

    import datetime as _dt

    prices = [100.0 + ((i * 37) % 19) * 0.25 - ((i * 11) % 7) for i in range(500)]
    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        ("A", str(t0 + _dt.timedelta(minutes=i)), float(p), i)
        for i, p in enumerate(prices)
    ]
    bars = spark.createDataFrame(
        rows, "ticker string, ts string, price double, seq long"
    ).withColumn("ts", F.to_timestamp("ts"))

    def run(block):
        return {
            r["seq"]: (r["macd"], r["signal"], r["histogram"])
            for r in macd_blocked(bars, block_size=block).collect()
        }

    one_block = run(4096)
    many_blocks = run(192)  # halo=160 -> every block crosses boundaries
    assert len(one_block) == 500
    assert many_blocks == one_block


def test_macd_matches_truncated_reference(spark):
    """Direct numpy reference of the truncated adjusted EWM composition
    on a short series (single block, no halo in play)."""
    import numpy as np

    from market_analyze_data_stream_processing_spark.operators.indicators import (
        MACD_K_FAST,
        MACD_K_SIG,
        MACD_K_SLOW,
        ewm_weights,
        left_prefix,
        macd_blocked,
    )

    prices = [10.0, 11.0, 9.5, 12.0, 13.0, 12.5, 14.0, 13.5]
    got = {
        r["seq"]: r for r in macd_blocked(_bars(spark, prices)).collect()
    }

    def ewm(series, alpha, k):
        w = ewm_weights(alpha, k)
        pre = left_prefix(w)
        out = []
        for i in range(len(series)):
            num = 0.0
            for j in range(min(i + 1, k)):
                num = num + series[i - j] * w[j]
            out.append(num / pre[min(i, k - 1)])
        return out

    ema_f = ewm(prices, 2.0 / 13.0, MACD_K_FAST)
    ema_s = ewm(prices, 2.0 / 27.0, MACD_K_SLOW)
    macd = [a - b for a, b in zip(ema_f, ema_s)]
    signal = ewm(macd, 2.0 / 10.0, MACD_K_SIG)
    for i in range(len(prices)):
        assert abs(got[i]["macd"] - macd[i]) < 1e-12
        assert abs(got[i]["signal"] - signal[i]) < 1e-12
        assert abs(got[i]["histogram"] - (macd[i] - signal[i])) < 1e-12


def test_zero_price_series_is_total_under_ansi(spark, tmp_path):
    """Zero closes are reachable data (sf0.1 contains value=0.0 rows):
    q_drawdown and q_beta_daily must yield NULLs, not an ANSI
    DIVIDE_BY_ZERO, when a series opens at 0 / a previous close is 0 /
    a ticker has a single return (zero variance denominator)."""
    from market_analyze_data_stream_processing_spark.plans import QUERIES

    rows = [
        # ticker Z opens at 0.0 -> drawdown null on row 1; day-2 return
        # divides by the 0.0 close -> return null
        (1, "2024-01-01 10:00:00", 7, "Z", 0.0, ""),
        (2, "2024-01-02 10:00:00", 7, "Z", 5.0, ""),
        # ticker Y has exactly two days -> one return -> zero variance
        (3, "2024-01-01 11:00:00", 8, "Y", 10.0, ""),
        (4, "2024-01-02 11:00:00", 8, "Y", 11.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    dd = {r["ticker"]: r for r in QUERIES["q_drawdown"].fn(spark, sf_dir).collect()}
    # Z: row-1 drawdown null (peak 0), row-2 defined (5/5 - 1 = 0)
    assert dd["Z"]["max_drawdown"] == 0.0 and dd["Z"]["final_drawdown"] == 0.0
    assert dd["Z"]["n_bars"] == 2

    beta = {r["ticker"]: r for r in QUERIES["q_beta_daily"].fn(spark, sf_dir).collect()}
    # Z's only return divides by a 0.0 close -> dropped entirely
    assert "Z" not in beta
    # Y's single return makes the variance denominator exactly 0 -> null
    assert beta["Y"]["n_days"] == 1 and beta["Y"]["beta"] is None
