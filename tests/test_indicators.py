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


def test_obv_signed_accumulation(spark):
    rows = [
        # (ticker, ts, price, seq, vol)
        ("A", "2024-01-01 10:00:00", 10.0, 0, 5),
        ("A", "2024-01-01 10:01:00", 12.0, 1, 3),  # up   -> +3
        ("A", "2024-01-01 10:02:00", 12.0, 2, 7),  # flat -> +0
        ("A", "2024-01-01 10:03:00", 11.0, 3, 4),  # down -> -4
        ("A", "2024-01-01 10:04:00", 13.0, 4, 2),  # up   -> +2
    ]
    from market_analyze_data_stream_processing_spark.operators.indicators import (
        with_obv,
    )

    df = spark.createDataFrame(
        rows, "ticker string, ts string, price double, seq long, vol long"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["seq"]: r["obv"] for r in with_obv(df).collect()}
    assert got == {0: 0, 1: 3, 2: 3, 3: -1, 4: 1}


def test_true_range_and_atr(spark):
    rows = [
        ("A", "2024-01-01", 12.0, 9.0, 10.0),
        ("A", "2024-01-02", 11.0, 10.5, 11.0),  # TR = max(0.5, 1.0, 0.5) = 1.0
        ("A", "2024-01-03", 15.0, 14.0, 14.5),  # TR = max(1.0, 4.0, 3.0) = 4.0
    ]
    from market_analyze_data_stream_processing_spark.operators.indicators import (
        with_atr,
    )

    df = spark.createDataFrame(
        rows, "ticker string, day string, high double, low double, close double"
    ).withColumn("day", F.to_date("day"))
    out = {r["day"].isoformat(): r for r in with_atr(df, n=2).collect()}
    assert out["2024-01-01"]["tr"] == 3.0  # first bar: H - L
    assert out["2024-01-02"]["tr"] == 1.0
    assert out["2024-01-03"]["tr"] == 4.0
    assert out["2024-01-01"]["atr"] is None  # window not full
    assert abs(out["2024-01-02"]["atr"] - 2.0) < 1e-9  # (3+1)/2
    assert abs(out["2024-01-03"]["atr"] - 2.5) < 1e-9  # (1+4)/2


def test_vwap_resets_per_session(spark):
    rows = [
        ("A", "2024-01-01 10:00:00", 10.0, 0, 2),
        ("A", "2024-01-01 11:00:00", 20.0, 1, 2),  # vwap = (20+40)/4 = 15
        ("A", "2024-01-02 10:00:00", 30.0, 2, 1),  # new session: vwap = 30
    ]
    from market_analyze_data_stream_processing_spark.operators.indicators import (
        with_vwap_anchored,
    )

    df = spark.createDataFrame(
        rows, "ticker string, ts string, price double, seq long, vol long"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["seq"]: r["vwap"] for r in with_vwap_anchored(df).collect()}
    assert got[0] == 10.0 and got[1] == 15.0 and got[2] == 30.0


def test_donchian_breakout_uses_previous_channel(spark):
    from market_analyze_data_stream_processing_spark.operators.indicators import (
        with_donchian,
    )

    prices = [10.0, 12.0, 11.0, 13.0, 9.0]
    out = {r["seq"]: r for r in with_donchian(_bars(spark, prices), n=3).collect()}
    # channel null until 3 rows
    assert out[1]["dc_upper"] is None and out[1]["breakout_up"] is None
    assert out[2]["dc_upper"] == 12.0 and out[2]["dc_lower"] == 10.0
    # seq 3: price 13 > prev channel high 12 -> breakout up
    assert out[3]["breakout_up"] is True and out[3]["breakout_down"] is False
    # seq 4: price 9 < prev channel low 11 -> breakout down
    assert out[4]["dc_lower"] == 9.0
    assert out[4]["breakout_down"] is True and out[4]["breakout_up"] is False


def test_aroon_positions_and_tie_handling(spark):
    from market_analyze_data_stream_processing_spark.operators.indicators import (
        with_aroon,
    )

    # window n=3: ties on the high must resolve to the MOST RECENT bar
    prices = [5.0, 5.0, 4.0, 3.0]
    out = {r["seq"]: r for r in with_aroon(_bars(spark, prices), n=3).collect()}
    assert out[1]["aroon_up"] is None  # gated until 3 rows
    # seq 2: window [5, 5, 4]; latest high at seq 1 -> 1 row back
    assert abs(out[2]["aroon_up"] - 100.0 * (2 - 1) / 2) < 1e-9
    # lowest 4 at seq 2 (current) -> down = 100
    assert out[2]["aroon_down"] == 100.0
    # seq 3: window [5, 4, 3]; high 2 back -> 0, low current -> 100
    assert out[3]["aroon_up"] == 0.0
    assert out[3]["aroon_down"] == 100.0


def test_cci_matches_manual_mad(spark):
    from market_analyze_data_stream_processing_spark.operators.indicators import (
        with_cci,
    )

    rows = [
        ("A", "2024-01-01", 12.0, 9.0, 10.5),   # tp = 10.5
        ("A", "2024-01-02", 13.0, 10.0, 11.5),  # tp = 11.5
        ("A", "2024-01-03", 16.0, 13.0, 14.5),  # tp = 14.5
    ]
    df = spark.createDataFrame(
        rows, "ticker string, day string, high double, low double, close double"
    ).withColumn("day", F.to_date("day"))
    out = {r["day"].isoformat(): r for r in with_cci(df, n=3).collect()}
    assert out["2024-01-02"]["cci"] is None  # window not full
    tps = [10.5, 11.5, 14.5]
    sma = sum(tps) / 3
    mad = sum(abs(t - sma) for t in tps) / 3
    want = (14.5 - sma) / (0.015 * mad)
    assert abs(out["2024-01-03"]["cci"] - want) < 1e-6


def test_cci_flat_window_is_null(spark):
    from market_analyze_data_stream_processing_spark.operators.indicators import (
        with_cci,
    )

    rows = [
        ("A", f"2024-01-0{i}", 5.0, 5.0, 5.0) for i in range(1, 4)
    ]
    df = spark.createDataFrame(
        rows, "ticker string, day string, high double, low double, close double"
    ).withColumn("day", F.to_date("day"))
    out = with_cci(df, n=3).collect()
    assert all(r["cci"] is None for r in out)  # MAD = 0 -> undefined


def _daily(spark, rows, with_vol=False):
    schema = "ticker string, day string, high double, low double, close double"
    if with_vol:
        schema += ", vol long"
    return spark.createDataFrame(rows, schema).withColumn(
        "day", F.to_date("day")
    )


def test_roc_cmo_conventions(spark):
    from market_analyze_data_stream_processing_spark.operators.indicators import with_roc_cmo

    # n_roc=2, n_cmo=3; deltas +3, -1, +2 -> Su=5, Sd=1 -> CMO = 100*(4/6)
    out = {
        r["seq"]: r
        for r in with_roc_cmo(
            _bars(spark, [1.0, 4.0, 3.0, 5.0]), n_roc=2, n_cmo=3
        ).collect()
    }
    assert out[1]["roc"] is None  # only 1 prior row
    assert abs(out[2]["roc"] - (3.0 / 1.0 - 1.0) * 100.0) < 1e-9
    assert out[2]["cmo"] is None  # only 2 deltas
    assert abs(out[3]["cmo"] - 100.0 * 4.0 / 6.0) < 1e-9
    # flat window -> 0 (not null, not NaN)
    flat = {
        r["seq"]: r["cmo"]
        for r in with_roc_cmo(
            _bars(spark, [2.0, 2.0, 2.0, 2.0]), n_roc=2, n_cmo=3
        ).collect()
    }
    assert flat[3] == 0.0


def test_cmf_adl_flat_bar_and_frame(spark):
    from market_analyze_data_stream_processing_spark.operators.indicators import with_cmf_adl

    rows = [
        ("A", "2024-01-01", 10.0, 8.0, 9.5, 100),   # mfm = (1.5-0.5)/2 = 0.5
        ("A", "2024-01-02", 7.0, 7.0, 7.0, 50),     # flat H=L -> mfm 0
        ("A", "2024-01-03", 12.0, 8.0, 8.0, 200),   # mfm = (0-4)/4 = -1
    ]
    out = {
        r["day"].isoformat(): r
        for r in with_cmf_adl(_daily(spark, rows, with_vol=True), n=2).collect()
    }
    assert abs(out["2024-01-01"]["adl"] - 50.0) < 1e-9
    assert abs(out["2024-01-02"]["adl"] - 50.0) < 1e-9  # flat bar adds 0
    assert abs(out["2024-01-03"]["adl"] - (50.0 - 200.0)) < 1e-9
    assert out["2024-01-01"]["cmf"] is None  # window not full
    # days 2-3: mfv 0 + (-200) over vol 50 + 200
    assert abs(out["2024-01-03"]["cmf"] - (-200.0 / 250.0)) < 1e-9


def test_cmf_null_on_zero_volume_window(spark):
    """An all-zero n-bar volume sum leaves CMF undefined: explicit NULL
    on every engine, never Spark-NULL-vs-IEEE-inf divergence."""
    from market_analyze_data_stream_processing_spark.operators.indicators import with_cmf_adl

    rows = [
        ("A", "2024-01-01", 10.0, 8.0, 9.5, 0),
        ("A", "2024-01-02", 12.0, 8.0, 8.0, 0),
        ("A", "2024-01-03", 12.0, 8.0, 8.0, 100),  # mfm = -1
    ]
    out = {
        r["day"].isoformat(): r
        for r in with_cmf_adl(_daily(spark, rows, with_vol=True), n=2).collect()
    }
    assert out["2024-01-02"]["cmf"] is None  # full window, zero volume
    assert abs(out["2024-01-03"]["cmf"] - (-100.0 / 100.0)) < 1e-9


def test_ulcer_zero_at_new_highs_and_value(spark):
    from market_analyze_data_stream_processing_spark.operators.indicators import with_ulcer

    rows = [
        ("A", "2024-01-01", 0.0, 0.0, 100.0),
        ("A", "2024-01-02", 0.0, 0.0, 110.0),
        ("A", "2024-01-03", 0.0, 0.0, 99.0),  # dd = 100*(99/110-1) = -10
    ]
    out = {
        r["day"].isoformat(): r["ulcer"]
        for r in with_ulcer(_daily(spark, rows), n=2).collect()
    }
    assert out["2024-01-01"] is None  # window not full
    assert out["2024-01-02"] == 0.0  # monotone rise: no drawdown
    # days 2-3: dd 0 and -10 -> sqrt((0+100)/2)
    assert abs(out["2024-01-03"] - math.sqrt(50.0)) < 1e-6


def test_vortex_gating_and_ratio(spark):
    from market_analyze_data_stream_processing_spark.operators.indicators import with_vortex

    rows = [
        ("A", "2024-01-01", 10.0, 8.0, 9.0),
        ("A", "2024-01-02", 11.0, 9.0, 10.0),  # vmp=|11-8|=3, vmm=|9-10|=1, tr=2
        ("A", "2024-01-03", 12.0, 10.0, 11.0),  # vmp=|12-9|=3, vmm=|10-11|=1, tr=2
    ]
    out = {
        r["day"].isoformat(): r
        for r in with_vortex(_daily(spark, rows), n=2).collect()
    }
    assert out["2024-01-01"]["vi_plus"] is None  # no prev bar
    assert out["2024-01-02"]["vi_plus"] is None  # only 1 full term
    assert abs(out["2024-01-03"]["vi_plus"] - 6.0 / 4.0) < 1e-9
    assert abs(out["2024-01-03"]["vi_minus"] - 2.0 / 4.0) < 1e-9
