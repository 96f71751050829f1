"""Round-8 risk/indicator tier: Williams %R, MFI, Ichimoku, Keltner,
range-based volatility estimators, return autocorrelation. The oracle
differentials cover the corpus; these pin edge conventions on
handcrafted bars."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.indicators import (
    with_ichimoku,
    with_keltner,
    with_mfi,
    with_williams_r,
)
from market_analyze_data_stream_processing_spark.operators.volatility import (
    ohlc_volatility,
    return_autocorr,
)


def _daily(spark, bars, ticker="A", with_vol=False):
    """bars: list of (high, low, close[, vol]) tuples, one per day."""
    schema = "ticker string, day date, high double, low double, close double"
    if with_vol:
        schema += ", vol long"
    rows = [
        (ticker, f"2024-01-{i + 1:02d}", *[float(x) for x in b[:3]],
         *([int(b[3])] if with_vol else []))
        for i, b in enumerate(bars)
    ]
    return spark.createDataFrame(
        [r for r in rows],
        schema.replace("day date", "day string"),
    ).withColumn("day", F.to_date("day"))


def _bars(spark, prices, ticker="A"):
    rows = [
        (ticker, f"2024-01-01 10:{i:02d}:00", float(p), i)
        for i, p in enumerate(prices)
    ]
    return spark.createDataFrame(
        rows, "ticker string, ts string, price double, seq long"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_williams_r_position_and_gates(spark):
    d = _daily(spark, [(10, 8, 9), (12, 9, 11), (12, 12, 12)])
    out = {r["day"].day: r for r in with_williams_r(d, n=2).collect()}
    assert out[1]["willr"] is None  # window not filled
    # hh=12, ll=8 over days 1-2; %R = -100*(12-11)/(12-8) = -25
    assert out[2]["willr"] == -25.0
    # hh=12, ll=9 over days 2-3; %R = -100*(12-12)/3 = 0 (at the high)
    assert out[3]["willr"] == 0.0
    flat = _daily(spark, [(5, 5, 5), (5, 5, 5)])
    r2 = {r["day"].day: r for r in with_williams_r(flat, n=2).collect()}
    assert r2[2]["willr"] is None  # flat window: undefined


def test_mfi_conventions_and_value(spark):
    # TPs strictly rising -> all positive flow -> MFI 100
    up = _daily(
        spark,
        [(10, 8, 9, 5), (11, 9, 10, 5), (12, 10, 11, 5)],
        with_vol=True,
    )
    out = {r["day"].day: r for r in with_mfi(up, n=2).collect()}
    assert out[1]["mfi"] is None and out[2]["mfi"] is None  # needs 2 deltas
    assert out[3]["mfi"] == 100.0
    # flat TPs -> both flows zero -> 50 convention
    flat = _daily(
        spark, [(5, 5, 5, 1), (5, 5, 5, 1), (5, 5, 5, 1)], with_vol=True
    )
    f = {r["day"].day: r for r in with_mfi(flat, n=2).collect()}
    assert f[3]["mfi"] == 50.0
    # mixed: day2 delta +, day3 delta −; MFI3 = 100 − 100/(1 + pos/neg)
    mixed = _daily(
        spark,
        [(10, 8, 9, 2), (11, 9, 10, 3), (9, 7, 8, 4)],
        with_vol=True,
    )
    m = {r["day"].day: r for r in with_mfi(mixed, n=2).collect()}
    pos = (11 + 9 + 10) * 3
    neg = (9 + 7 + 8) * 4
    assert abs(m[3]["mfi"] - (100.0 - 100.0 / (1.0 + pos / neg))) < 1e-9


def test_ichimoku_displacement(spark):
    prices = [float(p) for p in [10, 12, 11, 14, 13, 15, 12, 16, 14, 15]]
    out = {
        r["seq"]: r
        for r in with_ichimoku(
            _bars(spark, prices), n_tenkan=2, n_kijun=3, n_senkou=4
        ).collect()
    }
    # tenkan at seq 1 = (max+min)/2 of first two prices
    assert out[1]["tenkan"] == (12 + 10) / 2
    assert out[0]["tenkan"] is None
    # senkou_a at seq i = (tenkan+kijun)/2 from seq i-3
    i = 7
    src = out[i - 3]
    assert out[i]["senkou_a"] == (src["tenkan"] + src["kijun"]) / 2
    # senkou_b displaced 4-bar midline; chikou = price 3 bars ahead
    lo4 = min(prices[i - 3 - 3 : i - 3 + 1])
    hi4 = max(prices[i - 3 - 3 : i - 3 + 1])
    assert out[i]["senkou_b"] == (hi4 + lo4) / 2
    assert out[2]["chikou"] == prices[5]
    assert out[9]["chikou"] is None  # series tail


def test_keltner_band_arithmetic(spark):
    d = _daily(spark, [(10, 8, 9), (12, 9, 11), (13, 10, 12)])
    out = {r["day"].day: r for r in with_keltner(d, n_ma=2, n_atr=2, k=2.0).collect()}
    assert out[1]["kc_mid"] is None
    tp2 = (10 + 8 + 9) / 3.0
    tp3_ = (12 + 9 + 11) / 3.0
    basis = (tp2 + tp3_) / 2.0
    tr1 = 10 - 8  # first bar: H-L
    tr2 = max(12 - 9, abs(12 - 9), abs(9 - 9))  # prev close 9
    atr = (tr1 + tr2) / 2.0
    assert abs(out[2]["kc_mid"] - basis) < 1e-9
    assert abs(out[2]["kc_upper"] - (basis + 2 * atr)) < 1e-9
    assert abs(out[2]["kc_lower"] - (basis - 2 * atr)) < 1e-9


def test_ohlc_volatility_manual(spark):
    rows = [("A", "2024-01-01", 10.0, 12.0, 9.0, 11.0),
            ("A", "2024-01-02", 11.0, 13.0, 10.0, 12.0)]
    d = spark.createDataFrame(
        rows, "ticker string, day string, open double, high double, "
        "low double, close double"
    ).withColumn("day", F.to_date("day"))
    r = ohlc_volatility(d).collect()[0]
    terms = []
    for _, _, o, h, lo, c in rows:
        terms.append(math.log(h / lo) ** 2)
    park = math.sqrt((sum(terms) / 2) / (4 * math.log(2)))
    assert r["n_days"] == 2
    assert abs(r["park_vol"] - park) < 1e-12
    # RS is drift-independent and non-negative on true OHLC bars
    assert r["rs_vol"] >= 0.0 and r["gk_vol"] >= 0.0


def test_return_autocorr_alternating_is_minus_one(spark):
    # prices alternate p, p*e, p, ... -> log returns alternate +1/-1
    prices = [10.0, 10.0 * math.e, 10.0, 10.0 * math.e, 10.0, 10.0 * math.e]
    rows = [("A", f"2024-01-{i + 1:02d}", p) for i, p in enumerate(prices)]
    d = spark.createDataFrame(
        rows, "ticker string, day string, close double"
    ).withColumn("day", F.to_date("day"))
    r = return_autocorr(d, lags=(1, 2)).collect()[0]
    assert r["n_returns"] == 5
    assert abs(r["acf_1"] - (-1.0)) < 1e-9
    assert abs(r["acf_2"] - 1.0) < 1e-9


def test_var_cvar_order_statistics(spark):
    from market_analyze_data_stream_processing_spark.operators.volatility import (
        historical_var_cvar,
    )

    # Closes chosen so daily simple returns are exactly
    # [-0.5, +1.0, -0.2, +0.25, -0.1] (n=5).
    closes = [100.0, 50.0, 100.0, 80.0, 100.0, 90.0]
    d = _daily(spark, [(c, c, c) for c in closes])
    row = historical_var_cvar(d, alpha=0.05).collect()[0]
    # k = ceil(0.05 * 5) = 1: VaR is the single worst return, CVaR its mean.
    assert row["n_returns"] == 5
    assert row["tail_k"] == 1
    assert row["var_loss"] == -0.5
    assert row["cvar_loss"] == -0.5

    # alpha=0.4 -> k = ceil(2.0) = 2: tail = {-0.5, -0.2}, VaR = 2nd worst.
    row = historical_var_cvar(d, alpha=0.4).collect()[0]
    assert row["tail_k"] == 2
    r2 = 80.0 / 100.0 - 1.0  # the IEEE value, not the decimal -0.2
    assert row["var_loss"] == r2
    assert math.isclose(row["cvar_loss"], (-0.5 + r2) / 2)


def test_var_cvar_zero_close_gate_and_ties(spark):
    from market_analyze_data_stream_processing_spark.operators.volatility import (
        historical_var_cvar,
    )

    # A zero PREVIOUS close nulls the next return (prev > 0 gate; no
    # division by zero under ANSI mode), but a zero CURRENT close is a
    # defined -100% simple return — the worst loss, not a gap.
    d = _daily(spark, [(10, 10, 10), (0, 0, 0), (10, 10, 10), (5, 5, 5)])
    row = historical_var_cvar(d, alpha=0.5).collect()[0]
    assert row["n_returns"] == 2  # 10 -> 0 (-1.0) and 10 -> 5 (-0.5)
    assert row["var_loss"] == -1.0

    # Tied returns: day breaks the tie, the tail set stays size k.
    d2 = _daily(spark, [(8, 8, 8), (4, 4, 4), (8, 8, 8), (4, 4, 4)])
    row2 = historical_var_cvar(d2, alpha=0.5).collect()[0]
    # returns = [-0.5, +1.0, -0.5]; k = ceil(1.5) = 2 -> tail {-0.5, -0.5}
    assert row2["tail_k"] == 2
    assert row2["var_loss"] == -0.5
    assert row2["cvar_loss"] == -0.5


def test_corr_kernel_memo_identity_and_assert_key(spark, monkeypatch):
    """Round-14 expression memo: the name-keyed corr kernels return the
    SAME Column objects on repeated calls (the whole point — zero
    rebuild cost), the memoized trees stay usable across plans, and the
    numeric-assert flag participates in the key (domain_checked bakes
    the flag into the tree at construction, so assert-on and assert-off
    builds must never share a cache line)."""
    from market_analyze_data_stream_processing_spark.functions.scalars import (
        NUMERIC_ASSERT_ENV,
    )
    from market_analyze_data_stream_processing_spark.operators.stats import (
        corr_from_moments_named,
        corr_moment_aggs_named,
    )

    a1 = corr_moment_aggs_named("x", "y", "t1")
    a2 = corr_moment_aggs_named("x", "y", "t1")
    assert a1 is a2  # memo hit: identical objects
    assert corr_from_moments_named("t1") is corr_from_moments_named("t1")

    # flip the assert flag to the OPPOSITE of whatever the suite runs
    # under (conftest defaults it on) — the flipped mode must get its
    # own tree
    from market_analyze_data_stream_processing_spark.functions.scalars import (
        numeric_assert_enabled,
    )
    flipped = "0" if numeric_assert_enabled() else "1"
    monkeypatch.setenv(NUMERIC_ASSERT_ENV, flipped)
    a3 = corr_moment_aggs_named("x", "y", "t1")
    assert a3 is not a1  # flipped mode gets its own tree

    # the memoized expressions work in two independent plans and agree
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, 5.0)], ["x", "y"]
    )
    from pyspark.sql import functions as F

    q = df.select(
        F.col("x").cast("decimal(28,12)").alias("x"),
        F.col("y").cast("decimal(28,12)").alias("y"),
    )
    r1 = q.agg(*corr_moment_aggs_named("x", "y", "t1")).select(
        corr_from_moments_named("t1").alias("c")
    ).collect()[0]["c"]
    r2 = q.agg(*corr_moment_aggs_named("x", "y", "t1")).select(
        corr_from_moments_named("t1").alias("c")
    ).collect()[0]["c"]
    assert r1 == r2
    assert abs(r1 - 0.981980506) < 1e-6
