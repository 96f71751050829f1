"""Golden-value tests for the market-analytics operators (SURVEY §2.4/2.5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.analytics import (
    daily_summary,
    keep_last,
    latest_per_key,
    with_lag_variation,
    with_momentum_lags,
    with_moving_averages,
    with_trend,
)


@pytest.fixture(scope="module")
def bars(spark):
    rows = [
        # ticker, date, Close
        ("A", "2024-01-01", 10.0),
        ("A", "2024-01-02", 20.0),
        ("A", "2024-01-03", 30.0),
        ("A", "2024-01-04", 0.0),
        ("A", "2024-01-05", 50.0),
        ("B", "2024-01-01", 5.0),
        ("B", "2024-01-02", 5.0),
    ]
    return spark.createDataFrame(rows, ["ticker", "date", "Close"])


def _by_key(df, *cols):
    return {(r["ticker"], r["date"]): tuple(r[c] for c in cols) for r in df.collect()}


def test_moving_average_partial_windows(bars):
    out = with_moving_averages(bars, windows=(3,), round_to=6)
    got = _by_key(out, "ma3")
    assert got[("A", "2024-01-01")] == (10.0,)
    assert got[("A", "2024-01-02")] == (15.0,)
    assert got[("A", "2024-01-03")] == (20.0,)
    assert got[("A", "2024-01-04")] == (pytest.approx(50 / 3, abs=1e-5),)
    assert got[("B", "2024-01-02")] == (5.0,)  # partitions don't leak


def test_moving_average_min_fill_gates_unfilled_windows(bars):
    # A4/producer.py:325-327: NaN→0.0 until the window has n rows
    out = with_moving_averages(bars, windows=(3,), min_fill=True)
    got = _by_key(out, "ma3")
    assert got[("A", "2024-01-01")] == (0.0,)
    assert got[("A", "2024-01-02")] == (0.0,)
    assert got[("A", "2024-01-03")] == (20.0,)


def test_lag_variation_zero_and_missing_guards(bars):
    out = with_lag_variation(bars, round_to=4)
    got = _by_key(out, "variation_pct")
    assert got[("A", "2024-01-01")] == (0.0,)  # no previous row → 0.0
    assert got[("A", "2024-01-02")] == (100.0,)
    assert got[("A", "2024-01-05")] == (0.0,)  # prev == 0 → 0.0 (not inf)


def test_momentum_lags_insufficient_history_is_zero(bars):
    out = with_momentum_lags(
        bars, value_col="Close", key="ticker", order="date", lags={"2bar": 2}
    )
    got = _by_key(out, "price_2bar_ago", "var_2bar")
    assert got[("A", "2024-01-01")] == (0.0, 0.0)
    assert got[("A", "2024-01-03")] == (10.0, 200.0)


def test_trend_classification_tie_is_neutral(spark):
    df = spark.createDataFrame(
        [("A", 10.0, 9.0), ("A", 10.0, 11.0), ("A", 10.0, 10.0)],
        ["ticker", "Close", "ma50"],
    )
    got = [r["trend"] for r in with_trend(df).collect()]
    assert got == ["BULLISH", "BEARISH", "NEUTRAL"]


def test_daily_summary_open_close_by_sequence(spark):
    rows = [
        ("A", "2024-01-01 09:00:00", 1, 10.0),
        ("A", "2024-01-01 12:00:00", 2, 99.0),
        ("A", "2024-01-01 17:00:00", 3, 30.0),
        ("A", "2024-01-02 09:00:00", 4, 7.0),
    ]
    df = spark.createDataFrame(rows, ["ticker", "ts", "seq", "price"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = daily_summary(df, value_col="price", volume_col=None, seq_col="seq")
    got = {(r["ticker"], r["day"]): r for r in out.collect()}
    d1 = got[("A", "2024-01-01")]
    assert (d1["open_px"], d1["close_px"], d1["high_px"], d1["low_px"]) == (
        10.0, 30.0, 99.0, 10.0,
    )
    assert d1["n_bars"] == 3
    assert d1["variation_pct"] == pytest.approx(200.0)
    assert got[("A", "2024-01-02")]["variation_pct"] == 0.0  # single bar: open==close


def test_latest_per_key_and_keep_last(spark):
    rows = [
        ("A", 1, 10.0),
        ("A", 3, 30.0),
        ("A", 2, 20.0),
        ("B", 9, 90.0),
    ]
    df = spark.createDataFrame(rows, ["ticker", "seq", "v"])
    latest = {r["ticker"]: r["v"] for r in latest_per_key(df, "ticker", "seq").collect()}
    assert latest == {"A": 30.0, "B": 90.0}
    assert keep_last(df, "ticker", "seq").count() == 2


def test_asof_join_edge_semantics(spark):
    """<= visibility at equal timestamps, latest-wins across candidates,
    NULL attach when no right row precedes the left row."""
    from market_analyze_data_stream_processing_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 5, 102)], ["k", "lt", "lid"]
    )
    right = spark.createDataFrame(
        [(1, 10, 7.0), (1, 15, 8.0), (2, 9, 9.0)], ["k", "rt", "rv"]
    )
    out = {
        r["lid"]: (r["rt"], r["rv"])
        for r in asof_join(
            left, right, on=["k"], left_ts="lt", right_ts="rt", right_cols=["rv"]
        ).collect()
    }
    assert out[100] == (10, 7.0)      # equal ts IS visible
    assert out[101] == (15, 8.0)      # latest of the two candidates
    assert out[102] == (None, None)   # right row is later than left ts


def test_approx_percentile_tolerance(spark):
    """The sketch path must stay within 1% relative error of the exact
    percentiles at sf0.01 — the quantified contract that lets the
    constant-memory form stand in for the exact shuffle at scale. The
    query itself now emits the exact percentiles plus an in-plan
    sketch-bracket verdict (oracle-checked); this test keeps the direct
    sketch-vs-exact relative-error bound as well."""
    from market_analyze_data_stream_processing_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["q_approx_percentiles"].fn(spark, sf).collect()
    assert rows and all(r["sketch_rank_ok"] for r in rows)
    exact = {r["o_orderpriority"]: (r["p50"], r["p90"], r["p99"]) for r in rows}
    o = spark.read.parquet(f"{sf}/orders.parquet")
    sketch_rows = o.groupBy("o_orderpriority").agg(
        F.expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)").alias("p")
    ).collect()
    for r in sketch_rows:
        for want, got in zip(exact[r["o_orderpriority"]], r["p"]):
            assert abs(got - want) / want < 0.01, (r["o_orderpriority"], got, want)


def test_ewma_blocked_invariant_to_block_size(spark):
    """Halo-block EWMA must produce bitwise-identical results whatever
    the block size: a huge block (whole key in one task, the original
    form) vs the kernel-length minimum (maximum boundary crossings)."""
    import random

    from market_analyze_data_stream_processing_spark.plans.market import ewma_blocked

    rng = random.Random(7)
    rows = [
        (t, i, float(i), round(rng.uniform(1.0, 500.0), 4))
        for t in ("AA", "BB")
        for i in range(997)  # not a multiple of any block size used
    ]
    bars = spark.createDataFrame(
        rows, "ticker string, seq long, ts double, price double"
    ).withColumn("ts", F.col("ts"))
    big = {
        (r["ticker"], r["seq"]): r["ewma"]
        for r in ewma_blocked(bars, block_size=10**6).collect()
    }
    small = {
        (r["ticker"], r["seq"]): r["ewma"]
        for r in ewma_blocked(bars, block_size=100).collect()
    }
    assert big == small  # bitwise equality, no tolerance
    assert len(big) == 2 * 997
