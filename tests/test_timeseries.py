"""Time-series regularization operators: OHLC resample tiebreaks and
calendar gap-fill semantics on handcrafted frames (the oracle queries
q_resample_weekly / q_gapfill_daily cover the corpus-level differential;
these pin the exact row-level behavior)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.timeseries import (
    gap_fill_daily,
    resample_ohlc,
)


def test_resample_ohlc_open_close_tiebreak_on_seq(spark):
    """Two ticks share the opening timestamp and two share the closing
    one: seq must break both ties (lowest seq opens, highest closes)."""
    rows = [
        ("A", "2024-01-01 09:00:00", 10.0, 2),
        ("A", "2024-01-01 09:00:00", 11.0, 1),   # same ts, lower seq => open
        ("A", "2024-01-02 12:00:00", 1.0, 9),    # low of the week
        ("A", "2024-01-03 17:00:00", 99.0, 7),   # high of the week
        ("A", "2024-01-03 17:00:00", 42.0, 8),   # same ts, higher seq => close
        ("B", "2024-01-01 10:00:00", 5.0, 3),
    ]
    df = spark.createDataFrame(
        rows, "ticker string, ts string, price double, seq long"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["ticker"]: r
        for r in resample_ohlc(df, unit="week").collect()
    }
    a = out["A"]
    assert (a["open"], a["high"], a["low"], a["close"], a["n_bars"]) == (
        11.0, 99.0, 1.0, 42.0, 5
    )
    assert a["period"] == datetime.date(2024, 1, 1)  # ISO Monday
    assert out["B"]["open"] == out["B"]["close"] == 5.0


def test_gap_fill_daily_fills_interior_gaps_only(spark):
    """Gaps between a key's first and last day are synthesized with the
    forward-filled value and is_filled=true; nothing is created outside
    the key's own span, and keys never bleed into each other."""
    rows = [
        ("A", "2024-01-01", 1.0),
        ("A", "2024-01-04", 4.0),   # 2 interior gap days
        ("B", "2024-02-10", 9.0),   # single-day span: no gaps
    ]
    df = spark.createDataFrame(rows, "sid string, day string, close double")
    df = df.withColumn("day", F.to_date("day"))
    out = sorted(
        (r["sid"], str(r["day"]), r["close"], r["is_filled"])
        for r in gap_fill_daily(df, key="sid").collect()
    )
    assert out == [
        ("A", "2024-01-01", 1.0, False),
        ("A", "2024-01-02", 1.0, True),
        ("A", "2024-01-03", 1.0, True),
        ("A", "2024-01-04", 4.0, False),
        ("B", "2024-02-10", 9.0, False),
    ]


def test_gap_fill_daily_total_on_empty(spark):
    empty = spark.createDataFrame(
        [], "sid string, day date, close double"
    ).where(F.lit(False))
    assert gap_fill_daily(empty, key="sid").count() == 0


def test_gap_fill_daily_observed_null_is_not_marked_filled(spark):
    """An OBSERVED day whose value is null is not a synthesized row:
    is_filled stays false (presence-based flag), while the null value
    forward-fills from the previous day like pandas ffill."""
    rows = [("A", "2024-01-01", 3.0), ("A", "2024-01-02", None)]
    df = spark.createDataFrame(rows, "sid string, day string, close double")
    df = df.withColumn("day", F.to_date("day"))
    out = {
        str(r["day"]): (r["close"], r["is_filled"])
        for r in gap_fill_daily(df, key="sid").collect()
    }
    assert out == {
        "2024-01-01": (3.0, False),
        "2024-01-02": (3.0, False),
    }


def test_seasonal_decompose_trend_seasonal_resid(spark):
    from market_analyze_data_stream_processing_spark.operators.timeseries import (
        seasonal_decompose,
    )

    # A pure 3-phase sawtooth: period-3 decomposition recovers a flat
    # trend equal to the cycle mean and seasonal = value - mean exactly.
    vals = [1.0, 2.0, 6.0] * 4  # 12 days
    rows = [
        ("A", f"2024-01-{i + 1:02d}", v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "ticker string, day string, close double"
    ).withColumn("day", F.to_date("day"))
    out = {r["day"].day: r for r in seasonal_decompose(df, period=3).collect()}

    # Edges: first and last day lack a full centered frame.
    assert out[1]["trend"] is None and out[12]["trend"] is None
    # Interior: every centered 3-frame covers one full cycle => mean 3.
    for d in range(2, 12):
        assert out[d]["trend"] == 3.0
    # Phase is epoch-day mod period — constant per sawtooth position.
    assert len({out[d]["phase"] for d in (1, 4, 7, 10)}) == 1
    # Seasonal means: value - trend is constant per phase.
    by_phase = {out[d]["phase"]: out[d]["seasonal"] for d in range(2, 12)}
    assert sorted(by_phase.values()) == [-2.0, -1.0, 3.0]
    # Decomposition identity on interior rows: close = trend + seasonal.
    for d in range(2, 12):
        r = out[d]
        assert r["close"] - r["trend"] - r["seasonal"] == 0.0


def test_seasonal_decompose_trend_is_decimal_exact(spark):
    from market_analyze_data_stream_processing_spark.operators.timeseries import (
        seasonal_decompose,
    )

    # 0.1 + 0.2 + 0.3 = 0.6000000000000001 in left-to-right IEEE; the
    # decimal frame sum is exactly 0.6, so the trend is the (single,
    # order-independent) IEEE value double(0.6)/3.0 — not the float
    # accumulation's.
    rows = [
        ("A", "2024-01-01", 0.1),
        ("A", "2024-01-02", 0.2),
        ("A", "2024-01-03", 0.3),
    ]
    df = spark.createDataFrame(
        rows, "ticker string, day string, close double"
    ).withColumn("day", F.to_date("day"))
    out = {r["day"].day: r for r in seasonal_decompose(df, period=3).collect()}
    assert out[2]["trend"] == 0.6 / 3.0
    assert out[2]["trend"] != (0.1 + 0.2 + 0.3) / 3.0  # the float-sum artifact


def test_seasonal_anomalies_flags_the_spike(spark, tmp_path):
    """A weekly-periodic series with small deterministic noise and ONE
    injected spike: the deseasonalized robust-z screen flags the spike
    day with the panel's largest |z| (a raw screen would flag every
    high-phase day), and any collateral flags stay inside the spike's
    own 7-day trend window (the centered MA smears the spike across
    exactly that window — inherent to MA decomposition).

    Also pins the degenerate contract: with NO noise the residual MAD
    is 0 and every z is null (nothing can be 'anomalous' relative to a
    zero-spread baseline)."""
    from market_analyze_data_stream_processing_spark.plans import QUERIES

    def write(vals):
        rows = [
            (i, f"2024-01-{i + 1:02d} 10:00:00", 1, "tickS", float(v), "{}")
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    # deterministic pseudo-noise in [-0.5, 0.5] keeps MAD > 0
    vals = [
        100.0 + 5.0 * (i % 7) + ((i * 37) % 11 - 5) / 10.0 for i in range(28)
    ]
    vals[17] += 40.0  # the anomaly (day 18)
    write(vals)
    out = QUERIES["q_seasonal_anomalies"].fn(spark, str(tmp_path)).collect()
    by_day = {r["day"]: r for r in out}
    flagged = {r["day"] for r in out if r["is_anomaly"] == 1}
    assert "2024-01-18" in flagged
    # Collateral flags can appear only where the spike itself leaks:
    # its 7-day centered-MA trend window, and the other occurrences of
    # its weekday phase (the mean seasonal estimate spreads the spike
    # as +spike/n_weeks across them — textbook MA-decomposition bias).
    window = {f"2024-01-{d:02d}" for d in range(15, 22)}
    same_phase = {f"2024-01-{d:02d}" for d in (4, 11, 18, 25)}
    assert flagged <= window | same_phase
    top = max(out, key=lambda r: abs(r["robust_z"]))
    assert top["day"] == "2024-01-18" and abs(top["robust_z"]) > 3.0

    write([100.0 + 5.0 * (i % 7) for i in range(28)])  # noiseless
    out2 = QUERIES["q_seasonal_anomalies"].fn(spark, str(tmp_path)).collect()
    assert all(r["robust_z"] is None and r["is_anomaly"] == 0 for r in out2)
