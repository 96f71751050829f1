"""ANSI-mode totality of the statistical query family on degenerate
series — zero prices, flat (zero-variance) series, single-row keys.

Spark 4 defaults to ANSI mode (the driver's vanilla session), where an
unguarded x/0 is a DIVIDE_BY_ZERO crash rather than NULL, and the
built-in corr() aggregate crashes on any zero-variance group. The
round-9 adversarial-data differential (zero prices injected into a
sf0.01 clone) crashed 9 registry queries; every one now goes through
explicit gates or the exact-moment Pearson kernel (operators/stats.py)
and must yield NULLs — defined, engine-portable 'undefined' — instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.plans import QUERIES


@pytest.fixture(scope="module")
def degenerate_sf(spark, tmp_path_factory):
    """events.parquet with one normal ticker, one flat (zero-variance)
    ticker, one single-row ticker, and one ticker whose series starts
    at price 0.0."""
    rows = []
    # normal: 20 varying closes
    for i in range(20):
        rows.append((i, f"2024-03-{i + 1:02d} 10:00:00", 100 + i, "normal",
                     10.0 + (i % 5) + 0.25 * i, ""))
    # flatline: 20 identical closes -> zero return variance
    for i in range(20):
        rows.append((100 + i, f"2024-03-{i + 1:02d} 10:00:00", 200 + i,
                     "flatline", 7.0, ""))
    # solo: a single event
    rows.append((300, "2024-03-05 10:00:00", 301, "solo", 12.5, ""))
    # zero_open: first price is exactly 0.0
    rows.append((400, "2024-03-01 10:00:00", 401, "zero_open", 0.0, ""))
    rows.append((401, "2024-03-02 10:00:00", 402, "zero_open", 3.0, ""))
    rows.append((402, "2024-03-03 10:00:00", 403, "zero_open", 4.0, ""))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    sf_dir = str(tmp_path_factory.mktemp("degenerate"))
    df.write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    return sf_dir


def _rows(spark, sf_dir, name, key="ticker"):
    return {r[key]: r for r in QUERIES[name].fn(spark, sf_dir).collect()}


def test_sharpe_null_on_flat_and_solo(spark, degenerate_sf):
    out = _rows(spark, degenerate_sf, "q_sharpe")
    assert out["flatline"]["std_r"] == 0.0
    assert out["flatline"]["sharpe_ann"] is None
    assert out["solo"]["n_returns"] == 0
    assert out["solo"]["sharpe_ann"] is None
    assert out["normal"]["sharpe_ann"] is not None


def test_autocorr_null_on_flat_and_zero_head(spark, degenerate_sf):
    out = _rows(spark, degenerate_sf, "q_autocorr")
    # flat series: zero variance -> Pearson undefined on every engine
    assert out["flatline"]["acf_1"] is None
    # zero_open: the 0 -> 3.0 return is undefined (prev close 0), only
    # the 3.0 -> 4.0 return survives -> a single pair -> NULL
    assert out["zero_open"]["n_returns"] == 1
    assert out["zero_open"]["acf_1"] is None
    assert out["normal"]["acf_1"] is not None


def test_ljung_box_skips_degenerate_series(spark, degenerate_sf):
    out = _rows(spark, degenerate_sf, "q_ljung_box")
    # flatline has n > 5 returns but NULL ACFs -> NULL Q, NULL reject
    assert out["flatline"]["q_stat"] is None
    assert out["flatline"]["reject_5pct"] is None
    assert out["normal"]["q_stat"] is not None
    assert "solo" not in out  # n > 5 filter


def test_stats_agg_corr_null_on_single_and_flat(spark, degenerate_sf):
    out = _rows(spark, degenerate_sf, "q_stats_agg", key="event_type")
    assert out["solo"]["sd"] is None  # stddev_samp of one row
    assert out["solo"]["corr_uid"] is None  # n < 2
    assert out["flatline"]["sd"] == 0.0
    assert out["flatline"]["corr_uid"] is None  # zero value variance
    assert out["normal"]["corr_uid"] is not None


def test_series_correlation_null_against_flat(spark, degenerate_sf):
    out = {
        (r["ticker_a"], r["ticker_b"]): r
        for r in QUERIES["q_series_correlation"].fn(
            spark, degenerate_sf
        ).collect()
    }
    assert out[("flatline", "normal")]["r"] is None
    assert out[("flatline", "zero_open")]["r"] is None


def test_lead_lag_null_against_flat(spark, degenerate_sf):
    out = {
        (r["ticker_a"], r["ticker_b"]): r
        for r in QUERIES["q_lead_lag"].fn(spark, degenerate_sf).collect()
    }
    assert out[("flatline", "normal")]["contemp"] is None
    assert out[("flatline", "normal")]["b_leads_a"] is None


def test_pairs_spread_null_on_zero_value_day(spark, degenerate_sf):
    rows = QUERIES["q_pairs_spread"].fn(spark, degenerate_sf).collect()
    z = [
        r for r in rows
        if "zero_open" in (r["ticker_a"], r["ticker_b"])
        and r["day"] == "2024-03-01"
    ]
    assert z and all(r["spread"] is None for r in z)
    nz = [
        r for r in rows
        if {r["ticker_a"], r["ticker_b"]} == {"flatline", "normal"}
    ]
    assert nz and all(r["spread"] is not None for r in nz)


def test_hurst_drops_zero_price_returns(spark, degenerate_sf):
    out = _rows(spark, degenerate_sf, "q_hurst")
    assert "zero_open" not in out  # 1 surviving return -> no full block
    assert "normal" in out


def test_ulcer_operator_null_on_zero_rolling_high(spark):
    from market_analyze_data_stream_processing_spark.operators.indicators import (
        with_ulcer,
    )

    rows = [("Z", f"2024-01-{i + 1:02d}", 0.0 if i < 2 else 5.0 + i)
            for i in range(4)]
    df = spark.createDataFrame(rows, "ticker string, day string, close double") \
        .withColumn("day", F.to_date("day"))
    out = {r["day"].isoformat(): r for r in with_ulcer(df, n=2).collect()}
    # rows 1-2: rolling high is 0.0 -> dd2 undefined -> only 2 counted
    # dd2s exist by row 4 -> first defined ulcer at 2024-01-04
    assert out["2024-01-02"]["ulcer"] is None
    assert out["2024-01-04"]["ulcer"] is not None


def test_risk_report_total_on_degenerate(spark, degenerate_sf):
    out = _rows(spark, degenerate_sf, "q_risk_report")
    assert out["flatline"]["sharpe_ann"] is None
    assert out["flatline"]["acf_1"] is None
    assert out["flatline"]["gk_vol"] == 0.0


def test_cosine_null_on_zero_norm_vector(spark):
    """A zero-norm embedding leaves cosine undefined: NULL on every
    engine (ANSI Spark would DIVIDE_BY_ZERO; DuckDB NULLs on /0) — and
    a NULL similarity sorts after every real one in a desc top-k on
    both engines, so kNN results stay comparable."""
    from market_analyze_data_stream_processing_spark.functions.vectors import (
        cosine_sim,
        lit_vector,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    from market_analyze_data_stream_processing_spark.functions.vectors import (
        as_double,
    )

    probe = lit_vector([1.0, 0.0])
    out = {
        r["vec_id"]: r["sim"]
        for r in df.select(
            "vec_id",
            cosine_sim(as_double(F.col("embedding")), probe).alias("sim"),
        ).collect()
    }
    assert out[1] == 1.0
    assert out[2] is None
    assert abs(out[3] - 0.5**0.5) < 1e-9
