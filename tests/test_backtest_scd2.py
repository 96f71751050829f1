"""Row-level pins for the warehouse/backtest additions: SCD2 run
collapsing + validity tiling, event-study lead alignment, seasonal-naive
forecast errors. The oracle differentials cover the corpus; these pin
the exact conventions on handcrafted frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.plans import QUERIES


def _events(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [(i, t, u, et, float(v), "{}") for i, t, u, et, v in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    return df


def test_scd2_collapses_runs_and_tiles_validity(spark, tmp_path):
    rows = [
        # user 1: A A B A  -> versions A(2 events), B(1), A(1)
        (1, "2024-01-01 10:00:00", 1, "A", 1),
        (2, "2024-01-01 11:00:00", 1, "A", 1),
        (3, "2024-01-01 12:00:00", 1, "B", 1),
        (4, "2024-01-01 13:00:00", 1, "A", 1),
        # user 2: same-timestamp tie broken by event_id: B then A
        (6, "2024-01-02 09:00:00", 2, "A", 1),
        (5, "2024-01-02 09:00:00", 2, "B", 1),
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = QUERIES["q_scd2_history"].fn(spark, str(tmp_path)).collect()
    u1 = [r for r in out if r["user_id"] == 1]
    assert [(r["version"], r["state"], r["n_events"]) for r in u1] == [
        (1, "A", 2), (2, "B", 1), (3, "A", 1),
    ]
    # Half-open intervals tile the timeline: each valid_to equals the
    # next valid_from; only the last version is current (null valid_to).
    for a, b in zip(u1, u1[1:]):
        assert a["valid_to_us"] == b["valid_from_us"]
        assert a["is_current"] == 0
    assert u1[-1]["valid_to_us"] is None and u1[-1]["is_current"] == 1
    # Tie on ts: event_id 5 (B) precedes event_id 6 (A).
    u2 = [r for r in out if r["user_id"] == 2]
    assert [r["state"] for r in u2] == ["B", "A"]


def test_event_study_lead_alignment(spark, tmp_path):
    # One ticker, closes: 100, 97 (crash: -3%), 97*1.01, flat, flat.
    closes = [100.0, 97.0, 97.97, 97.97, 97.97]
    rows = [
        (i, f"2024-01-{i + 1:02d} 10:00:00", 1, "tickA", c)
        for i, c in enumerate(closes)
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = QUERIES["q_event_study"].fn(spark, str(tmp_path)).collect()
    row = {r["ticker"]: r for r in out}["tickA"]
    assert row["n_signals"] == 1
    assert row["car_1"] == 0.01  # 97 -> 97.97 is exactly +1%
    assert row["car_2"] == 0.0
    assert row["car_3"] == 0.0

    # Crash on the LAST day: no forward returns -> means are null,
    # the signal still counts.
    closes2 = [100.0, 100.0, 90.0]
    rows2 = [
        (i, f"2024-02-{i + 1:02d} 10:00:00", 1, "tickB", c)
        for i, c in enumerate(closes2)
    ]
    _events(spark, rows2).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out2 = QUERIES["q_event_study"].fn(spark, str(tmp_path)).collect()
    row2 = {r["ticker"]: r for r in out2}["tickB"]
    assert row2["n_signals"] == 1
    assert row2["car_1"] is None and row2["car_3"] is None


def test_forecast_eval_seasonal_naive_errors(spark, tmp_path):
    # 9 sessions: the last two eval against closes 7 sessions earlier.
    closes = [10.0, 20.0, 1, 1, 1, 1, 1, 12.0, 16.0]
    rows = [
        (i, f"2024-03-{i + 1:02d} 10:00:00", 1, "tickC", c)
        for i, c in enumerate(closes)
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = QUERIES["q_forecast_eval"].fn(spark, str(tmp_path)).collect()
    row = {r["ticker"]: r for r in out}["tickC"]
    # errors: |12-10| = 2, |16-20| = 4
    assert row["n_evals"] == 2
    assert row["mae"] == 3.0
    assert row["rmse"] == round((2.0**2 + 4.0**2) ** 0.5 / 2**0.5, 6)
    assert row["mape"] == round((2.0 / 12.0 + 4.0 / 16.0) / 2.0, 6)
