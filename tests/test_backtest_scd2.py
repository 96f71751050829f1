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


def test_scd2_stateful_matches_batch_closed_versions(spark, tmp_path):
    """The streaming SCD2 twin emits exactly the batch derivation's
    CLOSED versions (is_current=0), incrementally across triggers —
    including a version that spans the trigger boundary."""
    import json

    from market_analyze_data_stream_processing_spark.streaming.stateful import (
        scd2_stateful,
    )

    rows = [
        # user 1: A A | A B A   (run of A spans the batch boundary)
        (1, "2024-01-01 10:00:00", 1, "A", 1),
        (2, "2024-01-01 11:00:00", 1, "A", 1),
        (3, "2024-01-01 12:00:00", 1, "A", 1),
        (4, "2024-01-01 13:00:00", 1, "B", 1),
        (5, "2024-01-01 14:00:00", 1, "A", 1),
        # user 2: single state, never closes -> no streamed rows
        (6, "2024-01-01 10:30:00", 2, "C", 1),
        (7, "2024-01-01 11:30:00", 2, "C", 1),
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    batch = QUERIES["q_scd2_history"].fn(spark, str(tmp_path)).collect()
    expected = {
        (r["user_id"], r["version"], r["state"], r["n_events"],
         r["valid_from_us"], r["valid_to_us"])
        for r in batch
        if r["is_current"] == 0
    }

    d = tmp_path / "in"
    d.mkdir()
    base_us = {  # epoch micros of the handcrafted timestamps
        r["event_id"]: r["ts_us"]
        for r in _events(spark, rows)
        .select("event_id", F.unix_micros("ts").alias("ts_us"))
        .collect()
    }
    in_schema = (
        "user_id long, ts_us long, event_id long, event_type string"
    )

    out_dir = str(tmp_path / "out")

    def run_batch(name: str, part) -> list:
        """Append one file, then drain the stream with a fresh
        availableNow query over the SHARED checkpoint — deterministic
        trigger order, and each restart recovers the open-version state
        from the state store (a parquet sink, unlike memory, supports
        checkpoint recovery)."""
        (d / f"{name}.json").write_text(
            "\n".join(
                json.dumps(
                    {
                        "user_id": uid,
                        "ts_us": base_us[eid],
                        "event_id": eid,
                        "event_type": et,
                    }
                )
                for eid, _, uid, et, _ in part
            )
        )
        stream = spark.readStream.schema(in_schema).json(str(d))
        q = (
            scd2_stateful(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out_dir).collect()

    emitted = run_batch("b0", rows[:3] + rows[5:6])
    assert emitted == []  # no version closed inside batch 0
    emitted = run_batch("b1", rows[3:5] + rows[6:])
    got = {
        (r["user_id"], r["version"], r["state"], r["n_events"],
         r["valid_from_us"], r["valid_to_us"])
        for r in emitted
    }
    assert got == expected
