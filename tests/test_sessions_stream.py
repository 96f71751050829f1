"""Engine-level streaming session windows: gap merging, cross-batch
session bridging, and watermark-driven finalization (append mode)."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from market_analyze_data_stream_processing_spark.streaming.sessions import (
    sessionize_stream,
)

IN_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", StringType()),
        StructField("value", DoubleType()),
    ]
)


def test_session_window_merges_and_finalizes(spark, tmp_path):
    import os
    import time

    d = tmp_path / "in"
    d.mkdir()
    # user 1: two events 10 min apart (one session), then one 2 h later
    # (a second session). user 2: a single event. The final far-future
    # row only advances the watermark so every session closes.
    (d / "b0.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "ts": "2024-01-01 10:00:00", "value": 1.0},
                {"user_id": 1, "ts": "2024-01-01 10:10:00", "value": 2.0},
                {"user_id": 2, "ts": "2024-01-01 10:05:00", "value": 5.0},
            ]
        )
    )
    (d / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                # bridges b0's open session for user 1 (within the 30-min gap)
                {"user_id": 1, "ts": "2024-01-01 10:25:00", "value": 4.0},
                {"user_id": 1, "ts": "2024-01-01 12:30:00", "value": 8.0},
            ]
        )
    )
    (d / "b2.json").write_text(
        json.dumps({"user_id": 99, "ts": "2024-01-02 12:00:00", "value": 0.0})
    )
    now = time.time()
    for i, f in enumerate(["b0.json", "b1.json", "b2.json"]):
        os.utime(d / f, (now + i, now + i))

    stream = (
        spark.readStream.schema(IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    stream = stream.withColumn("ts", stream["ts"].cast("timestamp"))
    q = (
        sessionize_stream(stream, gap="30 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sessions_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM sessions_sink ORDER BY user_id, session_start"
    ).collect()
    closed = [(r["user_id"], r["n_events"], r["total_value"]) for r in rows]
    # user 1 session A: events at 10:00/10:10/10:25 MERGED across the
    # micro-batch boundary (3 events, value 7); session B: the 12:30
    # single (1 event, value 8); user 2: one single-event session.
    assert (1, 3, 7.0) in closed
    assert (1, 1, 8.0) in closed
    assert (2, 1, 5.0) in closed
    # session A spans first to last event + gap extension at the end
    a = [r for r in rows if r["user_id"] == 1 and r["n_events"] == 3][0]
    assert a["session_start"].isoformat() == "2024-01-01T10:00:00"
    assert a["session_end"].isoformat() == "2024-01-01T10:55:00"  # 10:25 + 30m
