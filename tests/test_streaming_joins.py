"""Stream-stream interval join and streaming session windows — the
Structured Streaming capabilities beyond the reference's surface
(SURVEY §2.9 notes them as absent there; first-class here)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write(d, name, rows):
    (d / name).write_text("\n".join(json.dumps(r) for r in rows))


def _stream(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .json(str(path))
        .withColumn("ts", F.to_timestamp("ts"))
    )


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchases joined to the same user's clicks within the preceding
    30 minutes — watermarked stream-stream join, append output."""
    d = tmp_path / "ev"
    d.mkdir()
    _write(d, "a.json", [
        {"event_id": 1, "user_id": 7, "event_type": "click", "ts": "2024-01-01 10:00:00", "value": 1.0},
        {"event_id": 2, "user_id": 7, "event_type": "purchase", "ts": "2024-01-01 10:10:00", "value": 50.0},
        {"event_id": 3, "user_id": 7, "event_type": "purchase", "ts": "2024-01-01 11:30:00", "value": 60.0},
        {"event_id": 4, "user_id": 8, "event_type": "click", "ts": "2024-01-01 10:05:00", "value": 2.0},
        # advance both watermarks far enough to emit
        {"event_id": 5, "user_id": 9, "event_type": "click", "ts": "2024-01-01 14:00:00", "value": 0.0},
        {"event_id": 6, "user_id": 9, "event_type": "purchase", "ts": "2024-01-01 14:00:01", "value": 0.0},
    ])
    src = _stream(spark, d)
    clicks = (
        src.where("event_type = 'click'")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        src.where("event_type = 'purchase'")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "c_user = p_user AND c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts < p_ts"
        ),
    )
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = {(r["purchase_id"], r["click_id"]) for r in spark.read.parquet(out).collect()}
    assert (2, 1) in pairs      # click 10:00 precedes purchase 10:10 by <30m
    assert (3, 1) not in pairs  # 11:30 purchase is outside the window
    assert all(p != 2 or c != 4 for p, c in pairs)  # cross-user never joins


def test_streaming_session_window_matches_batch_sessionize(spark, tmp_path):
    """session_window(gap=30m) in Structured Streaming produces the same
    (user, n_events) sessions as the batch gap-based sessionization."""
    d = tmp_path / "sess"
    d.mkdir()
    rows = [
        {"event_id": 1, "user_id": 1, "event_type": "e", "ts": "2024-01-01 10:00:00", "value": 0.0},
        {"event_id": 2, "user_id": 1, "event_type": "e", "ts": "2024-01-01 10:10:00", "value": 0.0},
        {"event_id": 3, "user_id": 1, "event_type": "e", "ts": "2024-01-01 12:00:00", "value": 0.0},
        {"event_id": 4, "user_id": 2, "event_type": "e", "ts": "2024-01-01 10:00:00", "value": 0.0},
        # closer: push the watermark past every session end
        {"event_id": 5, "user_id": 3, "event_type": "e", "ts": "2024-01-02 00:00:00", "value": 0.0},
    ]
    _write(d, "a.json", rows)
    stream = _stream(spark, d).withWatermark("ts", "10 minutes")
    sess = (
        stream.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = str(tmp_path / "outs")
    q = (
        sess.writeStream.format("parquet").outputMode("append")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cps"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    # user 1: one 2-event session (10:00+10:10) and one 1-event (12:00);
    # user 2: one 1-event session
    assert (1, 2) in got and (1, 1) in got and (2, 1) in got
