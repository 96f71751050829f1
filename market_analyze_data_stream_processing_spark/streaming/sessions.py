"""Streaming session windows (SURVEY §2.9's sessionization in its
streaming-native form): Spark's built-in ``session_window`` merges
events separated by less than the gap into one growing window; the
watermark both bounds state and decides when a session is FINAL.

This deliberately uses the ENGINE's session operator, not the batch
gap-flag lowering in plans/advanced.q_sessionize — the two are twins:
the batch form replays history, this form maintains open sessions in
the state store and appends each session exactly once when the
watermark passes its end. Merging of out-of-order events into one
session (including sessions that BRIDGE micro-batches) is the
engine-level behavior pinned by tests/test_sessions_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Append-mode session aggregation: one row per closed session with
    its span, event count, and value sum. State per key is the set of
    OPEN sessions only — the watermark evicts closed ones, so state is
    bounded by activity recency, not stream length."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).alias("total_value"),
        )
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
