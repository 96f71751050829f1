"""Pin the S1/S2 Kafka config surface (SURVEY.md §2.1).

No broker or kafka connector jar exists in this environment, so the real
transport can't be exercised — these tests EXECUTE (never skip) and pin
everything up to the wire instead: the exact option maps the source and
sink builders hand to Spark (reference `src/processing/consumer.py:197-208`,
`src/ingestion/producer.py:62-75`), the wire frame's schema/payload
contract, and the fact that the builders reach Spark's data-source
resolution (the failure is "kafka source not found", never a config or
plan error). A deployment that adds the connector jar changes nothing in
this code path but the resolution outcome.
"""

from __future__ import annotations

import json

import pytest

from market_analyze_data_stream_processing_spark.operators.messages import (
    to_kafka_frame,
)
from market_analyze_data_stream_processing_spark.streaming.ingest import (
    TOPICS,
    kafka_sink_options,
    kafka_source_options,
    kafka_topic_stream,
)


def test_source_options_default_subscribes_all_four_topics():
    opts = kafka_source_options("broker-1:9092,broker-2:9092")
    assert opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        # registration order of config.py:8-11's topic names
        "subscribe": "financial-news,stock-history,hot-news-events,daily-summary",
        "startingOffsets": "earliest",
    }


def test_source_options_explicit_topics_and_offsets():
    opts = kafka_source_options(
        "localhost:9092", topics=[TOPICS["history"]], starting_offsets="latest"
    )
    assert opts["subscribe"] == "stock-history"
    assert opts["startingOffsets"] == "latest"
    # No stray keys: exactly the three options the kafka source needs.
    assert set(opts) == {
        "kafka.bootstrap.servers", "subscribe", "startingOffsets",
    }


def test_sink_options(tmp_path):
    opts = kafka_sink_options("localhost:9092", str(tmp_path / "ckpt"))
    assert opts == {
        "kafka.bootstrap.servers": "localhost:9092",
        "checkpointLocation": str(tmp_path / "ckpt"),
    }


def test_wire_frame_schema_and_payload(spark):
    df = spark.createDataFrame(
        [("AAPL", 1.5, "up")], "ticker string, close double, trend string"
    )
    wire = to_kafka_frame(df, topic="daily-summary")
    # The kafka sink requires exactly these columns; key/value must be
    # string (or binary) and topic routes per-row.
    assert [(f.name, f.dataType.simpleString()) for f in wire.schema.fields] == [
        ("key", "string"), ("value", "string"), ("topic", "string"),
    ]
    row = wire.first()
    assert row["key"] == "AAPL" and row["topic"] == "daily-summary"
    # value is JSON carrying EVERY payload column.
    assert json.loads(row["value"]) == {
        "ticker": "AAPL", "close": 1.5, "trend": "up",
    }


def test_source_builder_reaches_datasource_resolution(spark):
    """kafka_topic_stream must fail ONLY at connector lookup here — any
    earlier error (bad option name, malformed plan) or later success
    would mean the builder drifted from the real kafka source contract."""
    with pytest.raises(Exception) as ei:
        kafka_topic_stream(spark, "localhost:9092")
    msg = str(ei.value)
    assert "kafka" in msg.lower()
    assert "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg
