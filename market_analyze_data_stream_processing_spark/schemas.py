"""Fixed StructTypes for the four topic payloads and the two stored
tables (FIXTURES.md §1–2; the reference's ad-hoc dicts made explicit).

The reference enforces schema by coercion-on-write (consumer.py:50-84);
here every stream is parsed against an explicit StructType and then
normalized by ``sources.json_topics.clean_metadata`` — same observable
semantics, but Catalyst-checked end to end.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _fields(spec: dict[str, object]) -> list[StructField]:
    return [StructField(k, v, True) for k, v in spec.items()]


#: stock-history: one OHLCV bar per message (producer.py:138-146).
STOCK_HISTORY_SCHEMA = StructType(
    _fields(
        {
            "ticker": StringType(),
            "date": StringType(),
            "Open": DoubleType(),
            "High": DoubleType(),
            "Low": DoubleType(),
            "Close": DoubleType(),
            "Volume": LongType(),
        }
    )
)

#: Superset schema for the three document-bearing topics (financial-news,
#: hot-news-events, daily-summary). The reference's payloads share one
#: shape with type-specific optional fields (producer.py:106-117, 243-269,
#: 316-332, 183-193); a single permissive StructType + per-type filters
#: replaces the reference's per-topic dict handling.
NEWS_DOC_SCHEMA = StructType(
    _fields(
        {
            "id": StringType(),
            "ticker": StringType(),
            "title": StringType(),
            "publisher": StringType(),
            "link": StringType(),
            "summary": StringType(),
            "content": StringType(),
            "publish_time": DoubleType(),
            "type": StringType(),
            "source": StringType(),
            "market_state": StringType(),
            "currency": StringType(),
            "current_price": DoubleType(),
            "mean_10": DoubleType(),
            "mean_50": DoubleType(),
            "mean_200": DoubleType(),
            "last_close": DoubleType(),
            "opening_price": DoubleType(),
            "price_12h_ago": DoubleType(),
            "price_6h_ago": DoubleType(),
            "price_3h_ago": DoubleType(),
            "price_1h_ago": DoubleType(),
            "price_30min_ago": DoubleType(),
            "price_10min_ago": DoubleType(),
            "regularMarketTime": DoubleType(),
            "timestamp": DoubleType(),
        }
    )
)

#: The 15 metadata keys coerced to float-with-0.0-default
#: (consumer.py:62-77 float_keys list, order preserved).
DOC_FLOAT_KEYS = [
    "publish_time",
    "current_price",
    "mean_200",
    "mean_50",
    "mean_10",
    "price_12h_ago",
    "price_6h_ago",
    "price_3h_ago",
    "price_1h_ago",
    "price_30min_ago",
    "price_10min_ago",
    "last_close",
    "opening_price",
    "regularMarketTime",
    "timestamp",
]

#: String metadata keys and their coercion defaults (consumer.py:54-60).
DOC_STRING_DEFAULTS = {
    "ticker": "UNKNOWN",
    "type": "news",
    "source": "unknown",
    "link": "#",
    "market_state": "REGULAR",
    "currency": "UKN",
}

#: prices table (FIXTURES.md §2.1): unique on (ticker, date), keep-last.
PRICES_SCHEMA = StructType(
    _fields(
        {
            "ticker": StringType(),
            "date": StringType(),
            "Open": DoubleType(),
            "High": DoubleType(),
            "Low": DoubleType(),
            "Close": DoubleType(),
            "Volume": LongType(),
            "ingest_seq": LongType(),  # arrival order for keep-last tiebreak
        }
    )
)

#: docs table (FIXTURES.md §2.2): the ChromaDB collection as columns.
DOCS_SCHEMA = StructType(
    _fields(
        {
            "id": StringType(),
            "embedding": ArrayType(FloatType()),
            "document": StringType(),
            "ticker": StringType(),
            "type": StringType(),
            "source": StringType(),
            "doc": StringType(),
            "link": StringType(),
            "market_state": StringType(),
            "currency": StringType(),
            **{k: DoubleType() for k in DOC_FLOAT_KEYS},
            "sentiment": DoubleType(),
            "ingest_seq": LongType(),
        }
    )
)
