"""Top-level RAG entry point (SURVEY §3.3 end-to-end with injected seams)."""

from __future__ import annotations

import pandas as pd
import pytest

from market_analyze_data_stream_processing_spark.operators.enrich import (
    _hash_projection_embed,
)
from market_analyze_data_stream_processing_spark.operators.retrieval import RouterQuery
from market_analyze_data_stream_processing_spark.rag import get_answer

NOW = 1700000000.0


@pytest.fixture(scope="module")
def docs(spark):
    def emb(text):
        return [float(x) for x in _hash_projection_embed(pd.Series([text]), dim=16)[0]]

    rows = [
        dict(id="D1", ticker="MC.PA", type="news", timestamp=NOW - 900,
             embedding=emb("LVMH record quarter"), document="LVMH record quarter",
             sentiment=0.7, link="#", current_price=700.0, price_10min_ago=699.0,
             price_1h_ago=690.0, mean_50=650.0, mean_200=600.0, currency="EUR"),
        dict(id="D2", ticker="MC.PA", type="daily_summary", timestamp=NOW - 3600,
             embedding=emb("daily summary"), sentiment=0.0, link="#",
             document="Open: 701.00\nClose: 706.00\nVariation: 0.71\nVolume: 5000",
             current_price=0.0, price_10min_ago=0.0, price_1h_ago=0.0,
             mean_50=0.0, mean_200=0.0, currency="EUR"),
        dict(id="D3", ticker="AIR.PA", type="news", timestamp=NOW - 100 * 86400,
             embedding=emb("ancient airbus"), document="ancient", sentiment=0.0,
             link="#", current_price=0.0, price_10min_ago=0.0, price_1h_ago=0.0,
             mean_50=0.0, mean_200=0.0, currency="EUR"),
    ]
    return spark.createDataFrame(rows)


def _embed(text):
    return [float(x) for x in _hash_projection_embed(pd.Series([text]), dim=16)[0]]


def test_get_answer_default_router_and_context(docs):
    res = get_answer(docs, "What about LVMH today?", embed_query=_embed, now=NOW)
    assert res.dominant_ticker == "MC.PA"
    assert res.horizon_seconds == 86400.0  # fallback 24h window
    assert "ancient" not in res.context  # outside window
    assert "[NEWS] MC.PA" in res.context
    assert "[MARKET HISTORY] MC.PA" in res.context
    assert res.answer == res.context  # llm=None contract
    # sources carry the regex-extracted OHLC for the summary doc
    summary_src = [s for s in res.sources if s["type"] == "daily_summary"][0]
    assert summary_src["opening_price"] == 701.0 and summary_src["volume"] == 5000


def test_get_answer_with_router_and_llm(docs):
    def router(text, now):
        return RouterQuery("MC.PA", NOW - 7200, NOW, "HISTORICAL")

    def llm(context, query):
        return f"ANSWER({len(context)} chars about {query})"

    res = get_answer(docs, "q", embed_query=_embed, router=router, llm=llm, now=NOW)
    assert res.answer.startswith("ANSWER(")
    assert res.horizon_seconds == 7200.0
    assert all(s["ticker"] == "MC.PA" for s in res.sources)
