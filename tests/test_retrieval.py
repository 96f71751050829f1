"""Retrieval engine end-to-end (SURVEY §3.3 steps 3–6): filter → kNN →
dedup → score → top-8 → context assembly, with the router fallback
contract and F8 regex extraction."""

from __future__ import annotations

import math

import pytest

from market_analyze_data_stream_processing_spark.operators.retrieval import (
    RouterQuery,
    assemble_context,
    retrieve,
    with_summary_extraction,
)

NOW = 1700000000.0


def _doc(i, ticker, dtype, ts, vec, document, sentiment=0.0, **extra):
    base = dict(
        id=f"D{i}", ticker=ticker, type=dtype, timestamp=float(ts),
        embedding=[float(x) for x in vec], document=document,
        sentiment=float(sentiment), current_price=100.0, price_10min_ago=99.0,
        price_1h_ago=98.0, mean_50=95.0, mean_200=90.0, currency="EUR",
        link="#",
    )
    base.update(extra)
    return base


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        _doc(1, "MC.PA", "news", NOW - 1000, [1, 0, 0, 0], "LVMH rallies", 0.8),
        _doc(2, "MC.PA", "news", NOW - 50000, [0.9, 0.1, 0, 0], "LVMH older news"),
        # same dedup key (ticker, int(ts), type) as doc 1 but lower sim
        _doc(3, "MC.PA", "news", NOW - 1000, [0.5, 0.5, 0, 0], "dup-key doc"),
        _doc(4, "AIR.PA", "news", NOW - 2000, [0.8, 0.2, 0, 0], "Airbus story"),
        _doc(5, "MC.PA", "daily_summary", NOW - 3000, [0.7, 0.3, 0, 0],
             "Open: 101.5\nHigh: 103.0\nLow: 100.0\nClose: 102.5\nVariation: 0.99\nVolume: 12345"),
        _doc(6, "MC.PA", "technical", NOW - 4000, [0.6, 0.4, 0, 0], "MA cross detected"),
        _doc(7, "MC.PA", "intraday_metrics", NOW - 500, [0.65, 0.35, 0, 0], "metrics"),
        # outside every time window used below
        _doc(8, "MC.PA", "news", NOW - 10 * 86400, [1, 0, 0, 0], "ancient"),
    ]
    return spark.createDataFrame(rows)


QV = [1.0, 0.0, 0.0, 0.0]


def test_fallback_router_window_and_dedup(docs):
    route = RouterQuery.fallback(NOW)
    assert route.intent == "REAL_TIME" and route.ticker is None
    out = retrieve(docs, QV, route, NOW).collect()
    ids = [r["id"] for r in out]
    assert "D8" not in ids          # outside 24h fallback window
    assert "D3" not in ids          # dedup key collision: D1 (higher sim) kept
    assert "D1" in ids and "D4" in ids  # no ticker filter → both tickers


def test_ticker_filter_and_time_window(docs):
    route = RouterQuery("MC.PA", NOW - 5000, NOW, "REAL_TIME")
    ids = {r["id"] for r in retrieve(docs, QV, route, NOW).collect()}
    assert "D4" not in ids  # other ticker
    assert "D2" not in ids  # outside window
    assert {"D1", "D5", "D6", "D7"} <= ids


def test_score_blend_and_historical_switch(docs):
    rt = retrieve(docs, QV, RouterQuery(None, NOW - 86400, NOW, "REAL_TIME"), NOW)
    hist = retrieve(docs, QV, RouterQuery(None, NOW - 86400, NOW, "HISTORICAL"), NOW)
    r_rt = {r["id"]: r for r in rt.collect()}
    r_h = {r["id"]: r for r in hist.collect()}
    # HISTORICAL: score == sim exactly (rag_engine.py:155-156)
    for rid, row in r_h.items():
        assert row["score"] == pytest.approx(row["sim"], abs=1e-9)
    # REAL_TIME: 0.6*sim + 0.4*exp(-age/14400)
    d1 = r_rt["D1"]
    expect = 0.6 * d1["sim"] + 0.4 * math.exp(-1000 / 14400)
    assert d1["score"] == pytest.approx(expect, abs=1e-9)


def test_summary_regex_extraction(docs):
    out = {r["id"]: r for r in with_summary_extraction(docs).collect()}
    d5 = out["D5"]
    assert d5["opening_price"] == 101.5 and d5["closing_price"] == 102.5
    assert d5["high_price"] == 103.0 and d5["low_price"] == 100.0
    assert d5["variation_pct"] == pytest.approx(0.99)
    assert d5["volume"] == 12345
    assert out["D1"]["opening_price"] is None  # non-summary rows untouched


def test_context_assembly_typed_blocks_and_dominant_ticker(docs):
    route = RouterQuery("MC.PA", NOW - 5000, NOW, "REAL_TIME")
    top = retrieve(docs, QV, route, NOW)
    ctx, dominant = assemble_context(top, route, "Monday 2023-11-14 22:13:20")
    assert dominant == "MC.PA"
    assert "USER INTENT: REAL_TIME (Window: 1.39 hours)." in ctx
    assert "[NEWS] MC.PA" in ctx
    assert "[MARKET HISTORY] MC.PA" in ctx
    assert "[TECHNICAL ANALYSIS] MC.PA" in ctx
    assert "[REAL-TIME METRICS] MC.PA" in ctx
    assert "**Live Price**: 100.00 EUR" in ctx
    assert "10m: +1.01%" in ctx  # (100-99)/99*100


def test_context_assembly_empty_window_alert(docs):
    route = RouterQuery("MC.PA", NOW - 100, NOW - 90, "REAL_TIME")
    top = retrieve(docs, QV, route, NOW)
    ctx, dominant = assemble_context(top, route, "now")
    assert "SYSTEM ALERT: No data found" in ctx
    assert dominant == "MC.PA"


def test_bm25_ranking_semantics(spark):
    """BM25 sanity on a handcrafted corpus: more occurrences of a term
    rank higher at equal length; a rarer term outweighs a common one at
    equal tf; unmatched docs are absent."""
    from market_analyze_data_stream_processing_spark.operators.retrieval import (
        bm25_scores,
    )

    rows = [
        (1, "alpha alpha alpha filler filler filler"),
        (2, "alpha filler filler filler filler filler"),
        (3, "beta filler filler filler filler filler"),   # beta is rarer
        (4, "gamma filler filler filler filler filler"),  # matches nothing
        (5, "alpha beta filler filler filler filler"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bm25_scores(
        df, ["alpha", "beta"]).collect()}
    assert 4 not in got
    assert got[1]["bm25"] > got[2]["bm25"]  # tf=3 beats tf=1, same dl
    # beta: df=2, alpha: df=3 -> beta's idf higher at equal tf and dl
    assert got[3]["bm25"] > got[2]["bm25"]
    assert got[5]["n_matched"] == 2
    # two matched terms beat either single match of the same shape
    assert got[5]["bm25"] > got[2]["bm25"] and got[5]["bm25"] > got[3]["bm25"]
