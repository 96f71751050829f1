"""P2 coercion, id synthesis, enrichment UDFs (SURVEY §2.2/2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.enrich import (
    EMBEDDING_DIM,
    embed_text_expr,
    make_embedding_udf,
    make_sentiment_udf,
    make_translation_udf,
    sentiment_text_expr,
)
from market_analyze_data_stream_processing_spark.schemas import NEWS_DOC_SCHEMA
from market_analyze_data_stream_processing_spark.sources.json_topics import (
    clean_metadata,
    drop_empty_titles,
    synthesize_doc_id,
)


@pytest.fixture(scope="module")
def raw_docs(spark):
    rows = [
        # well-formed news
        {"id": "abc", "ticker": "MC.PA", "title": "LVMH gains", "type": "news",
         "publish_time": 1700000000.0, "timestamp": 0.0, "current_price": 700.5,
         "link": "http://x", "source": "google_rss", "summary": "LVMH up strongly"},
        # missing nearly everything → defaults
        {"title": "Mystery doc"},
        # technical doc → LATEST_TECH id
        {"ticker": "AIR.PA", "title": "Technical Analysis AIR.PA (BULLISH)",
         "type": "technical", "publish_time": 1700000100.0, "mean_50": 130.0},
        # daily summary → date-keyed id
        {"ticker": "AIR.PA", "title": "Summary", "type": "daily_summary",
         "publish_time": 1700006400.0},
        # empty title → dropped by guard
        {"ticker": "X", "title": ""},
    ]
    import json

    jdf = spark.createDataFrame([(json.dumps(r),) for r in rows], ["value"])
    return jdf.select(F.from_json("value", NEWS_DOC_SCHEMA).alias("v")).select("v.*")


def test_clean_metadata_defaults_and_backfill(raw_docs):
    out = clean_metadata(drop_empty_titles(raw_docs), sentiment=F.lit(0.5))
    rows = {r["doc"]: r for r in out.collect()}
    m = rows["Mystery doc"]
    assert m["ticker"] == "UNKNOWN" and m["type"] == "news" and m["source"] == "unknown"
    assert m["link"] == "#" and m["market_state"] == "REGULAR" and m["currency"] == "UKN"
    assert m["current_price"] == 0.0 and m["timestamp"] == 0.0
    n = rows["LVMH gains"]
    # timestamp := publish_time backfill (consumer.py:79-80)
    assert n["timestamp"] == 1700000000.0
    assert n["sentiment"] == 0.5


def test_doc_id_synthesis_ladder(raw_docs):
    out = synthesize_doc_id(drop_empty_titles(raw_docs))
    ids = {r["title"]: r["id"] for r in out.collect()}
    assert ids["LVMH gains"] == "NEWS_MC.PA_abc"
    assert ids["Technical Analysis AIR.PA (BULLISH)"] == "LATEST_TECH_AIR.PA"
    assert ids["Summary"].startswith("DAILY_SUMMARY_AIR.PA_2023-11-")
    assert ids["Mystery doc"].startswith("NEWS_UNKNOWN_")  # stable hash fallback


def test_embedding_udf_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [("MC.PA", "LVMH gains"), ("MC.PA", "LVMH gains"), ("AIR.PA", "Airbus falls")],
        ["ticker", "title"],
    )
    emb = make_embedding_udf()
    out = df.select(emb(embed_text_expr()).alias("e")).collect()
    assert all(len(r["e"]) == EMBEDDING_DIM for r in out)
    assert out[0]["e"] == out[1]["e"]  # deterministic
    assert out[0]["e"] != out[2]["e"]  # text-sensitive
    norms = [sum(x * x for x in r["e"]) for r in out]
    assert all(abs(n - 1.0) < 1e-3 for n in norms)  # unit-normalized


def test_sentiment_udf_polarity(spark):
    df = spark.createDataFrame(
        [("t1", "record gains strong growth rally", None, None),
         ("t2", "crash losses decline warning", None, None),
         ("t3", "the report was published", None, None)],
        "k string, title string, summary string, content string",
    )
    sent = make_sentiment_udf()
    out = {r["k"]: r["s"] for r in df.select("k", sent(sentiment_text_expr()).alias("s")).collect()}
    assert out["t1"] > 0 and out["t2"] < 0
    assert -1.0 <= min(out.values()) and max(out.values()) <= 1.0


def test_sentiment_text_selection_prefers_content(spark):
    df = spark.createDataFrame(
        [("T", "s", "c"), ("T", "s", None), ("T", None, None)],
        ["title", "summary", "content"],
    )
    got = [r["x"] for r in df.select(sentiment_text_expr().alias("x")).collect()]
    assert got == ["T. c", "s", "T"]


def test_translation_udf_identity_fallback(spark):
    df = spark.createDataFrame([("bonjour",), ("hello",)], ["t"])
    tr = make_translation_udf({"bonjour": "hello"})
    got = [r["x"] for r in df.select(tr("t").alias("x")).collect()]
    assert got == ["hello", "hello"]


def test_parse_date_flexible_formats_and_null(spark):
    from market_analyze_data_stream_processing_spark.functions.scalars import (
        parse_date_flexible,
    )

    df = spark.createDataFrame(
        [("2024-01-02 03:04:05",), ("2024-01-02T03:04:05",), ("2024-01-02 03:04",),
         ("2024-01-02",), ("garbage",)],
        "d string",
    )
    got = [r["e"] for r in df.select(parse_date_flexible(F.col("d")).alias("e")).collect()]
    assert got[0] == got[1] == 1704164645
    assert got[2] == 1704164640 and got[3] == 1704153600
    assert got[4] is None  # no format matches -> NULL (vs reference raise)


def test_url_encode_and_fixed2(spark):
    from market_analyze_data_stream_processing_spark.functions.scalars import (
        format_fixed2,
        url_encode,
    )

    df = spark.createDataFrame([("LVMH stock news", 12.345), ("a&b=c", float("nan"))],
                               "q string, v double")
    rows = df.select(url_encode(F.col("q")).alias("u"),
                     format_fixed2(F.col("v")).alias("f")).collect()
    assert rows[0]["u"] == "LVMH+stock+news" and rows[0]["f"] == "12.35"
    assert rows[1]["u"] == "a%26b%3Dc" and rows[1]["f"] == "N/A"


def test_chunk_doc_udtf_matches_expression_form(spark):
    """The Python UDTF surface (Spark 4 table functions): lateral join
    over docs yields the same chunks as the pure-expression chunker for
    full windows, and is SQL-callable after registration."""
    from pyspark.sql import functions as F

    from market_analyze_data_stream_processing_spark.functions.udtfs import (
        ChunkDocUDTF,
        register_udtfs,
    )

    text = " ".join(f"w{i}" for i in range(110))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = (
        df.lateralJoin(ChunkDocUDTF(F.col("text").outer(), F.lit(50), F.lit(40)))
        .select("doc_id", "chunk_idx", "n_tokens")
        .collect()
    )
    # 110 tokens, size 50, stride 40 -> windows at 0, 40, 80
    assert [(r["chunk_idx"], r["n_tokens"]) for r in out] == [(0, 50), (1, 50), (2, 30)]

    register_udtfs(spark)
    df.createOrReplaceTempView("udtf_docs")
    n = spark.sql(
        "SELECT c.* FROM udtf_docs, LATERAL chunk_doc(text, 50, 40) c"
    ).count()
    assert n == 3
