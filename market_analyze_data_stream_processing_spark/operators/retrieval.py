"""Retrieval engine (SURVEY.md §3.3 steps 3–6): filtered kNN over the
docs table + the reference's re-rank / dedup / top-8 / context assembly
(rag_engine.py:184-342), as one declarative DataFrame query.

The LLM router (U5) and generator (U6) stay outside the engine — the
router's output is consumed here as a parameter record with the
reference's 24-hour fallback contract (rag_engine.py:137-145).

Scale: the docs table is partitioned by (type, date-bucket) in
production; the time/ticker filters prune partitions BEFORE the vector
scan (the reference's Chroma pre-ANN `where` becomes partition pruning +
parquet predicate pushdown), and top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import composite_relevance, time_decay
from ..functions.text import tokens
from ..functions.vectors import as_double, cosine_sim, lit_vector


@dataclass(frozen=True)
class RouterQuery:
    """U5 router output record (rag_engine.py:130-135)."""

    ticker: str | None
    start_timestamp: float
    end_timestamp: float
    intent: str  # REAL_TIME | HISTORICAL

    @staticmethod
    def fallback(now: float) -> "RouterQuery":
        """Router failure contract: last 24 h, any ticker, REAL_TIME
        (rag_engine.py:137-145)."""
        return RouterQuery(None, now - 86400.0, now, "REAL_TIME")


def retrieve(
    docs: DataFrame,
    query_vec: Sequence[float],
    route: RouterQuery,
    now: float,
    k: int = 20,
    top: int = 8,
) -> DataFrame:
    """Filter → cosine kNN (k=20) → dedup → score → top-8.

    Parity notes (rag_engine.py):
    - filter: timestamp BETWEEN start AND end, optional ticker $eq (:201-210)
    - dedup key (ticker, int(timestamp), type), best-similarity row kept
      (:232-239 — the reference keeps the first hit in ascending-distance
      order, i.e. highest similarity)
    - score: 0.6*sim + 0.4*exp(-age/14400); HISTORICAL → sim (:147-163)
    - top 8 by score (:252-253)
    """
    from pyspark.sql import Window

    f = docs.where(
        F.col("timestamp").between(route.start_timestamp, route.end_timestamp)
    )
    if route.ticker:
        f = f.where(F.col("ticker") == route.ticker)

    sim = cosine_sim(as_double(F.col("embedding")), lit_vector(query_vec))
    cand = (
        f.withColumn("sim", sim)
        .orderBy(F.desc("sim"), F.asc("id"))
        .limit(k)
    )

    dedup_w = Window.partitionBy(
        "ticker", F.col("timestamp").cast("long"), "type"
    ).orderBy(F.desc("sim"), F.asc("id"))
    deduped = cand.withColumn("__rn", F.row_number().over(dedup_w)).where(
        F.col("__rn") == 1
    ).drop("__rn")

    decay = time_decay(F.col("timestamp"), F.lit(float(now)))
    score = composite_relevance(F.col("sim"), decay, F.lit(route.intent))
    return (
        deduped.withColumn("score", score)
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(top)
    )


#: F8: OHLCV regex extraction from daily-summary text (rag_engine.py:292-317).
_EXTRACT_PATTERNS = {
    "opening_price": r"Open:\s*([\d\.]+)",
    "high_price": r"High:\s*([\d\.]+)",
    "low_price": r"Low:\s*([\d\.]+)",
    "closing_price": r"Close:\s*([\d\.]+)",
    "variation_pct": r"Variation:\s*([-\d\.]+)",
    "volume": r"Volume:\s*(\d+)",
}


def with_summary_extraction(df: DataFrame, doc_col: str = "document") -> DataFrame:
    """Regex OHLCV field extraction for daily_summary docs; NULL for other
    types or missing fields (the reference only sets keys on match)."""
    out = df
    for name, pat in _EXTRACT_PATTERNS.items():
        raw = F.regexp_extract(F.col(doc_col), pat, 1)
        typed = raw.cast("long") if name == "volume" else raw.cast("double")
        out = out.withColumn(
            name,
            F.when((F.col("type") == "daily_summary") & (raw != ""), typed),
        )
    return out


def with_context_block(df: DataFrame, doc_col: str = "document") -> DataFrame:
    """U8: one typed context block per doc (rag_engine.py:321-342 ladder +
    format_price_context :165-181), as a single column expression."""
    ts_str = F.from_unixtime(F.col("timestamp").cast("long"), "yyyy-MM-dd HH:mm")
    cur, p10, p1h = F.col("current_price"), F.col("price_10min_ago"), F.col("price_1h_ago")
    var10 = F.when(p10 != 0, (cur - p10) / p10 * 100).otherwise(F.lit(0.0))
    var1h = F.when(p1h != 0, (cur - p1h) / p1h * 100).otherwise(F.lit(0.0))
    metrics_block = F.concat(
        F.lit("\U0001f4ca [REAL-TIME METRICS] "), F.col("ticker"), F.lit(" @ "), ts_str,
        F.lit(":\n   - **Live Price**: "), F.format_string("%.2f", cur),
        F.lit(" "), F.coalesce(F.col("currency"), F.lit("EUR")),
        F.lit("\n   - **Momentum**: 10m: "), F.format_string("%+.2f%%", var10),
        F.lit(" | 1h: "), F.format_string("%+.2f%%", var1h),
        F.lit("\n   - **Key Levels**: MA50: "), F.format_string("%.2f", F.col("mean_50")),
        F.lit(" | MA200: "), F.format_string("%.2f", F.col("mean_200")),
    )
    technical_block = F.concat(
        F.lit("\U0001f4c8 [TECHNICAL ANALYSIS] "), F.col("ticker"), F.lit(" @ "),
        ts_str, F.lit(":\n"), F.col(doc_col),
    )
    summary_block = F.concat(
        F.lit("\U0001f5d3️ [MARKET HISTORY] "), F.col("ticker"), F.lit(" @ "),
        ts_str, F.lit(":\n"), F.col(doc_col),
    )
    news_block = F.concat(
        F.lit("\U0001f4f0 [NEWS] "), F.col("ticker"), F.lit(" @ "), ts_str,
        F.lit(" (Sentiment: "), F.format_string("%.2f", F.coalesce(F.col("sentiment"), F.lit(0.0))),
        F.lit("):\n"), F.col(doc_col),
    )
    return df.withColumn(
        "context_block",
        F.when(F.col("type") == "intraday_metrics", metrics_block)
        .when(F.col("type") == "technical", technical_block)
        .when(F.col("type") == "daily_summary", summary_block)
        .otherwise(news_block),
    )


def assemble_context(
    top_docs: DataFrame,
    route: RouterQuery,
    now_str: str,
) -> tuple[str, str | None]:
    """Final context string + dominant ticker (rag_engine.py:255-342).

    Driver-side by design: the top-8 rows are tiny; everything upstream
    (filter/kNN/score/format) ran distributed.
    """
    horizon_hours = round((route.end_timestamp - route.start_timestamp) / 3600, 2)
    header = (
        f"CURRENT SYSTEM TIME: {now_str}\n"
        f"USER INTENT: {route.intent} (Window: {horizon_hours} hours).\n\n"
    )
    rows = (
        with_context_block(top_docs)
        .orderBy(F.desc("score"), F.asc("id"))
        .select("context_block", "ticker")
        .collect()
    )
    if not rows:
        return (
            header + "SYSTEM ALERT: No data found within this specific time window.\n",
            route.ticker,
        )
    dominant = route.ticker or rows[0]["ticker"]
    return header + "\n\n".join(r["context_block"] for r in rows) + "\n\n", dominant


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 scoring of a whole corpus against a term set — the
    lexical retrieval leg a RAG stack runs beside the vector kNN
    (``knn_exact``), here as one declarative plan:

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with the Robertson idf ``ln((N-df+0.5)/(df+0.5) + 1)``.

    Plan shape, scan-out: tokenize once; (N, avgdl) is a ONE-row
    aggregate broadcast onto the stream (the scalar-subquery form — the
    allowlisted 1-row NLJ, never a real cross join); term frequencies
    come from one explode filtered TO THE QUERY TERMS at the scan (the
    filter prunes the exploded stream to |terms| matches per doc before
    any shuffle); per-term document frequencies are a |terms|-row
    aggregate joined back by broadcast. Per-doc summation casts each
    term's partial to DECIMAL(18,8) so the sum is order-insensitive —
    bit-reproducible whatever the aggregation order, same convention as
    the indicator running sums. Output: one row per document matching
    ≥1 term (doc_id, n_matched, bm25)."""
    terms = [str(t) for t in query_terms]
    toksed = docs.select(id_col, tokens(F.col(text_col)).alias("toks"))
    base = toksed.select(id_col, "toks", F.size("toks").alias("dl"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select(id_col, "dl", F.explode("toks").alias("s"))
        .where(F.col("s").isin(terms))
        .groupBy(id_col, "dl", "s")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    part = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(df_), "s")
        .crossJoin(F.broadcast(stats))
        .select(id_col, part.cast("decimal(18,8)").alias("__p"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum("__p").cast("double").alias("bm25"),
        )
    )