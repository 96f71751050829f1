"""Message synthesis (SURVEY.md §3.1 inversion): the reference computes
daily summaries / intraday momentum / technical analyses INSIDE the
producer with pandas loops (producer.py:154-332); here the same payloads
are derived FROM the bar tables as declarative plans, so one code path
serves backfill (batch over history) and live (foreachBatch over the
bar stream).

Text templates are byte-compatible with the reference so downstream
regex extraction (rag_engine.py:292-317 = retrieval.with_summary_
extraction) round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import pct_change
from .analytics import MOMENTUM_LAGS, latest_per_key, with_moving_averages, with_trend


def daily_summary_messages(
    bars: DataFrame,
    key: str = "ticker",
    order: str = "date",
    publish_time=None,
) -> DataFrame:
    """producer.py:154-199: per-ticker latest bar + previous close →
    `daily-summary` payload. Count guard: needs ≥2 bars (A9)."""
    w = Window.partitionBy(key).orderBy(order)
    cnt = Window.partitionBy(key)
    enriched = (
        bars.withColumn("prev_close", F.lag("Close").over(w))
        .withColumn("__n", F.count(F.lit(1)).over(cnt))
        .where(F.col("__n") >= 2)
    )
    latest = latest_per_key(enriched, key, order).where(F.col("prev_close").isNotNull())
    variation = pct_change(F.col("Close"), F.col("prev_close"))
    # NULL-total rendering: a missing O/C/H/L nulls the WHOLE summary —
    # SQL string concatenation propagates NULL, while Spark's
    # format_string would render a NULL %.2f as the garbage string
    # 'nu'. One isNotNull gate makes both engines (and any reader)
    # agree that a day with missing bar fields has no renderable body.
    fields_ok = (
        F.col("Open").isNotNull()
        & F.col("Close").isNotNull()
        & F.col("Low").isNotNull()
        & F.col("High").isNotNull()
    )
    summary_text = F.when(fields_ok, F.concat(
        F.lit("Daily Summary for "), F.col(key), F.lit(":\n"),
        F.lit("- Open: "), F.format_string("%.2f", F.col("Open")), F.lit("\n"),
        F.lit("- Close: "), F.format_string("%.2f", F.col("Close")), F.lit("\n"),
        F.lit("- Variation: "), F.format_string("%.2f", variation), F.lit("%\n"),
        F.lit("- Volume: "), F.col("Volume").cast("long").cast("string"), F.lit("\n"),
        F.lit("- Low: "), F.format_string("%.2f", F.col("Low")), F.lit("\n"),
        F.lit("- High: "), F.format_string("%.2f", F.col("High")), F.lit("\n"),
    ))
    pt = publish_time if publish_time is not None else F.unix_timestamp()
    return latest.select(
        F.col(key).alias("ticker"),
        F.concat(F.lit("Daily Summary "), F.col(key)).alias("title"),
        summary_text.alias("summary"),
        summary_text.alias("content"),
        F.concat(F.lit("https://finance.yahoo.com/quote/"), F.col(key)).alias("link"),
        pt.cast("long").alias("publish_time"),
        F.lit("daily_summary").alias("type"),
        F.lit("system_summary").alias("source"),
    )


def intraday_metrics_messages(
    bars_5min: DataFrame,
    key: str = "ticker",
    order: str = "bar_ts",
    publish_time=None,
    currency: str = "EUR",
) -> DataFrame:
    """producer.py:207-269: multi-lag momentum over 5-min bars → the
    `hot-news-events` payload, including the 🟩/🟥/⬜ momentum text and
    price_{label}_ago fields with 0.0 insufficient-history fallback."""
    w = Window.partitionBy(key).orderBy(order)
    enriched = bars_5min
    text = F.concat(
        F.lit("Momentum Analysis "), F.col(key),
        F.format_string(" (Price: %.2f):\n", F.col("Close")),
    )
    out_cols = {}
    for label, n in MOMENTUM_LAGS.items():
        past = F.lag("Close", n).over(w)
        var = pct_change(F.col("Close"), past)
        emoji = (
            F.when(var > 0, "\U0001f7e9").when(var < 0, "\U0001f7e5").otherwise("⬜")
        )
        # reference emits the line only when enough history exists
        line = F.when(
            past.isNotNull(),
            F.concat(
                F.lit(f"- {label}:  "), emoji, F.format_string(" %.2f%%\n", var)
            ),
        ).otherwise(F.lit(""))
        text = F.concat(text, line)
        out_cols[f"price_{label.replace('min', 'min')}_ago"] = F.coalesce(
            past, F.lit(0.0)
        )
    latest = latest_per_key(enriched.withColumn("__text", text)
                            .withColumns({k: v for k, v in out_cols.items()}),
                            key, order)
    pt = publish_time if publish_time is not None else F.unix_timestamp()
    return latest.select(
        F.col(key).alias("ticker"),
        F.concat(F.lit("Momentum Intraday "), F.col(key)).alias("title"),
        F.col("__text").alias("summary"),
        F.col("__text").alias("content"),
        pt.cast("long").alias("publish_time"),
        F.lit("intraday_metrics").alias("type"),
        F.lit("system_metrics").alias("source"),
        F.col("Close").alias("current_price"),
        *[F.col(c).alias(c) for c in out_cols],
        F.lit(currency).alias("currency"),
        F.concat(F.lit("LATEST_METRICS_"), F.col(key)).alias("id"),
    )


def technical_messages(
    daily_bars: DataFrame,
    key: str = "ticker",
    order: str = "date",
    publish_time=None,
    currency: str = "EUR",
) -> DataFrame:
    """producer.py:271-332: MA10/50/200 + trend over daily bars → the
    `financial-news` technical payload. NaN→0.0 parity for unfilled
    MA10/MA200 (producer.py:325-327 coerces those); MA50 is NOT coerced
    in the reference (producer.py:326), so it follows raw
    rolling(50).mean() semantics — NaN until 50 bars, trend NEUTRAL and
    text 'nan' for young series."""
    mas = with_moving_averages(
        daily_bars, value_col="Close", key=key, order=order, windows=(50,),
        strict=True,
    )
    gated = with_moving_averages(
        mas, value_col="Close", key=key, order=order, windows=(10, 200), min_fill=True
    )
    latest = latest_per_key(gated, key, order)
    latest = with_trend(latest, value_col="Close", ma_col="ma50")
    # Python renders f"{nan:.2f}" as lowercase 'nan'; Java's %.2f gives
    # 'NaN' — special-case for byte parity with the reference text.
    ma50_txt = F.when(F.isnan(F.col("ma50")), F.lit("MA 50d: nan. ")).otherwise(
        F.format_string("MA 50d: %.2f. ", F.col("ma50"))
    )
    tech_text = F.concat(
        F.lit("Technical Analysis "), F.col(key),
        F.format_string(".  Price: %.2f. ", F.col("Close")),
        F.lit("Medium Term Trend (MA50): "), F.col("trend"), F.lit(". "),
        ma50_txt,
        F.format_string("MA 200d: %.2f.", F.col("ma200")),
    )
    pt = publish_time if publish_time is not None else F.unix_timestamp()
    return latest.select(
        F.col(key).alias("ticker"),
        F.concat(
            F.lit("Technical Analysis "), F.col(key), F.lit(" ("), F.col("trend"), F.lit(")")
        ).alias("title"),
        tech_text.alias("summary"),
        tech_text.alias("content"),
        pt.cast("long").alias("publish_time"),
        F.lit("technical").alias("type"),
        F.col("Close").alias("current_price"),
        F.col("ma10").alias("mean_10"),
        F.col("ma50").alias("mean_50"),
        F.col("ma200").alias("mean_200"),
        F.lit(currency).alias("currency"),
        F.concat(F.lit("LATEST_TECH_"), F.col(key)).alias("id"),
    )


def to_kafka_frame(df: DataFrame, topic: str, key_col: str = "ticker") -> DataFrame:
    """S1 producer sink shape (producer.py:62-75): JSON-encode the full
    payload as `value`, UTF-8 key column, topic column — ready for
    `.writeStream.format("kafka")` (or batch `.write.format("kafka")`)."""
    payload_cols = [c for c in df.columns]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
        F.lit(topic).alias("topic"),
    )
