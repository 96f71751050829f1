"""Topic-payload parsing and normalization (SURVEY.md §2.2 P1–P3, §2.8
F9/F10): ``from_json`` against the fixed StructTypes + the reference's
``clean_metadata`` coercion (consumer.py:50-84) and doc-id synthesis
ladder (consumer.py:143-155) as pure Column expressions.

Everything here is a select over a parsed stream — identical code path
for batch replay and Structured Streaming micro-batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import DOC_FLOAT_KEYS, DOC_STRING_DEFAULTS


def clean_metadata(df: DataFrame, sentiment: Column | None = None) -> DataFrame:
    """The reference's coercion-on-write schema enforcement as one select
    (consumer.py:50-84):

    - strings: cast + default when NULL (``UNKNOWN``/``news``/… ladder)
    - ``doc`` = title truncated to 150 chars, '' when missing
    - floats: try_cast else 0.0 (also for '' and unparseable)
    - timestamp := publish_time when 0 and publish_time > 0
    - sentiment column attached (caller supplies the scored column)
    """
    cols: list[Column] = []
    for key, default in DOC_STRING_DEFAULTS.items():
        src = F.col(key) if key in df.columns else F.lit(None).cast("string")
        cols.append(F.coalesce(src.cast("string"), F.lit(default)).alias(key))
    title = F.col("title") if "title" in df.columns else F.lit(None).cast("string")
    cols.append(F.substring(F.coalesce(title.cast("string"), F.lit("")), 1, 150).alias("doc"))
    for key in DOC_FLOAT_KEYS:
        src = F.col(key) if key in df.columns else F.lit(None)
        cols.append(F.coalesce(src.try_cast("double"), F.lit(0.0)).alias(key))

    keep = [c for c in df.columns if c in ("id", "title", "summary", "content", "publisher")]
    out = df.select(*keep, *cols)
    out = out.withColumn(
        "timestamp",
        F.when(
            (F.col("timestamp") == 0.0) & (F.col("publish_time") > 0), F.col("publish_time")
        ).otherwise(F.col("timestamp")),
    )
    if sentiment is not None:
        out = out.withColumn("sentiment", sentiment.cast("double"))
    return out


def synthesize_doc_id(df: DataFrame) -> DataFrame:
    """Upsert-id ladder (consumer.py:143-155):

    - technical        → ``LATEST_TECH_{ticker}``      (live-overwrite key)
    - intraday_metrics → ``LATEST_METRICS_{ticker}``   (live-overwrite key)
    - daily_summary    → ``DAILY_SUMMARY_{ticker}_{YYYY-MM-DD of publish_time}``
    - news             → ``NEWS_{ticker}_{id or content-hash(title)}``

    Deviation from reference: the news fallback hash is ``xxhash64(title)``
    not Python ``hash(title)`` — the reference's hash is salted per
    process (different ids across restarts); ours is stable (SURVEY F9).
    """
    ticker = F.coalesce(F.col("ticker"), F.lit("UNKNOWN"))
    doc_type = F.coalesce(F.col("type"), F.lit("news"))
    day = F.from_unixtime(F.col("publish_time").cast("long"), "yyyy-MM-dd")
    news_raw = F.coalesce(
        F.col("id") if "id" in df.columns else F.lit(None).cast("string"),
        F.xxhash64(F.col("title")).cast("string"),
    )
    return df.withColumn(
        "id",
        F.when(doc_type == "technical", F.concat(F.lit("LATEST_TECH_"), ticker))
        .when(doc_type == "intraday_metrics", F.concat(F.lit("LATEST_METRICS_"), ticker))
        .when(
            doc_type == "daily_summary",
            F.concat_ws("_", F.lit("DAILY_SUMMARY"), ticker, day),
        )
        .otherwise(F.concat_ws("_", F.lit("NEWS"), ticker, news_raw)),
    )


def drop_empty_titles(df: DataFrame) -> DataFrame:
    """P3 null/empty guards (consumer.py:136-138, producer.py:396-398)."""
    return df.where(F.col("title").isNotNull() & (F.length("title") > 0))
