"""Custom Python DataSource for the news-feed pull (SURVEY §2.1 S8).

The reference fetches Google-RSS/Yahoo per ticker inside the producer
loop (producer.py:79-125) — serial, unparallel, unplannable. Here the
feed is a first-class Spark 4 Python DataSource:

- one InputPartition per ticker → fetches parallelize across executors
- the reader yields plain tuples; Spark applies the declared schema
- the backend is pluggable: this environment ships the deterministic
  synthetic backend (seeded per ticker/cycle — same fixture role as the
  reference's 3-items-per-feed slice, producer.py:97); a real HTTP
  backend drops into ``_fetch_entries`` without touching the plan.

Usage::

    spark.dataSource.register(FeedDataSource)
    df = (spark.read.format("mads_feed")
          .option("tickers", "MC.PA,AIR.PA")
          .option("items_per_ticker", "3")
          .option("cycle", "0")
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FEED_SCHEMA = (
    "ticker string, id string, title string, link string, summary string, "
    "publish_time double, type string, source string"
)

_HEADLINES = [
    "{t} shares rally on strong quarterly results",
    "Analysts raise price target for {t}",
    "{t} announces new product line",
    "Market volatility weighs on {t}",
    "{t} completes strategic acquisition",
    "Regulators review {t} filing",
]


def hash_stable(s: str) -> int:
    """FNV-1a 64-bit (process-stable, unlike builtin hash)."""
    h = 14695981039346656037
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def _fetch_entries(ticker: str, n: int, cycle: int):
    """Deterministic synthetic feed backend (stable ids, seeded order).
    Swap for a real RSS/HTTP client in production — the contract is just
    this generator."""
    base_ts = 1700000000.0 + cycle * 60.0
    seed = sum(ticker.encode()) + cycle
    for i in range(n):
        idx = (seed + i * 7) % len(_HEADLINES)
        title = _HEADLINES[idx].format(t=ticker)
        link = f"https://news.example.com/{ticker}/{cycle}/{idx}"
        yield (
            ticker,
            str(hash_stable(link)),
            title,
            link,
            f"Summary: {title}",
            base_ts - i * 300.0,
            "news",
            "google_rss",
        )


class _TickerPartition(InputPartition):
    def __init__(self, ticker: str):
        self.ticker = ticker


class FeedReader(DataSourceReader):
    def __init__(self, options):
        self.tickers = [
            t.strip() for t in options.get("tickers", "MC.PA").split(",") if t.strip()
        ]
        self.n = int(options.get("items_per_ticker", "3"))
        self.cycle = int(options.get("cycle", "0"))

    def partitions(self):
        # one partition per ticker: feed pulls parallelize across executors
        return [_TickerPartition(t) for t in self.tickers]

    def read(self, partition):
        yield from _fetch_entries(partition.ticker, self.n, self.cycle)


class FeedDataSource(DataSource):
    """``spark.read.format("mads_feed")`` — S8 as a plannable source."""

    @classmethod
    def name(cls) -> str:
        return "mads_feed"

    def schema(self) -> str:
        return FEED_SCHEMA

    def reader(self, schema):
        return FeedReader(self.options)
