"""Registry mapping query name → (spark_fn, oracle_sql).

``spark_fn(spark, sf_dir) -> DataFrame`` is the engine's DataFrame plan;
``oracle_sql`` is the equivalent ANSI SQL DuckDB runs on the same parquet
tables. Column names/aliases MUST match between the two — the driver's
compare sorts columns by name and hashes values.

Float discipline: every float output is ``round(x, N)`` on BOTH sides so
accumulation-order differences between engines can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
