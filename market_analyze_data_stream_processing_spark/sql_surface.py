"""SQL entry point: make the whole engine drivable from ``spark.sql``.

``install(spark, sf_dir)`` registers

- every base table (``TABLE_NAMES``) as a temp view, through the same
  loaders the DataFrame API uses (so the events timestamp-encoding
  normalization applies identically in SQL),
- the Python UDTFs (``chunk_doc``),
- every registered query as a ``q_<name>`` temp view — the full
  operator catalog becomes composable SQL relations
  (``SELECT * FROM q_daily_summary JOIN ...``).

Most views are pure lazy plans: registering them costs plan
construction only, nothing executes until the view is selected from,
and Catalyst inlines a view into the consuming query (filters push
through it, columns prune through it), so querying one costs the same
as calling the DataFrame function directly. The exceptions are the
driver-probing and iterative queries (vector probes collect one row;
k-means and connected components run their driver-driven stages once
at registration, and their views then serve the finished, materialized
plan — including the checkpointed state it references, which stays
cached for the session because the view depends on it). This is the
batch stand-in for a catalog: at 100 TB the same body would issue
``CREATE VIEW`` against a metastore once, not per session.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .functions.udtfs import register_udtfs
from .plans import QUERIES
from .sources.tables import TABLE_NAMES, load_table


def install(spark: SparkSession, sf_dir: str, queries: bool = True) -> list[str]:
    """Register the engine's SQL surface on ``spark``; returns the view
    names created. ``queries=False`` registers only base tables + UDTFs
    (for users bringing their own SQL)."""
    created = []
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        created.append(t)
    register_udtfs(spark)
    if queries:
        for name, q in QUERIES.items():
            q.fn(spark, sf_dir).createOrReplaceTempView(name)
            created.append(name)
    return created
