"""SQL surface: the engine drivable from spark.sql alone."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.sql_surface import install

SF_DIR = "/root/testdata/sf0.001"


def test_install_registers_tables_and_query_views(spark):
    created = install(spark, SF_DIR)
    # every base table and every registered query is a view
    assert "lineitem" in created and "q_daily_summary" in created
    assert len(created) >= 132  # 10 tables + 122 queries

    # base table via SQL == loader via DataFrame API
    n_sql = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    n_df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    )
    assert n_sql == n_df > 0

    # a query view is a real relation: composable, filterable
    row = spark.sql(
        "SELECT ticker, count(*) AS n FROM q_daily_summary "
        "GROUP BY ticker ORDER BY ticker LIMIT 1"
    ).first()
    assert row["n"] > 0

    # Catalyst inlines views: a filter on a view prunes the same way a
    # filter on the underlying plan would (no materialization barrier)
    plan = spark.sql(
        "SELECT * FROM q_daily_summary WHERE ticker = 'AAPL'"
    )._jdf.queryExecution().executedPlan().toString()
    assert "AAPL" in plan  # the literal reached the physical plan


def test_every_query_view_executes_under_sql(spark):
    """Full-registry sweep: SELECT through EVERY registered query view at
    sf0.001. Catalyst inlines views into the consuming statement, which
    can re-resolve/re-optimize a plan differently than executing the
    DataFrame returned by the query function — a query that only works
    when called directly (e.g. one depending on session state the view
    outlives, or on analysis that breaks under inlining) fails HERE, not
    in a user's SQL session. Schema must match the direct call; zero rows
    is a legitimate result, an exception is not."""
    from market_analyze_data_stream_processing_spark.plans import QUERIES

    install(spark, SF_DIR)
    broken = {}
    for name, q in QUERIES.items():
        try:
            got = spark.sql(f"SELECT * FROM {name} LIMIT 1")
            assert got.columns == q.fn(spark, SF_DIR).columns
            got.collect()
        except Exception as e:  # collect every breakage, then fail once
            broken[name] = repr(e)[:200]
    assert not broken, f"{len(broken)} query views broke under SQL: {broken}"


def test_udtf_callable_from_sql(spark):
    install(spark, SF_DIR, queries=False)
    rows = spark.sql(
        "SELECT c.chunk_idx, c.n_tokens FROM "
        "(SELECT 'a b c d e f g' AS text), "
        "LATERAL chunk_doc(text, 3, 2) c ORDER BY c.chunk_idx"
    ).collect()
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert rows[0]["n_tokens"] == 3
