"""Exact-moment Pearson kernel (operators/stats.py): numpy ground
truth, totality gates, complete-pairs semantics, and the Spark/SQL
snippet equivalence that keeps the two sides from drifting."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.stats import (
    corr_from_moments,
    corr_moment_aggs,
    corr_moments_sql,
    corr_value_sql,
    quantize,
    quantize_sql,
)


def _corr(spark, pairs):
    df = spark.createDataFrame(pairs, "g string, x double, y double")
    m = df.groupBy("g").agg(
        *corr_moment_aggs(
            quantize(F.col("x")), quantize(F.col("y")), "c"
        )
    )
    return {
        r["g"]: r["r"]
        for r in m.select("g", corr_from_moments("c").alias("r")).collect()
    }


def test_matches_numpy_pearson(spark):
    rng = np.random.RandomState(11)
    x = rng.randn(40)
    y = 0.6 * x + 0.4 * rng.randn(40)
    out = _corr(spark, [("a", float(a), float(b)) for a, b in zip(x, y)])
    ref = np.corrcoef(x, y)[0, 1]
    # inputs are 1e-12-quantized, so agreement is to the grid, not exact
    assert abs(out["a"] - ref) < 1e-9


def test_zero_variance_and_single_pair_are_null(spark):
    rows = (
        [("flat_x", 1.0, float(v)) for v in range(5)]
        + [("flat_y", float(v), 2.0) for v in range(5)]
        + [("single", 1.0, 2.0)]
        + [("empty", None, None)]
    )
    out = _corr(spark, rows)
    assert out == {
        "flat_x": None, "flat_y": None, "single": None, "empty": None
    }


def test_null_on_either_side_drops_the_pair(spark):
    # the (None, 99) and (99, None) rows must not leak into ANY moment:
    # the remaining complete pairs are perfectly correlated -> exactly 1
    rows = [
        ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
        ("a", None, 99.0), ("a", 99.0, None),
    ]
    out = _corr(spark, rows)
    assert abs(out["a"] - 1.0) < 1e-15


def test_sql_snippets_mirror_spark(spark):
    """The DuckDB snippets generated next to the Spark aggregates must
    produce byte-identical results on the same quantized inputs."""
    import duckdb

    rng = np.random.RandomState(3)
    rows = [
        ("g1", float(a), float(b))
        for a, b in zip(rng.randn(30), rng.randn(30))
    ] + [("g2", 5.0, float(v)) for v in range(4)]  # zero x-variance
    spark_out = _corr(spark, rows)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{g}', {x!r}, {y!r})" for g, x, y in rows)
        + ") v(g, x, y)"
    )
    sql = f"""
    WITH q AS (
        SELECT g, {quantize_sql('x')} AS xq,
               {quantize_sql('y')} AS yq FROM t
    ), m AS (
        SELECT g, {corr_moments_sql('xq', 'yq', 'c')}
        FROM q GROUP BY g
    )
    SELECT g, {corr_value_sql('c')} AS r FROM m
    """
    duck_out = dict(con.execute(sql).fetchall())
    assert duck_out["g2"] is None and spark_out["g2"] is None
    # byte-identical double, not merely close — the whole point of the
    # quantized-moment lowering
    assert duck_out["g1"] == spark_out["g1"]
