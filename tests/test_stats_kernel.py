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


def test_coarse_product_grid_holds_at_large_magnitudes(spark):
    """The round-9 ADVICE bound: at the default 12-digit product grid,
    floor(x*y*1e12 + 0.5) crosses 2^53 (grid exactness lost) once
    |x*y| > ~9e3 and SATURATES Spark's LONG floor at 2^63 past ~9.2e6 —
    so raw-id-sized inputs (q_stats_agg's user_id, here up to 9e4) must
    run a 6-digit product grid, which keeps |x*y|*1e6 < 2^53 up to
    |x*y| ~ 9e9. Pin that the 6-digit kernel (a) matches numpy and
    (b) stays BYTE-identical to the DuckDB mirror at these magnitudes,
    where the 12-digit default would silently diverge."""
    import duckdb

    rng = np.random.RandomState(17)
    ys = rng.randint(0, 95000, size=60)  # user_id-like magnitudes
    xs = rng.randn(60) * 3.0 + ys * 1e-4  # correlated small doubles
    rows = [("g", float(x), float(y)) for x, y in zip(xs, ys)]

    df = spark.createDataFrame(rows, "g string, x double, y double")
    m = df.groupBy("g").agg(
        *corr_moment_aggs(
            quantize(F.col("x"), 6, "decimal(18,6)"),
            quantize(F.col("y"), 6, "decimal(18,6)"),
            "c",
            "decimal(38,6)",
            6,
        )
    )
    spark_r = m.select(corr_from_moments("c").alias("r")).collect()[0]["r"]
    ref = np.corrcoef(xs.astype(np.float64), ys.astype(np.float64))[0, 1]
    assert abs(spark_r - ref) < 1e-6  # 1e-6 input grid, y*y ~ 9e9

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{g}', {x!r}, {y!r})" for g, x, y in rows)
        + ") v(g, x, y)"
    )
    sql = f"""
    WITH q AS (
        SELECT g, {quantize_sql('x', 6, 'DECIMAL(18,6)')} AS xq,
               {quantize_sql('y', 6, 'DECIMAL(18,6)')} AS yq FROM t
    ), m AS (
        SELECT g, {corr_moments_sql('xq', 'yq', 'c', 'DECIMAL(38,6)', 6)}
        FROM q GROUP BY g
    )
    SELECT {corr_value_sql('c')} AS r FROM m
    """
    duck_r = con.execute(sql).fetchall()[0][0]
    assert duck_r == spark_r  # byte-identical at raw-id magnitudes


def test_grid_sum_split_equals_decimal_sum(spark):
    """grid_sum_parts/grid_sum_value (functions/scalars.py): the split
    LONG accumulation must recombine to EXACTLY the DECIMAL sum it
    replaces — on positives, negatives (pmod pairs with floor-div so
    hi*10^s + lo == u for either sign), NULLs (floor(NULL)=NULL skips
    the row in both forms), and the money×rate product chain — since
    the DuckDB oracle keeps the DECIMAL-sum form and hash-compares."""
    from market_analyze_data_stream_processing_spark.functions.scalars import (
        grid_long,
        grid_sum_parts,
        grid_sum_value,
        money2,
        money_round,
        one_minus_rate,
    )

    rows = [
        ("a", 104949.50, 0.10),
        ("a", 0.01, 0.00),
        ("a", 0.03, 0.07),
        ("b", -12345.67, 0.05),   # negative money (credits)
        ("b", 9999999.99, 0.10),
        ("b", None, 0.02),        # NULL money row must be skipped
        ("c", 0.00, 0.00),
    ]
    df = spark.createDataFrame(rows, "g string, price double, disc double")

    dec = df.groupBy("g").agg(
        money_round(
            F.sum(money2("price") * one_minus_rate("disc"))
        ).alias("v")
    )
    u4 = grid_long("price") * (F.lit(100) - grid_long("disc"))
    grid = (
        df.groupBy("g")
        .agg(*grid_sum_parts(u4, "s", 4))
        .select("g", money_round(grid_sum_value("s", 4)).alias("v"))
    )
    a = {r["g"]: r["v"] for r in dec.collect()}
    b = {r["g"]: r["v"] for r in grid.collect()}
    assert a == b, (a, b)

    # plain (rate-free) sums at scale 2 and the qty grid at scale 1
    dec2 = df.groupBy("g").agg(money_round(F.sum(money2("price"))).alias("v"))
    grid2 = (
        df.groupBy("g")
        .agg(*grid_sum_parts(grid_long("price"), "s", 2))
        .select("g", money_round(grid_sum_value("s", 2)).alias("v"))
    )
    assert {r["g"]: r["v"] for r in dec2.collect()} == {
        r["g"]: r["v"] for r in grid2.collect()
    }
