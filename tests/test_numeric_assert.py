"""Opt-in numeric-domain assertion mode (SPARK_GRAFT_NUMERIC_ASSERT).

The stable_round / quantize DOMAIN BOUND (|x|·10^digits < 2^53, x
finite) is normally a documented contract: past it Spark's LONG-typed
floor silently saturates/diverges from DuckDB. With the env flag set,
every snap wraps its input in a per-row assert_true so out-of-domain
data raises LOUDLY instead of silently diverging cross-engine — the
gram_partials refusal policy (operators/linalg.py:62-74) applied to the
scalar snap path. tools/verify_local.py --assert runs the whole
registry under this mode (round-11 DIFFERENTIAL artifact)."""

import pytest
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.functions.scalars import (
    NUMERIC_ASSERT_ENV,
    stable_round,
)
from market_analyze_data_stream_processing_spark.operators.stats import quantize


@pytest.fixture
def assert_on(monkeypatch):
    monkeypatch.setenv(NUMERIC_ASSERT_ENV, "1")


def test_in_domain_values_unchanged(spark, assert_on):
    """The guard is value-transparent: in-domain rows (incl. NULL) snap
    to exactly what the unguarded builder produces."""
    df = spark.createDataFrame([(1.23456,), (-0.125,), (None,)], "x double")
    rows = df.select(
        stable_round(F.col("x"), 2).alias("r"),
        quantize(F.col("x")).alias("q"),
    ).collect()
    assert [r.r for r in rows] == [1.23, -0.12, None]
    assert [float(r.q) if r.q is not None else None for r in rows] == [
        1.23456,
        -0.125,
        None,
    ]


@pytest.mark.parametrize("bad", [1e16, float("nan"), float("inf"), float("-inf")])
def test_out_of_domain_raises(spark, assert_on, bad):
    df = spark.createDataFrame([(bad,)], "x double")
    with pytest.raises(Exception, match="domain violation"):
        df.select(quantize(F.col("x")).alias("q")).collect()
    with pytest.raises(Exception, match="domain violation"):
        df.select(stable_round(F.col("x"), 12).alias("r")).collect()


def test_digits_scale_the_bound(spark, assert_on):
    """1e10 is out of domain at digits=12 (1e22 > 2^53) but in domain at
    digits=2 (1e12 < 2^53) — the bound tracks the requested grid."""
    df = spark.createDataFrame([(1e10,)], "x double")
    assert df.select(stable_round(F.col("x"), 2).alias("r")).collect()[0].r == 1e10
    with pytest.raises(Exception, match="domain violation"):
        df.select(stable_round(F.col("x"), 12).alias("r")).collect()


def test_flag_off_is_legacy_silent_path(spark, monkeypatch):
    monkeypatch.delenv(NUMERIC_ASSERT_ENV, raising=False)
    df = spark.createDataFrame([(1e16,)], "x double")
    # no raise: the documented silent-saturation legacy behavior
    assert df.select(quantize(F.col("x")).alias("q")).collect()[0].q is not None


def test_grid_long_guard(spark, assert_on):
    """grid_long (the money-cents floor snap feeding grid_sum_parts)
    carries the same per-row domain guard as stable_round: in-domain
    grid values snap exactly; out-of-domain magnitudes raise."""
    from market_analyze_data_stream_processing_spark.functions.scalars import (
        grid_long,
    )

    df = spark.createDataFrame([(104949.50,), (-0.07,), (None,)], "x double")
    got = [
        r.c for r in df.select(grid_long("x").alias("c")).collect()
    ]
    assert got == [10494950, -7, None]
    bad = spark.createDataFrame([(1e16,)], "x double")
    with pytest.raises(Exception, match="domain violation"):
        bad.select(grid_long("x").alias("c")).collect()
    # Round-12 advisory closed: the guard enforces the EXACT-RECOVERY
    # contract (|x|*10^d < 2^51), not the looser generic 2^53 snap
    # bound — a value in [2^51, 2^53) can snap or split inexactly and
    # must RAISE under ASSERT rather than pass while the docstring's
    # contract is violated.
    between = spark.createDataFrame([(float(2**51) / 100 * 1.01,)], "x double")
    with pytest.raises(Exception, match="domain violation"):
        between.select(grid_long("x").alias("c")).collect()
    just_in = spark.createDataFrame([(float(2**50) / 100,)], "x double")
    assert just_in.select(grid_long("x").alias("c")).collect()[0].c is not None


def test_grid_sum_parts_product_domain_guard(spark, assert_on):
    """grid_sum_parts asserts its split-division domain (|u| < 2^52 per
    row) under ASSERT mode — the round-12 advisory's second half: the
    (u - lo)/split double division is exact only inside that bound."""
    from pyspark.sql import functions as F

    from market_analyze_data_stream_processing_spark.functions.scalars import (
        grid_sum_parts,
        grid_sum_value,
    )

    ok = spark.createDataFrame([(12345,), (-987,), (None,)], "u long")
    row = ok.agg(*grid_sum_parts(F.col("u"), "s", 2)).select(
        grid_sum_value("s", 2).alias("v")
    ).collect()[0]
    assert float(row.v) == 113.58
    bad = spark.createDataFrame([(2**52 + 1,)], "u long")
    with pytest.raises(Exception, match="grid_sum_parts.*domain violation"):
        bad.agg(*grid_sum_parts(F.col("u"), "s", 2)).collect()
