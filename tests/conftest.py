from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

# ASSERT mode is the suite DEFAULT (round-11 stretch item): every
# stable_round/quantize snap raises per-row on out-of-domain inputs
# (|x|·10^digits >= 2^53, NaN, ±inf) instead of silently diverging
# cross-engine, so new code with out-of-grid inputs fails at
# development time, not at the next sf1 differential sweep. The full
# registry is green under it (13-axis ASSERT differential). Opt out for
# a single run with SPARK_GRAFT_NUMERIC_ASSERT=0 if a test must probe
# the silent-saturation behavior itself (the assert-mode tests in
# test_numeric_assert.py set/unset the env var explicitly per-case).
os.environ.setdefault("SPARK_GRAFT_NUMERIC_ASSERT", "1")


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("mads-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()
