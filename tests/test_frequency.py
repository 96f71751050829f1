"""Heavy-hitter operator: exactness, candidate-superset guarantee, and
partitioning-independence (the oracle differential covers the corpus
query; these pin the algorithm on adversarial streams)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.frequency import (
    heavy_hitters,
    misra_gries_partials,
)

# Skewed stream: two dominant items, a mid item, and a singleton tail
# engineered so MG decrements churn the counter dict.
ITEMS = (
    ["hot"] * 400
    + ["warm"] * 150
    + ["mild"] * 60
    + [f"tail{i}" for i in range(390)]
)


def _df(spark, partitions):
    return spark.createDataFrame(
        [(x,) for x in ITEMS], "item string"
    ).repartition(partitions)


def _expected(k):
    n = len(ITEMS)
    counts = Counter(ITEMS)
    return {i: c for i, c in counts.items() if c * k > n}


def test_exact_vs_bruteforce_and_partition_invariance(spark):
    for parts in (1, 7):
        out = {
            r["item"]: r["cnt"]
            for r in heavy_hitters(_df(spark, parts), "item", k=10).collect()
        }
        assert out == _expected(10), f"partitions={parts}"


def test_candidates_bounded_and_superset(spark):
    df = _df(spark, 5)
    partials = misra_gries_partials(df, "item", 10)
    per_part = (
        partials.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert all(r["count"] <= 10 for r in per_part)
    cands = {r["item"] for r in partials.select("item").distinct().collect()}
    assert set(_expected(10)) <= cands  # pigeonhole superset


def test_threshold_is_strict(spark):
    # 10 items x 10 each, N=100: with k=10 nothing exceeds N/k=10 strictly
    data = [(f"i{j}",) for j in range(10) for _ in range(10)]
    df = spark.createDataFrame(data, "item string")
    assert heavy_hitters(df, "item", k=10).count() == 0
