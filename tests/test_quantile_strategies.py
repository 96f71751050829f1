"""Executed evidence for the round-14 percentile-family scale swaps
(operators/quantiles.py) — the last two operators whose 100 TB answer
was SCALING.md prose are now strategy-switched code, and these tests
measure the exact-vs-sketch tolerance contract at sf1 and pin the
zero-job "auto" gate.

Oracle discipline: the registered q_mad_outliers / q_rfm plans keep the
exact strategies bit-for-bit (verified against DuckDB this round); the
sketch strategies are the scale forms these probes bound.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.quantiles import (
    SIZE_GATE_BYTES,
    estimated_input_bytes,
    mad_outliers,
    quintile_boundary_scores,
    rfm,
)

SF1 = "/tmp/sf1"

needs_sf1 = pytest.mark.skipif(
    not os.path.isdir(SF1), reason="sf1 scratch corpus not built (tools/make_sf1.py)"
)


def _sf1_mad_input(spark):
    orders = spark.read.parquet(os.path.join(SF1, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(SF1, "customer.parquet"))
    return orders.join(
        customer, F.col("o_custkey") == F.col("c_custkey")
    ).select(
        F.col("c_mktsegment").alias("segment"), F.col("o_totalprice").alias("x")
    )


def test_strategy_validation_and_zero_job_gate(spark):
    """'auto' resolves from Catalyst plan STATISTICS — no job runs —
    and an unknown strategy is rejected at build time."""
    from market_analyze_data_stream_processing_spark.stagemetrics import (
        max_stage_id,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    floor = max_stage_id(spark)
    est = estimated_input_bytes(df)
    assert 0 < est < SIZE_GATE_BYTES
    # building the auto-gated plans must not launch any job either
    mad_outliers(
        df.select(F.col("o_orderstatus").alias("segment"), F.col("o_totalprice").alias("x")),
        strategy="auto",
    )
    rfm(df, strategy="auto")
    assert max_stage_id(spark) == floor, "the size gate must be zero-job"
    with pytest.raises(ValueError, match="strategy"):
        mad_outliers(df.selectExpr("o_orderstatus segment", "o_totalprice x"), strategy="kll")
    with pytest.raises(ValueError, match="strategy"):
        rfm(df, strategy="quantile")


def test_boundaries_plan_has_no_window(spark):
    """The scale form's whole point: no ntile ⇒ no Window node, no
    Exchange SinglePartition sort anywhere before the presentation
    orderBy — the plan stays fully parallel at any customer count."""
    import re

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = rfm(orders, strategy="boundaries")._jdf.queryExecution().optimizedPlan().toString()
    # \b: "percentile(" must not read as "ntile("
    assert not re.search(r"\bntile\(", plan) and "Window" not in plan
    exact_plan = rfm(orders, strategy="ntile")._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(r"\bntile\(", exact_plan)


@needs_sf1
def test_mad_sketch_vs_exact_sf1(spark):
    """sf1 tolerance probe: approx_percentile at accuracy=10000 bounds
    median/MAD rank drift to n/10000 per segment (~300 of ~3M rows at
    sf1).  Measured consequence asserted here: per-segment med and mad
    within the local grid step (order totals are ~cent-grid over a wide
    range, so a 1e-4 quantile-mass shift moves the value by < 0.1% of
    the exact one), and outlier flag flips bounded by the threshold
    band mass (< 0.5% of rows per segment)."""
    o = _sf1_mad_input(spark)
    exact = {r["segment"]: r for r in mad_outliers(o, strategy="exact").collect()}
    sketch = {r["segment"]: r for r in mad_outliers(o, strategy="sketch").collect()}
    assert set(exact) == set(sketch) and len(exact) == 5
    for seg in exact:
        e, s = exact[seg], sketch[seg]
        assert e["n"] == s["n"]
        assert abs(s["med"] - e["med"]) <= 0.001 * e["med"], (seg, e["med"], s["med"])
        assert abs(s["mad"] - e["mad"]) <= 0.001 * e["mad"], (seg, e["mad"], s["mad"])
        assert abs(s["n_outliers"] - e["n_outliers"]) <= max(10, 0.005 * e["n"]), (
            seg,
            e["n_outliers"],
            s["n_outliers"],
        )
    # the auto gate stays EXACT at sf1 — the differential sweeps depend
    # on it (registered plan == exact plan at every oracle-checked SF)
    assert estimated_input_bytes(o) < SIZE_GATE_BYTES


@needs_sf1
def test_rfm_boundaries_vs_ntile_sf1(spark):
    """sf1 agreement probe for the ntile → boundary-scoring swap: the
    two strategies may only disagree where metric TIES straddle a
    quintile boundary (ntile splits ties by custkey; boundaries bucket
    them together) plus the sketch's n/10000 rank drift.  Asserted: the
    same customers, monetary scores ≥ 99% identical (near-continuous
    metric: tie mass ~0), every score within ±1 tile, and the segment
    label distribution within 5% on every class."""
    orders = spark.read.parquet(os.path.join(SF1, "orders.parquet"))
    nt = rfm(orders, strategy="ntile").select("custkey", "r", "f", "m", "segment")
    bd = rfm(orders, strategy="boundaries").select(
        F.col("custkey").alias("custkey2"),
        F.col("r").alias("r2"),
        F.col("f").alias("f2"),
        F.col("m").alias("m2"),
        F.col("segment").alias("segment2"),
    )
    j = nt.join(bd, nt["custkey"] == bd["custkey2"], "full").cache()
    try:
        n = j.count()
        assert j.where(F.col("custkey").isNull() | F.col("custkey2").isNull()).count() == 0
        stats = j.agg(
            F.sum((F.col("m") == F.col("m2")).cast("long")).alias("m_same"),
            F.max(F.abs(F.col("m") - F.col("m2"))).alias("m_maxd"),
            F.max(F.abs(F.col("r") - F.col("r2"))).alias("r_maxd"),
            F.max(F.abs(F.col("f") - F.col("f2"))).alias("f_maxd"),
            F.sum((F.col("segment") == F.col("segment2")).cast("long")).alias(
                "seg_same"
            ),
        ).collect()[0]
        assert stats["m_same"] >= 0.99 * n, (stats["m_same"], n)
        assert stats["m_maxd"] <= 1 and stats["r_maxd"] <= 1 and stats["f_maxd"] <= 1
        assert stats["seg_same"] >= 0.9 * n, (stats["seg_same"], n)
        dist_nt = {r["segment"]: r["c"] for r in nt.groupBy("segment").agg(F.count(F.lit(1)).alias("c")).collect()}
        dist_bd = {r["segment2"]: r["c"] for r in bd.groupBy("segment2").agg(F.count(F.lit(1)).alias("c")).collect()}
        for k in dist_nt:
            assert abs(dist_bd.get(k, 0) - dist_nt[k]) <= max(50, 0.05 * n), (
                k,
                dist_nt[k],
                dist_bd.get(k, 0),
            )
    finally:
        j.unpersist()


def test_quintile_boundary_scores_monotone(spark):
    """Direct contract of the boundary scorer on a known frame: scores
    are monotone in the metric, span 1..5 on a spread-out metric,
    metric ties always share a bucket, and a NULL metric scores 1
    (ntile parity: Spark's ascending sort places NULLs first)."""
    rows = [(i, float(i), 7.0 if i < 60 else 9.0) for i in range(100)]
    rows.append((100, None, None))
    df = spark.createDataFrame(rows, "id long, spread double, tied double")
    out = quintile_boundary_scores(df, {"s": "spread", "t": "tied"}, accuracy=10000)
    got = out.select("id", "spread", "s", "t").orderBy("id").collect()
    nonnull = [r for r in got if r["spread"] is not None]
    assert [r["s"] for r in nonnull] == sorted(r["s"] for r in nonnull)
    assert {r["s"] for r in nonnull} == {1, 2, 3, 4, 5}
    tied_scores = {r["t"] for r in nonnull if r["spread"] < 60}
    assert len(tied_scores) == 1, "metric ties must share one bucket"
    null_row = [r for r in got if r["spread"] is None][0]
    assert null_row["s"] == 1 and null_row["t"] == 1, (
        "NULL metrics must score 1 like ntile's nulls-first, not null"
    )


def test_mad_exact_fused_edge_groups(spark):
    """Round-15 fused exact path, edge groups: an all-NULL-value group
    must yield NULL med/mad/n_outliers/outlier_pct (the pre-fusion join
    form's semantics, where every flag was null so sum() returned NULL)
    and must NOT crash on the empty sorted-deviation array — index 0 on
    an empty array raises INVALID_INDEX_OF_ZERO even under
    try_element_at, guarded by greatest(..., 1). Singleton and even/odd
    groups pin the Percentile-at-0.5 interpolation replica."""
    from market_analyze_data_stream_processing_spark.operators.quantiles import (
        mad_outliers,
    )

    rows = (
        [("allnull", None)] * 3
        + [("single", 5.0)]
        + [("odd", 1.0), ("odd", 2.0), ("odd", 9.0)]
        + [("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 10.0)]
    )
    df = spark.createDataFrame(rows, "segment string, x double")
    got = {
        r["segment"]: r
        for r in mad_outliers(df, "segment", "x", strategy="exact").collect()
    }
    an = got["allnull"]
    assert an["n"] == 3
    assert an["med"] is None and an["mad"] is None
    assert an["n_outliers"] is None and an["outlier_pct"] is None
    assert got["single"]["med"] == 5.0 and got["single"]["mad"] == 0.0
    assert got["odd"]["med"] == 2.0  # exact middle, no interpolation
    assert got["even"]["med"] == 2.5  # 0.5*2.0 + 0.5*3.0
    # even group's deviations are [0.5, 0.5, 1.5, 7.5] -> mad 1.0
    assert got["even"]["mad"] == 1.0
