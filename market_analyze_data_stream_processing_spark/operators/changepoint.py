"""Changepoint detection: tabular CUSUM (cumulative-sum control chart)
with an EXACT window lowering.

The textbook recursions
    S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k))      (upward shift)
    S⁻_t = max(0, S⁻_{t-1} + (μ − k − x_t))      (downward shift)
look inherently sequential, but the max(0, ·) clamp has a closed form:
with P_t = Σ_{j≤t} y_j (the unclamped prefix sum),

    S_t = P_t − min(0, min_{i≤t} P_i)

— a running sum and a running min, both plain window aggregates over
ONE (key, ts) shuffle+sort. No recursion, no per-row Python, no halo
blocks: the "sequential" control chart is embarrassingly windowable.
Per-term deviations are snapped to the 1e-10 grid with
floor(y·1e10 + 0.5) in pure double arithmetic BEFORE the DECIMAL cast
(the operators/stats.quantize discipline — a bare double→DECIMAL cast
can resolve to different grid points on Spark vs DuckDB), so P and its
running min are exact and the subtraction is the only float step —
bit-reproducible cross-engine.

The streaming twin (streaming/stateful.cusum_per_key_stateful) keeps
exactly (P, min P) per key — O(1) state, as 1e-10-scaled integers
computed with the IDENTICAL floor expression — and matches this
operator bit for bit on the same data, pinned by tests/test_cusum.py's
exact-parity assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_cusum(
    series: DataFrame,
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
    key: str = "ticker",
    order: str = "day",
    value: str = "close",
) -> DataFrame:
    """Two-sided CUSUM per key with self-calibrated target: μ and σ are
    the key's own DECIMAL-exact mean / sample stddev (two-pass — fine
    for batch; the streaming twin takes frozen μ/σ from this pass),
    slack k = k_sigma·σ, alarm threshold h = h_sigma·σ.

    Emits cusum_up / cusum_dn and integer alarm flags. Keys with a
    single row (σ undefined) emit nulls; σ = 0 keys (constant series)
    emit 0/0 with no alarms (y ≡ 0 exactly)."""
    stats = series.groupBy(key).agg(
        F.sum(F.col(value).cast("decimal(28,6)")).alias("__sx"),
        F.sum((F.col(value) * F.col(value)).cast("decimal(38,8)")).alias("__sx2"),
        F.count(value).alias("__n"),
    )
    mu = F.col("__sx").cast("double") / F.col("__n")
    var = (
        F.col("__sx2").cast("double")
        - F.col("__sx").cast("double") * F.col("__sx").cast("double") / F.col("__n")
    ) / (F.col("__n") - 1)
    sigma = F.when(F.col("__n") > 1, F.sqrt(F.greatest(var, F.lit(0.0))))
    # stats is O(keys) — broadcast keeps the fact scan shuffle-free here
    j = series.join(
        F.broadcast(stats.select(key, mu.alias("__mu"), sigma.alias("__sigma"))),
        key,
    )
    kk = F.lit(k_sigma) * F.col("__sigma")

    # snap-then-cast (operators/stats.quantize discipline): the floor
    # form is pure double arithmetic — identical on every engine — so
    # the DECIMAL cast that follows resolves to the same 1e-10 grid
    # point everywhere. A bare double->DECIMAL cast is knife-edge-prone
    # cross-engine (Spark rounds the shortest round-trip string, DuckDB
    # the exact binary expansion).
    def q10(x):
        return (F.floor(x * F.lit(1e10) + F.lit(0.5)) / F.lit(1e10)).cast(
            "decimal(28,10)"
        )

    y_up = q10(F.col(value) - F.col("__mu") - kk)
    y_dn = q10(F.col("__mu") - kk - F.col(value))
    w = Window.partitionBy(key).orderBy(order)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    zero = F.lit(0).cast("decimal(38,10)")
    # Two projection passes (prefix sums, then their running mins) on
    # the SAME window spec: Catalyst stacks the WindowExecs on one
    # exchange + one sort, so the nested-window restriction costs
    # nothing extra.
    d = (
        j.withColumn("__yu", y_up)
        .withColumn("__yd", y_dn)
        .withColumn("__pu", F.sum("__yu").over(run))
        .withColumn("__pd", F.sum("__yd").over(run))
    )
    cu = (F.col("__pu") - F.least(zero, F.min("__pu").over(run))).cast("double")
    cd = (F.col("__pd") - F.least(zero, F.min("__pd").over(run))).cast("double")
    h = F.lit(h_sigma) * F.col("__sigma")
    return (
        d.withColumn("cusum_up", cu)
        .withColumn("cusum_dn", cd)
        .withColumn("alarm_up", (F.col("cusum_up") > h).cast("int"))
        .withColumn("alarm_dn", (F.col("cusum_dn") > h).cast("int"))
        .drop("__mu", "__sigma", "__yu", "__yd", "__pu", "__pd")
    )
