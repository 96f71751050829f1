"""Technical indicators beyond the reference's MA family: Bollinger
bands and (Cutler's) RSI — rolling second-moment and gain/loss-ratio
analytics over the same (key, ts, seq) bar ordering.

Numerical design: every rolling sum is a DECIMAL running-sum DIFFERENCE
(``sum over unbounded preceding`` minus ``lag(sum, n)``) — O(1) per row
instead of re-aggregating an n-row frame, exact (no float accumulation
order), and therefore bit-reproducible across engines: the float math
happens only AFTER the exact differences, in a fixed expression order
an oracle can mirror term by term. This is the q_ma_rolling lowering
extended to second moments (Σx²) and signed deltas (gains/losses).

All window passes per indicator share one (key, ts, seq) partitioning,
so each indicator costs one shuffle + one sort regardless of how many
derived columns it emits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _running(base_w, col: Column, dtype: str) -> Column:
    run = base_w.rowsBetween(Window.unboundedPreceding, 0)
    return F.sum(col.cast(dtype)).over(run)


def _frame_diff(base_w, running: Column, n: int, zero: Column) -> Column:
    """Exact n-row frame sum from a running sum: S(i) - S(i-n)."""
    return running - F.coalesce(F.lag(running, n).over(base_w), zero)


def with_bollinger(
    bars: DataFrame,
    n: int = 20,
    k: float = 2.0,
    key: str = "ticker",
    ts: str = "ts",
    price: str = "price",
    seq: str = "seq",
) -> DataFrame:
    """Bollinger bands: n-period mean ± k·sample-stddev.

    Variance from exact decimal Σx and Σx² frame sums:
    ``(Σx² - (Σx)²/c) / (c-1)`` evaluated in double AFTER the exact
    differences — the expression an oracle reproduces verbatim. Bands
    are null until the window holds ≥2 rows (sample variance needs
    them); negative float residue near zero variance is clamped."""
    base = Window.partitionBy(key).orderBy(ts, seq)
    p = F.col(price)
    sx = _running(base, p, "decimal(18,4)")
    sx2 = _running(base, p * p, "decimal(28,8)")
    c_run = F.count(price).over(base.rowsBetween(Window.unboundedPreceding, 0))
    sx_n = _frame_diff(base, sx, n, F.lit(0).cast("decimal(28,4)"))
    sx2_n = _frame_diff(base, sx2, n, F.lit(0).cast("decimal(38,8)"))
    c_n = c_run - F.coalesce(F.lag(c_run, n).over(base), F.lit(0))
    mean = sx_n.cast("double") / c_n
    var = (
        (sx2_n.cast("double") - sx_n.cast("double") * sx_n.cast("double") / c_n)
        / (c_n - 1)
    )
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    return bars.withColumns(
        {
            "bb_mid": mean,
            "bb_upper": F.when(c_n >= 2, mean + k * std),
            "bb_lower": F.when(c_n >= 2, mean - k * std),
        }
    )


def with_rsi(
    bars: DataFrame,
    n: int = 14,
    key: str = "ticker",
    ts: str = "ts",
    price: str = "price",
    seq: str = "seq",
) -> DataFrame:
    """Cutler's RSI: 100 - 100/(1 + SMA(gains,n)/SMA(losses,n)) over
    simple (not Wilder-recursive) moving averages — the deterministic,
    window-expressible variant; the recursive form is the EWMA kernel's
    job. RSI is null until n deltas exist; all-loss ⇒ 0, all-gain ⇒ 100
    (the conventional zero-denominator limits)."""
    base = Window.partitionBy(key).orderBy(ts, seq)
    delta = F.col(price) - F.lag(price).over(base)
    g = F.when(delta > 0, delta).otherwise(F.lit(0.0))
    l = F.when(delta < 0, -delta).otherwise(F.lit(0.0))
    with_d = bars.withColumns(
        {"__g": g, "__l": l, "__has": delta.isNotNull().cast("long")}
    )
    sg = _running(base, F.col("__g"), "decimal(18,4)")
    sl = _running(base, F.col("__l"), "decimal(18,4)")
    sh = _running(base, F.col("__has"), "long")
    zero = F.lit(0).cast("decimal(28,4)")
    g_n = _frame_diff(base, sg, n, zero).cast("double")
    l_n = _frame_diff(base, sl, n, zero).cast("double")
    h_n = sh - F.coalesce(F.lag(sh, n).over(base), F.lit(0))
    rsi = F.when(h_n < n, F.lit(None).cast("double")).otherwise(
        F.when(l_n == 0.0, F.when(g_n == 0.0, 50.0).otherwise(100.0)).otherwise(
            100.0 - 100.0 / (1.0 + g_n / l_n)
        )
    )
    return with_d.withColumn("rsi", rsi).drop("__g", "__l", "__has")
