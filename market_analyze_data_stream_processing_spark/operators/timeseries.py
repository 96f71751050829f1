"""Time-series regularization operators: OHLC resampling and calendar
gap-filling — the steps between raw ticks and model-ready series that
the reference's pandas would do with ``resample``/``asfreq``/``ffill``,
re-expressed as window/agg plans.

Scale shape: resampling is ONE hash aggregate (min_by/max_by carry the
open/close tiebreaks through the shuffle — no sort, no window);
gap-filling materializes each key's calendar with ``sequence``+``explode``
(rows grow by the gap count only), joins observations back on
(key, day), and forward-fills with ``last(ignore nulls)`` over one
window — one shuffle on the key, partition-parallel across keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ohlc(
    bars: DataFrame,
    key: str = "ticker",
    ts: str = "ts",
    price: str = "price",
    seq: str = "seq",
    unit: str = "week",
) -> DataFrame:
    """Resample tick/bar data to per-``unit`` OHLC candles.

    ``open``/``close`` are the first/last price by (ts, seq) — the seq
    tiebreak makes duplicate-timestamp ticks deterministic — via
    ``min_by``/``max_by`` over a struct ordering key, so the whole
    resample is a single map-side-combined aggregate: no per-row window,
    no sort, one shuffle on (key, period)."""
    order = F.struct(F.col(ts), F.col(seq))
    return bars.groupBy(
        F.col(key), F.date_trunc(unit, F.col(ts)).cast("date").alias("period")
    ).agg(
        F.min_by(F.col(price), order).alias("open"),
        F.max(price).alias("high"),
        F.min(price).alias("low"),
        F.max_by(F.col(price), order).alias("close"),
        F.count(F.lit(1)).alias("n_bars"),
    )


def gap_fill_daily(
    daily: DataFrame,
    key: str,
    day: str = "day",
    value_cols: Sequence[str] = ("close",),
) -> DataFrame:
    """Regularize a per-(key, day) frame onto each key's full calendar
    [min(day), max(day)], forward-filling ``value_cols`` across the
    introduced gaps; ``is_filled`` marks synthesized rows.

    The calendar is generated per key (``sequence`` + ``explode`` — row
    growth is exactly the gap count), observations join back on
    (key, day), and each value column forward-fills with ONE
    ``last(ignore nulls)`` pass; all value columns share a single
    WindowExec on the same (key, day) ordering. Leading days before a
    key's first observation never exist (the calendar starts at the
    key's own min), so the fill is total."""
    spans = daily.groupBy(key).agg(
        F.min(day).alias("__a"), F.max(day).alias("__b")
    )
    cal = spans.select(
        key, F.explode(F.sequence("__a", "__b")).alias(day)
    )
    # Presence marker, not a value-null test: an OBSERVED row whose
    # value happens to be null is still an observed day (is_filled
    # false, its null value forward-fills like pandas ffill would).
    joined = cal.join(
        daily.withColumn("__obs", F.lit(True)), [key, day], "left"
    )
    w = (
        Window.partitionBy(key)
        .orderBy(day)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.withColumn("is_filled", F.col("__obs").isNull()).drop("__obs")
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def seasonal_decompose(
    daily: DataFrame,
    period: int = 7,
    key: str = "ticker",
    day: str = "day",
    value: str = "close",
) -> DataFrame:
    """Classical additive seasonal decomposition (STL-lite) of a daily
    series: value = trend + seasonal + resid, the moving-average method
    statsmodels' seasonal_decompose uses (extends the reference's MA
    dashboard from smoothing to structure: trend strips the cycle,
    seasonal isolates the day-of-week effect, resid is what a monitor
    should actually alert on).

    - trend: CENTERED period-row moving average (null until the frame
      is full on both sides). The frame sum accumulates in DECIMAL, so
      it is exact — order-insensitive, hence bit-portable — and only
      the final /period division is float.
    - seasonal: mean of (value - trend) per (key, phase), where phase
      is epoch-day mod period — a calendar-convention-free weekday
      index both engines derive identically.
    - resid: value - trend - seasonal.

    Scale shape: one shuffle+sort on the key for the centered frame
    (O(period) per row), one hash aggregate's worth of shuffle on
    (key, phase) for the seasonal means. Output is one row per input
    row — no collect, no self-join. Returns unrounded trend/seasonal/
    resid; callers round the float means per the registry discipline.
    """
    frame = (
        Window.partitionBy(key)
        .orderBy(day)
        .rowsBetween(-(period // 2), period // 2)
    )
    cnt = F.count(value).over(frame)
    s = F.sum(F.col(value).cast("decimal(18,4)")).over(frame)
    trend = F.when(cnt == period, s.cast("double") / float(period))
    phase = F.datediff(F.col(day), F.lit("1970-01-01")) % period
    t = daily.select(
        key,
        day,
        value,
        phase.alias("phase"),
        trend.alias("trend"),
    )
    season_w = Window.partitionBy(key, "phase")
    return t.select(
        key,
        day,
        "phase",
        value,
        "trend",
        F.avg(F.col(value) - F.col("trend")).over(season_w).alias("seasonal"),
    )
