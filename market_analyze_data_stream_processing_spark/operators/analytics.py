"""Market-analytics operators (SURVEY.md §2.4 A1–A9, §2.5 W1–W5).

The reference computes these with pandas positional idioms inside the
producer (rolling means, iloc lags, keep-last dedup); here each is a
DataFrame-in → DataFrame-out transform built on Spark Window specs, so
the same function serves batch tables and foreachBatch micro-batches.

Scale: all windows partition by the series key (ticker), so a series
never crosses executors and the only shuffle is the hash partition on
key. Frames are row-bounded (`rowsBetween`) — no unbounded state growth.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ..functions.scalars import pct_change, stable_round


def _series_window(key: str | Sequence[str], order: str | Sequence[str]) -> WindowSpec:
    keys = [key] if isinstance(key, str) else list(key)
    orders = [order] if isinstance(order, str) else list(order)
    return Window.partitionBy(*keys).orderBy(*orders)


def with_moving_averages(
    df: DataFrame,
    value_col: str = "Close",
    key: str | Sequence[str] = "ticker",
    order: str | Sequence[str] = "date",
    windows: Sequence[int] = (10, 50, 200),
    round_to: int | None = None,
    min_fill: bool = False,
    exact: bool = False,
    strict: bool = False,
) -> DataFrame:
    """Trailing moving averages MA{n} (A3/W3: rolling(n).mean()).

    ``min_fill=True`` reproduces the reference's NaN→0.0 coercion for
    unfilled windows (producer.py:297-299, 325-327): emit 0.0 until the
    window has n rows. ``strict=True`` reproduces pandas' raw
    ``rolling(n).mean()`` (min_periods=n) — NaN until the window fills,
    matching the reference where it does NOT coerce (mean_50,
    producer.py:326). Default emits the partial-window mean (Spark
    natural semantics).

    ``exact=True`` computes the mean as an exact DECIMAL(18,4) windowed
    sum divided by the window count instead of a float avg. Windowed
    float avgs are accumulation-order-dependent (sliding-frame engines
    use subtract-on-evict / segment trees), so two engines can disagree
    in the low bits; the decimal-sum formulation is bit-identical across
    engines — required for oracle differential checks.

    Exact mode is also the FAST path: Spark's sliding-frame WindowExec
    re-aggregates the whole frame per row (O(n) for MA-n, no retract),
    so exact MAs are lowered to running-sum differences — one O(1)
    unbounded-preceding sum/count pass, then ``S(i) - lag(S, n)`` per
    window. Decimal arithmetic makes the difference EQUAL to the frame
    sum, so the lowering is invisible to the oracle. Both WindowExecs
    share one shuffle and one sort. Float mode keeps the natural frame
    avg (a float running-diff would NOT be bit-identical to a frame
    recompute).
    """
    base = _series_window(key, order)
    if exact:
        run = base.rowsBetween(Window.unboundedPreceding, 0)
        out = df.withColumn(
            "__run_s", F.sum(F.col(value_col).cast("decimal(18,4)")).over(run)
        ).withColumn("__run_c", F.count(value_col).over(run))
        for n in windows:
            s_n = F.col("__run_s") - F.coalesce(
                F.lag("__run_s", n).over(base), F.lit(0).cast("decimal(28,4)")
            )
            cnt = F.col("__run_c") - F.coalesce(F.lag("__run_c", n).over(base), F.lit(0))
            ma = s_n.cast("double") / cnt
            if round_to is not None:
                # inputs are bit-identical across engines, so use the
                # portable floor-form rounding (see stable_round).
                ma = stable_round(ma, round_to)
            if min_fill:
                ma = F.when(cnt < n, F.lit(0.0)).otherwise(ma)
            elif strict:
                ma = F.when(cnt < n, F.lit(float("nan"))).otherwise(ma)
            out = out.withColumn(f"ma{n}", ma)
        return out.drop("__run_s", "__run_c")
    out = df
    for n in windows:
        frame = base.rowsBetween(-(n - 1), 0)
        ma = F.avg(value_col).over(frame)
        if round_to is not None:
            ma = F.round(ma, round_to)
        if min_fill:
            cnt = F.count(value_col).over(frame)
            ma = F.when(cnt < n, F.lit(0.0)).otherwise(ma)
        elif strict:
            cnt = F.count(value_col).over(frame)
            ma = F.when(cnt < n, F.lit(float("nan"))).otherwise(ma)
        out = out.withColumn(f"ma{n}", ma)
    return out


def with_lag_variation(
    df: DataFrame,
    value_col: str = "Close",
    key: str | Sequence[str] = "ticker",
    order: str | Sequence[str] = "date",
    out_col: str = "variation_pct",
    round_to: int | None = None,
) -> DataFrame:
    """Day-over-day variation % with zero/missing guard → 0.0.

    Ref parity: A2 (producer.py:161-171) — prev close via lag(1); 0.0 when
    the previous close is 0 or absent.
    """
    prev = F.lag(value_col, 1).over(_series_window(key, order))
    var = pct_change(F.col(value_col), prev)
    if round_to is not None:
        # floor-form: a ratio of grid prices lands on round
        # half-boundaries systematically (fractional-stress finding)
        var = stable_round(var, round_to)
    return df.withColumn("prev_value", prev).withColumn(out_col, var)


#: Intraday momentum lookbacks in 5-minute-bar offsets (producer.py:225).
MOMENTUM_LAGS = {"10min": 2, "30min": 6, "1h": 12, "3h": 36, "6h": 72}


def with_momentum_lags(
    df: DataFrame,
    value_col: str = "Close",
    key: str | Sequence[str] = "ticker",
    order: str | Sequence[str] = "bar_ts",
    lags: dict[str, int] = MOMENTUM_LAGS,
    round_to: int | None = None,
) -> DataFrame:
    """Multi-lag momentum (A6): price_{label}_ago columns + var_{label} pct
    change vs each, 0.0 when insufficient history (producer.py:255-264).
    """
    w = _series_window(key, order)
    out = df
    for label, n in lags.items():
        lagged = F.coalesce(F.lag(value_col, n).over(w), F.lit(0.0))
        price = F.round(lagged, round_to) if round_to is not None else lagged
        var = pct_change(F.col(value_col), lagged)
        if round_to is not None:
            var = stable_round(var, round_to)  # floor-form: grid-ratio class
        out = out.withColumn(f"price_{label}_ago", price).withColumn(f"var_{label}", var)
    return out


def with_trend(
    df: DataFrame,
    value_col: str = "Close",
    ma_col: str = "ma50",
    out_col: str = "trend",
) -> DataFrame:
    """Trend classification (A5, producer.py:301-305): BULLISH if price>MA,
    BEARISH if <, NEUTRAL only on exact equality — or when the MA is NaN
    (unfilled strict window). The NaN guard must be explicit: pandas'
    ``x < NaN`` is False (→ NEUTRAL, the reference behavior) but Spark
    orders NaN greater than every value, so ``price < NaN`` would be
    TRUE and silently misclassify young series as BEARISH."""
    return df.withColumn(
        out_col,
        F.when(F.isnan(F.col(ma_col)), "NEUTRAL")
        .when(F.col(value_col) > F.col(ma_col), "BULLISH")
        .when(F.col(value_col) < F.col(ma_col), "BEARISH")
        .otherwise("NEUTRAL"),
    )


def daily_summary(
    df: DataFrame,
    value_col: str = "Close",
    volume_col: str | None = "Volume",
    key: str = "ticker",
    ts_col: str = "ts",
    seq_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-key daily OHLC+volume rollup (A1: producer.py:154-199).

    open/close = first/last value in the day by (ts, seq) — deterministic
    even with duplicate timestamps thanks to the seq tiebreak. Implemented
    as min_by/max_by over a composite sort key: single shuffle on
    (key, day), no window pass needed.
    """
    day = F.date_trunc("day", F.col(ts_col))
    orders = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    sort_key = F.struct(*orders)
    aggs = [
        F.round(F.min_by(F.col(value_col), sort_key), round_to).alias("open_px"),
        F.round(F.max_by(F.col(value_col), sort_key), round_to).alias("close_px"),
        F.round(F.max(value_col), round_to).alias("high_px"),
        F.round(F.min(value_col), round_to).alias("low_px"),
        F.count(F.lit(1)).alias("n_bars"),
    ]
    if volume_col:
        aggs.append(F.round(F.sum(volume_col), round_to).alias("volume"))
    out = (
        df.groupBy(F.col(key), day.alias("day"))
        .agg(*aggs)
        .withColumn("day", F.date_format("day", "yyyy-MM-dd"))
    )
    # Variation % close vs open, reference zero-guard semantics (A2).
    # floor-form: close/open are ALREADY round_to-grid values, so their
    # pct ratio lands on round half-boundaries systematically
    # (fractional-stress finding)
    return out.withColumn(
        "variation_pct",
        stable_round(pct_change(F.col("close_px"), F.col("open_px")), round_to),
    )


def latest_per_key(
    df: DataFrame,
    key: str | Sequence[str],
    order: str | Sequence[str],
    n: int = 1,
) -> DataFrame:
    """Keep the latest n rows per key (A8/T5/S7: LATEST_* upsert reads,
    n_results=1 lookups, head-N per feed T2).

    row_number over (key ORDER BY order DESC); at scale this is the
    standard single-shuffle pattern and prunes before any downstream join.
    """
    keys = [key] if isinstance(key, str) else list(key)
    orders = [order] if isinstance(order, str) else list(order)
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in orders])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def keep_last(
    df: DataFrame,
    key: str | Sequence[str],
    order: str | Sequence[str],
) -> DataFrame:
    """Keep-last-on-collision dedup (W5/S4: the reference's CSV upsert
    `~index.duplicated(keep='last')`, consumer.py:102-104)."""
    return latest_per_key(df, key, order, n=1)
