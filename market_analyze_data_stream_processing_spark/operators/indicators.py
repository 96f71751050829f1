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

from .stats import quantize


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


def with_obv(
    bars: DataFrame,
    key: str = "ticker",
    ts: str = "ts",
    price: str = "price",
    seq: str = "seq",
    vol: str = "vol",
) -> DataFrame:
    """On-balance volume: running sum of sign(Δprice)·volume.

    Volume is integral, so the cumulative sum stays in LONG arithmetic —
    exact, order-insensitive, bit-reproducible with no decimal cast.
    The flat/first tick contributes 0 (the standard OBV convention).
    One (key, ts, seq) shuffle+sort serves both the lag and the
    running sum."""
    base = Window.partitionBy(key).orderBy(ts, seq)
    delta = F.col(price) - F.lag(price).over(base)
    signed = (
        F.when(delta > 0, F.col(vol))
        .when(delta < 0, -F.col(vol))
        .otherwise(F.lit(0))
    )
    with_s = bars.withColumn("__sv", signed.cast("long"))
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    return with_s.withColumn("obv", F.sum("__sv").over(run)).drop("__sv")


def with_true_range(
    daily: DataFrame,
    key: str = "ticker",
    day: str = "day",
    high: str = "high",
    low: str = "low",
    close: str = "close",
) -> DataFrame:
    """True range per daily bar: max(H-L, |H-prev C|, |L-prev C|); the
    first bar of a key (no previous close) degrades to H-L. All inputs
    are data values, so TR is a fixed-order double expression an oracle
    mirrors verbatim."""
    base = Window.partitionBy(key).orderBy(day)
    prev = F.lag(close).over(base)
    hl = F.col(high) - F.col(low)
    tr = F.when(prev.isNull(), hl).otherwise(
        F.greatest(hl, F.abs(F.col(high) - prev), F.abs(F.col(low) - prev))
    )
    return daily.withColumn("tr", tr)


def with_atr(
    daily: DataFrame,
    n: int = 14,
    key: str = "ticker",
    day: str = "day",
    high: str = "high",
    low: str = "low",
    close: str = "close",
) -> DataFrame:
    """ATR(n), SMA form (like Cutler's RSI, the window-expressible
    variant; Wilder's recursive smoothing is the EWMA kernel's job):
    n-period simple mean of true range via the exact decimal
    running-sum-difference lowering — O(1) per row, no frame
    re-aggregation. Null until n true ranges exist."""
    d = with_true_range(daily, key=key, day=day, high=high, low=low, close=close)
    base = Window.partitionBy(key).orderBy(day)
    s = _running(base, F.col("tr"), "decimal(18,6)")
    c_run = F.count("tr").over(base.rowsBetween(Window.unboundedPreceding, 0))
    tr_n = _frame_diff(base, s, n, F.lit(0).cast("decimal(28,6)"))
    c_n = c_run - F.coalesce(F.lag(c_run, n).over(base), F.lit(0))
    atr = F.when(c_n >= n, tr_n.cast("double") / c_n)
    return d.withColumn("atr", atr)


def with_vwap_anchored(
    bars: DataFrame,
    key: str = "ticker",
    ts: str = "ts",
    price: str = "price",
    seq: str = "seq",
    vol: str = "vol",
) -> DataFrame:
    """Anchored (intraday) VWAP: within each (key, day) session,
    cumulative Σ(price·vol) / Σvol ordered by (ts, seq) — the running
    fair-value line that resets at each session open.

    Σ(price·vol) accumulates in DECIMAL (exact, order-insensitive);
    Σvol in LONG; the division to double happens once per row AFTER the
    exact sums, in an expression an oracle mirrors. One shuffle on
    (key, day) — sessions of one key parallelize across partitions,
    which is the scale story: no per-key serialization."""
    with_day = bars.withColumn("__day", F.to_date(F.col(ts)))
    base = Window.partitionBy(key, "__day").orderBy(ts, seq)
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    # snap-then-cast: a bare product cast knife-edges cross-engine at
    # price*vol magnitudes (ulp/grid ~ 6e-5 per value on full-mantissa
    # prices — fractional-stress finding)
    pv = F.sum(quantize(F.col(price) * F.col(vol), 6, "decimal(28,6)")).over(run)
    v = F.sum(F.col(vol).cast("long")).over(run)
    return (
        with_day.withColumn("vwap", pv.cast("double") / v)
        .withColumnRenamed("__day", "session")
    )


def with_donchian(
    bars: DataFrame,
    n: int = 20,
    key: str = "ticker",
    ts: str = "ts",
    price: str = "price",
    seq: str = "seq",
) -> DataFrame:
    """Donchian channel: n-period rolling high/low/mid plus breakout
    flags (price strictly beyond the PREVIOUS row's completed channel —
    comparing against the current row's channel would be vacuous, the
    current price is inside it by construction).

    Channel bounds are actual data values (rolling max/min — no float
    accumulation at all); channel and flags are null-gated until the
    window is full. Two stacked Window operators share one
    (key, ts, seq) shuffle+sort."""
    base = Window.partitionBy(key).orderBy(ts, seq)
    w = base.rowsBetween(-(n - 1), 0)
    staged = bars.withColumns(
        {
            "__up": F.max(price).over(w),
            "__lo": F.min(price).over(w),
            "__c": F.count(price).over(w),
        }
    )
    prev_up = F.lag("__up").over(base)
    prev_lo = F.lag("__lo").over(base)
    prev_full = F.lag("__c").over(base) >= n
    full = F.col("__c") >= n
    return staged.withColumns(
        {
            "dc_upper": F.when(full, F.col("__up")),
            "dc_lower": F.when(full, F.col("__lo")),
            "dc_mid": F.when(full, (F.col("__up") + F.col("__lo")) / 2.0),
            "breakout_up": F.when(prev_full, F.col(price) > prev_up),
            "breakout_down": F.when(prev_full, F.col(price) < prev_lo),
        }
    ).drop("__up", "__lo", "__c")


def with_aroon(
    bars: DataFrame,
    n: int = 25,
    key: str = "ticker",
    ts: str = "ts",
    price: str = "price",
    seq: str = "seq",
) -> DataFrame:
    """Aroon up/down over an n-row window: 100·(n-1 - rows_since_extreme)
    / (n-1), where rows_since uses the MOST RECENT extreme on ties (both
    sides — the high tiebreak is free from lexicographic struct max; the
    low negates the row number so min-struct also lands on the latest).

    The windowed ARGMAX POSITION comes from ``max(struct(price, rn))``
    — an aggregate over data values, no float accumulation — which the
    oracle mirrors with DuckDB's lexicographic list max. Null-gated
    until the window holds n rows."""
    base = Window.partitionBy(key).orderBy(ts, seq)
    staged = bars.withColumn("__rn", F.row_number().over(base))
    w = base.rowsBetween(-(n - 1), 0)
    hi_rn = F.max(
        F.struct(F.col(price).alias("p"), F.col("__rn").alias("r"))
    ).over(w)["r"]
    lo_rn = -F.min(
        F.struct(F.col(price).alias("p"), (-F.col("__rn")).alias("r"))
    ).over(w)["r"]
    cnt = F.count(price).over(w)
    span = float(n - 1)
    up = 100.0 * (span - (F.col("__rn") - hi_rn)) / span
    down = 100.0 * (span - (F.col("__rn") - lo_rn)) / span
    return (
        staged.withColumns(
            {
                "aroon_up": F.when(cnt >= n, up),
                "aroon_down": F.when(cnt >= n, down),
            }
        )
        .drop("__rn")
    )


def with_cci(
    daily: DataFrame,
    n: int = 20,
    key: str = "ticker",
    day: str = "day",
    high: str = "high",
    low: str = "low",
    close: str = "close",
) -> DataFrame:
    """CCI(n): (TP - SMA(TP,n)) / (0.015 · MAD(TP,n)) over daily bars,
    TP = (H+L+C)/3, MAD = mean absolute deviation around the window's
    OWN mean.

    MAD is the one rolling statistic here that genuinely cannot lower
    to a running-sum difference — each row's deviations are taken
    around that row's mean, so the frame must be re-aggregated. The
    honest lowering is a WINDOWED ARRAY FOLD: collect the n-row frame
    (bounded — n·16 bytes per row, not a skew risk), sort by row number
    for a canonical order, and left-fold Σ|tp - sma| in that order — an
    accumulation sequence the oracle replays exactly (DuckDB
    list_sort + list_transform + list_reduce). SMA itself still uses
    the exact decimal running-sum difference. Cost is O(n) per row
    (vs O(1) for the decomposable indicators) — the price of the
    statistic, stated rather than hidden. Null until the window is
    full and when MAD is 0 (flat window: CCI undefined)."""
    base = Window.partitionBy(key).orderBy(day)
    tp = (F.col(high) + F.col(low) + F.col(close)) / 3.0
    staged = daily.withColumn("__tp", tp).withColumn(
        "__rn", F.row_number().over(base)
    )
    s = _running(base, F.col("__tp"), "decimal(18,6)")
    c_run = F.count("__tp").over(base.rowsBetween(Window.unboundedPreceding, 0))
    tp_n = _frame_diff(base, s, n, F.lit(0).cast("decimal(28,6)"))
    c_n = c_run - F.coalesce(F.lag(c_run, n).over(base), F.lit(0))
    staged = staged.withColumns(
        {
            "__sma": tp_n.cast("double") / c_n,
            "__cn": c_n,
            "__vals": F.array_sort(
                F.collect_list(
                    F.struct(F.col("__rn").alias("r"), F.col("__tp").alias("t"))
                ).over(base.rowsBetween(-(n - 1), 0))
            ),
        }
    )
    mad = (
        F.aggregate(
            F.transform(F.col("__vals"), lambda x: F.abs(x["t"] - F.col("__sma"))),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / F.col("__cn")
    )
    cci = F.when(
        (F.col("__cn") >= n) & (mad != 0.0),
        (F.col("__tp") - F.col("__sma")) / (0.015 * mad),
    )
    return (
        staged.withColumn("cci", cci)
        .drop("__rn", "__sma", "__cn", "__vals")
        .withColumnRenamed("__tp", "tp")
    )


def with_williams_r(
    daily: DataFrame,
    n: int = 14,
    key: str = "ticker",
    day: str = "day",
    high: str = "high",
    low: str = "low",
    close: str = "close",
) -> DataFrame:
    """Williams %R(n): -100 · (HH - C) / (HH - LL) over the n-bar
    rolling highest-high / lowest-low. Bounds are actual data values
    (frame max/min — no accumulation), so the quotient is a fixed-order
    double expression. Null until n bars exist and on a flat window
    (HH == LL: %R undefined)."""
    base = Window.partitionBy(key).orderBy(day)
    frame = base.rowsBetween(-(n - 1), 0)
    hh = F.max(high).over(frame)
    ll = F.min(low).over(frame)
    c_n = F.count(close).over(frame)
    willr = F.when(
        (c_n >= n) & (hh != ll),
        F.lit(-100.0) * (hh - F.col(close)) / (hh - ll),
    )
    return daily.withColumn("willr", willr)


def with_mfi(
    daily: DataFrame,
    n: int = 14,
    key: str = "ticker",
    day: str = "day",
    high: str = "high",
    low: str = "low",
    close: str = "close",
    vol: str = "vol",
) -> DataFrame:
    """Money Flow Index(n) over daily bars with volume: a volume-
    weighted RSI on the typical price TP = (H+L+C)/3.

    Works on 3·TP = H+L+C throughout — the common factor cancels in
    posMF/negMF, and H+L+C is exact in double for fixed-point prices,
    so raw money flow (H+L+C)·vol casts to DECIMAL losslessly and the
    rolling sums use the exact running-sum-difference lowering. Null
    until n TP-deltas exist; zero negative flow ⇒ 100 (50 when both
    flows are zero — flat window)."""
    base = Window.partitionBy(key).orderBy(day)
    tp3 = F.col(high) + F.col(low) + F.col(close)
    delta = tp3 - F.lag(tp3).over(base)
    mf = quantize(tp3 * F.col(vol), 6, "decimal(28,6)")  # snap-then-cast
    staged = daily.withColumns(
        {
            "__pos": F.when(delta > 0, mf).otherwise(F.lit(0).cast("decimal(28,6)")),
            "__neg": F.when(delta < 0, mf).otherwise(F.lit(0).cast("decimal(28,6)")),
            "__has": delta.isNotNull().cast("long"),
        }
    )
    sp = _running(base, F.col("__pos"), "decimal(38,6)")
    sn = _running(base, F.col("__neg"), "decimal(38,6)")
    sh = _running(base, F.col("__has"), "long")
    zero = F.lit(0).cast("decimal(38,6)")
    p_n = _frame_diff(base, sp, n, zero).cast("double")
    n_n = _frame_diff(base, sn, n, zero).cast("double")
    h_n = sh - F.coalesce(F.lag(sh, n).over(base), F.lit(0))
    mfi = F.when(h_n < n, F.lit(None).cast("double")).otherwise(
        F.when(n_n == 0.0, F.when(p_n == 0.0, 50.0).otherwise(100.0)).otherwise(
            100.0 - 100.0 / (1.0 + p_n / n_n)
        )
    )
    return staged.withColumn("mfi", mfi).drop("__pos", "__neg", "__has")


def with_ichimoku(
    bars: DataFrame,
    n_tenkan: int = 9,
    n_kijun: int = 26,
    n_senkou: int = 52,
    key: str = "ticker",
    ts: str = "ts",
    price: str = "price",
    seq: str = "seq",
) -> DataFrame:
    """Ichimoku cloud at bar grain (periods are in bars): tenkan /
    kijun are rolling (max+min)/2 midlines over 9/26 bars; senkou A =
    (tenkan+kijun)/2 and senkou B = 52-bar midline, both DISPLACED
    forward 26 bars (lag — today's cloud was computed 26 bars ago);
    chikou = price displaced backward (lead 26). Every value is a
    midpoint of actual frame extrema — no accumulation anywhere, one
    shuffle + one sort shared by all six windows."""
    base = Window.partitionBy(key).orderBy(ts, seq)

    def midline(n: int) -> Column:
        frame = base.rowsBetween(-(n - 1), 0)
        return F.when(
            F.count(price).over(frame) >= n,
            (F.max(price).over(frame) + F.min(price).over(frame)) / 2.0,
        )

    tenkan = midline(n_tenkan)
    kijun = midline(n_kijun)
    staged = bars.withColumns({"__tenkan": tenkan, "__kijun": kijun,
                               "__mid_s": midline(n_senkou)})
    senkou_a = F.lag((F.col("__tenkan") + F.col("__kijun")) / 2.0, n_kijun).over(base)
    senkou_b = F.lag(F.col("__mid_s"), n_kijun).over(base)
    chikou = F.lead(price, n_kijun).over(base)
    return (
        staged.withColumns(
            {
                "tenkan": F.col("__tenkan"),
                "kijun": F.col("__kijun"),
                "senkou_a": senkou_a,
                "senkou_b": senkou_b,
                "chikou": chikou,
            }
        )
        .drop("__tenkan", "__kijun", "__mid_s")
    )


def with_keltner(
    daily: DataFrame,
    n_ma: int = 10,
    n_atr: int = 10,
    k: float = 2.0,
    key: str = "ticker",
    day: str = "day",
    high: str = "high",
    low: str = "low",
    close: str = "close",
) -> DataFrame:
    """Keltner channel, SMA form: basis = SMA(typical price, n_ma),
    bands = basis ± k·ATR(n_atr) (the EMA-basis variant is the EWMA
    kernel's job, like Wilder RSI/ATR). Works on 3·TP = H+L+C (exact
    in double for fixed-point prices → lossless DECIMAL running sums);
    the /3 happens once, after the exact frame difference. Bands are
    null until BOTH windows fill, and reuse with_atr's decimal ATR —
    all passes share the one (key, day) shuffle+sort."""
    d = with_atr(daily, n=n_atr, key=key, day=day, high=high, low=low, close=close)
    base = Window.partitionBy(key).orderBy(day)
    tp3 = F.col(high) + F.col(low) + F.col(close)
    staged = d.withColumn("__tp3", tp3)
    s = _running(base, F.col("__tp3"), "decimal(18,4)")
    c_run = F.count("__tp3").over(base.rowsBetween(Window.unboundedPreceding, 0))
    tp3_n = _frame_diff(base, s, n_ma, F.lit(0).cast("decimal(28,4)"))
    c_n = c_run - F.coalesce(F.lag(c_run, n_ma).over(base), F.lit(0))
    basis = F.when(c_n >= n_ma, tp3_n.cast("double") / c_n / 3.0)
    return staged.withColumns(
        {
            "kc_mid": basis,
            "kc_upper": basis + F.lit(k) * F.col("atr"),
            "kc_lower": basis - F.lit(k) * F.col("atr"),
        }
    ).drop("__tp3")


def ewm_weights(alpha: float, k: int) -> list[float]:
    """Adjusted-EWM kernel weights (1-alpha)^j, truncated to k terms."""
    w = [1.0]
    for _ in range(k - 1):
        w.append(w[-1] * (1.0 - alpha))
    return w


def left_prefix(weights: list[float]) -> list[float]:
    """Left-associated prefix sums — the accumulation order an oracle's
    CASE-chain denominator evaluates in, so both sides are bit-equal."""
    out, acc = [], 0.0
    for w in weights:
        acc = acc + w
        out.append(acc)
    return out


#: Truncation lengths: (1-alpha)^K ≤ ~2e-4 tail weight for each span —
#: the truncated adjusted EWM is a self-consistent operator computed
#: identically by kernel and oracle (truncation is a design constant,
#: not an approximation gap), and the bounded lookback is what keeps it
#: a windowed operator at scale. K_slow is additionally capped by
#: DuckDB's expression-tree depth limit (128): the oracle's
#: left-associated lag chain parses one level deep per term.
MACD_K_FAST, MACD_K_SLOW, MACD_K_SIG = 70, 110, 52


def halo_block_apply(
    bars: DataFrame,
    kernel_rows,
    halo: int,
    block_size: int,
    out_schema: str,
    key: str = "ticker",
    ts: str = "ts",
    seq: str = "seq",
    cols: tuple[str, ...] = ("price",),
) -> DataFrame:
    """Shared halo-block scaffolding (the q_ewma lowering): cut each
    key's (ts, seq)-ordered row sequence into ``block_size``-row blocks,
    replicate the ``halo`` rows preceding a block into it, and run
    ``kernel_rows(pdf_sorted, own_mask)`` per (key, block) — ``pdf`` is
    rn-sorted with columns (key, ts, seq, *cols, rn, blk) and
    ``own_mask`` selects the rows the block must EMIT (halo copies are
    compute-only). A hot key parallelizes across blocks with O(block)
    task state; a key's final partial block spills a few halo copies
    into a phantom block that emits nothing — harmless."""
    if block_size < halo + 1:
        raise ValueError("block_size must exceed the halo")
    BLOCK = block_size

    def kernel(pdf):
        pdf = pdf.sort_values("rn", kind="mergesort")
        own = (pdf["rn"].to_numpy() // BLOCK) == pdf["blk"].to_numpy()
        return kernel_rows(pdf, own)

    w = Window.partitionBy(key).orderBy(ts, seq)
    rows = bars.select(key, ts, seq, *cols).withColumn(
        "rn", F.row_number().over(w) - 1
    )
    blk = (F.col("rn") / BLOCK).cast("long")
    pos = F.col("rn") % BLOCK
    exploded = rows.withColumn(
        "blk",
        F.explode(
            F.when(
                pos >= BLOCK - halo, F.array(blk, blk + F.lit(1))
            ).otherwise(F.array(blk))
        ),
    )
    return exploded.groupBy(key, "blk").applyInPandas(kernel, out_schema)


def macd_blocked(
    bars: DataFrame,
    block_size: int = 4096,
    key: str = "ticker",
    ts: str = "ts",
    price: str = "price",
    seq: str = "seq",
) -> DataFrame:
    """MACD(12, 26, 9) — adjusted, truncated-kernel form — as ONE
    halo-block Arrow pass (``halo_block_apply``, composed):

    macd = EMA12(price) - EMA26(price); signal = EMA9 OVER THE MACD
    SERIES; histogram = macd - signal. The signal convolution consumes
    in-block macd values, so the halo is (K_slow-1) + (K_sig-1) rows:
    the last K_sig-1 halo rows' macd values are themselves complete
    (their price windows live inside the halo), deeper halo rows carry
    garbage macd that no emitted row reads. Denominators are
    position-dependent (adjusted EWM) via min(local_index, K-1) — for
    non-first blocks every consumed index is past all caps, for block 0
    local==global. All j-loops accumulate in the oracle's
    left-associated order, so the differential is hash-exact.

    The recursive (adjust=False) EMA is the streaming kernel's job
    (streaming/stateful.ewma_per_key_stateful); this is the bounded-
    lookback batch form that parallelizes across blocks of a hot key."""
    import numpy as np
    import pandas as pd

    w_fast = ewm_weights(2.0 / 13.0, MACD_K_FAST)
    w_slow = ewm_weights(2.0 / 27.0, MACD_K_SLOW)
    w_sig = ewm_weights(2.0 / 10.0, MACD_K_SIG)

    def kernel_rows(pdf: pd.DataFrame, own) -> pd.DataFrame:
        x = pdf[price].to_numpy(dtype=np.float64)
        n = len(x)

        def conv(series, weights):
            # NULL-aware, mirroring the oracle's coalesce/CASE chains:
            # a null (NaN in the Arrow batch) lag contributes nothing to
            # the numerator AND its weight leaves the denominator, so an
            # EMA over a gappy window is the weighted mean of the prices
            # that exist. The denominator accumulates in the SAME
            # left-associated j-order as the numerator (and as the old
            # dense-prefix table), so clean-data outputs are
            # bit-identical to before. A window with no prices at all
            # (den == 0) leaves the EMA undefined: NaN here, emitted as
            # NULL below — never a 0/0 artifact.
            m = ~np.isnan(series)
            sz = np.where(m, series, 0.0)
            num = np.zeros(n, dtype=np.float64)
            den = np.zeros(n, dtype=np.float64)
            for j, wt in enumerate(weights):
                if j >= n:
                    break
                num[j:] += sz[: n - j] * wt
                den[j:] += m[: n - j] * wt
            with np.errstate(invalid="ignore", divide="ignore"):
                out = num / den
            out[den == 0.0] = np.nan
            return out

        ema_f = conv(x, w_fast)
        ema_s = conv(x, w_slow)
        macd = ema_f - ema_s
        signal = conv(macd, w_sig)
        hist = macd - signal

        def col(a):
            # NaN -> NULL: the oracle's 0/0 yields SQL NULL; an Arrow
            # float64 column would keep NaN, hash-diverging on 'NaN'
            out = pd.array(a[own], dtype="Float64")
            out[np.isnan(a[own])] = pd.NA
            return out

        return pd.DataFrame(
            {
                key: pdf[key].to_numpy()[own],
                seq: pdf[seq].to_numpy()[own],
                "macd": col(macd),
                "signal": col(signal),
                "histogram": col(hist),
            }
        )

    return halo_block_apply(
        bars,
        kernel_rows,
        halo=(MACD_K_SLOW - 1) + (MACD_K_SIG - 1),
        block_size=block_size,
        out_schema=(
            f"{key} string, {seq} bigint, "
            "macd double, signal double, histogram double"
        ),
        key=key, ts=ts, seq=seq, cols=(price,),
    )


def with_roc_cmo(
    bars: DataFrame,
    n_roc: int = 12,
    n_cmo: int = 14,
    key: str = "ticker",
    ts: str = "ts",
    price: str = "price",
    seq: str = "seq",
) -> DataFrame:
    """Rate of change (ROC) and Chande momentum oscillator (CMO).

    ROC(n) = 100·(price/price[-n] − 1): a pure lag expression, no
    aggregation at all. CMO(n) = 100·(Su − Sd)/(Su + Sd) over n-period
    gain/loss sums — the RSI machinery (exact decimal running-sum
    differences) with a symmetric-normalized output in [-100, 100].
    Both ride ONE (key, ts, seq) shuffle+sort. ROC is null until n
    prior rows exist (or a zero base price); CMO is null until n deltas
    exist and 0 when the window is flat (Su = Sd = 0)."""
    base = Window.partitionBy(key).orderBy(ts, seq)
    prior = F.lag(price, n_roc).over(base)
    roc = F.when(
        prior.isNotNull() & (prior != 0.0),
        (F.col(price) / prior - 1.0) * 100.0,
    )
    delta = F.col(price) - F.lag(price).over(base)
    g = F.when(delta > 0, delta).otherwise(F.lit(0.0))
    l = F.when(delta < 0, -delta).otherwise(F.lit(0.0))
    with_d = bars.withColumns(
        {"__g": g, "__l": l, "__has": delta.isNotNull().cast("long")}
    )
    sg = _running(base, F.col("__g"), "decimal(18,4)")
    sl = _running(base, F.col("__l"), "decimal(18,4)")
    sh = F.sum("__has").over(base.rowsBetween(Window.unboundedPreceding, 0))
    zero = F.lit(0).cast("decimal(28,4)")
    g_n = _frame_diff(base, sg, n_cmo, zero).cast("double")
    l_n = _frame_diff(base, sl, n_cmo, zero).cast("double")
    h_n = sh - F.coalesce(F.lag(sh, n_cmo).over(base), F.lit(0))
    cmo = F.when(h_n >= n_cmo,
        F.when((g_n == 0.0) & (l_n == 0.0), F.lit(0.0)).otherwise(
            (g_n - l_n) / (g_n + l_n) * 100.0
        ),
    )
    return (
        with_d.withColumn("roc", roc)
        .withColumn("cmo", cmo)
        .drop("__g", "__l", "__has")
    )


def with_cmf_adl(
    daily_vol: DataFrame,
    n: int = 20,
    key: str = "ticker",
    day: str = "day",
    high: str = "high",
    low: str = "low",
    close: str = "close",
    vol: str = "vol",
) -> DataFrame:
    """Accumulation/distribution line (ADL) and Chaikin money flow (CMF)
    over daily H/L/C/volume bars.

    Money-flow multiplier MFM = ((C−L) − (H−C))/(H−L) (0 on a flat
    H = L bar) is one fixed-order double expression; money-flow volume
    MFM·vol is cast to DECIMAL(28,8) so the ADL running sum and the
    CMF frame sums are exact and order-insensitive (the q_atr cast
    discipline). CMF(n) = Σn MFV / Σn vol with the volume sum in pure
    LONG arithmetic; null until n bars exist, and null on an all-zero
    n-bar volume sum (an undefined ratio — and an engine-dependent one:
    Spark non-ANSI yields NULL on /0 while IEEE float engines yield
    ±inf/NaN, so the gate keeps the semantics portable). One (key, day)
    shuffle+sort serves the running sums and every frame difference."""
    base = Window.partitionBy(key).orderBy(day)
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    hl = F.col(high) - F.col(low)
    mfm = F.when(hl == 0.0, F.lit(0.0)).otherwise(
        ((F.col(close) - F.col(low)) - (F.col(high) - F.col(close))) / hl
    )
    d = daily_vol.withColumn("__mfv", (mfm * F.col(vol)).cast("decimal(28,8)"))
    s_mfv = F.sum("__mfv").over(run)
    s_vol = F.sum(F.col(vol).cast("long")).over(run)
    c_run = F.count(vol).over(run)
    zero = F.lit(0).cast("decimal(38,8)")
    mfv_n = (s_mfv - F.coalesce(F.lag(s_mfv, n).over(base), zero)).cast("double")
    vol_n = s_vol - F.coalesce(F.lag(s_vol, n).over(base), F.lit(0))
    c_n = c_run - F.coalesce(F.lag(c_run, n).over(base), F.lit(0))
    return (
        d.withColumn("adl", s_mfv.cast("double"))
        .withColumn("cmf", F.when((c_n >= n) & (vol_n != 0), mfv_n / vol_n))
        .drop("__mfv")
    )


def with_ulcer(
    daily: DataFrame,
    n: int = 14,
    key: str = "ticker",
    day: str = "day",
    close: str = "close",
) -> DataFrame:
    """Ulcer index(n): sqrt(mean of squared percent drawdowns from the
    n-period rolling high). The rolling high is a direct n-row frame max
    (the Donchian lowering — no running-sum shortcut exists for max);
    drawdown dd = 100·(close/maxn − 1) ≤ 0 is a fixed-order double, and
    dd² is cast to DECIMAL(28,8) so the n-period mean rides the exact
    running-sum difference. Null until n bars exist; a zero rolling
    high (all-zero closes in frame) nulls the bar's dd² — undefined,
    and the explicit gate is what DuckDB's NULL-on-/0 does implicitly
    while ANSI Spark would DIVIDE_BY_ZERO. One (key, day) shuffle+sort
    serves the frame max, the running sum, and the lags."""
    base = Window.partitionBy(key).orderBy(day)
    frame = base.rowsBetween(-(n - 1), 0)
    maxn = F.max(close).over(frame)
    dd = F.when(maxn != 0, (F.col(close) / maxn - 1.0) * 100.0)
    d = daily.withColumn("__dd2", (dd * dd).cast("decimal(28,8)"))
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    s = F.sum("__dd2").over(run)
    c_run = F.count("__dd2").over(run)
    zero = F.lit(0).cast("decimal(38,8)")
    s_n = (s - F.coalesce(F.lag(s, n).over(base), zero)).cast("double")
    c_n = c_run - F.coalesce(F.lag(c_run, n).over(base), F.lit(0))
    ulcer = F.when(c_n >= n, F.sqrt(s_n / c_n))
    return d.withColumn("ulcer", ulcer).drop("__dd2")


def with_vortex(
    daily: DataFrame,
    n: int = 14,
    key: str = "ticker",
    day: str = "day",
    high: str = "high",
    low: str = "low",
    close: str = "close",
) -> DataFrame:
    """Vortex indicator: VI+(n) = Σn|H − prev L| / Σn TR and
    VI−(n) = Σn|L − prev H| / Σn TR.

    Each key's first bar (no previous bar) contributes nothing — all
    three terms are null there and a __has counter gates emission until
    n full terms exist, so the ratio never mixes a partial window.
    VM± and TR are fixed-order double expressions cast to
    DECIMAL(18,6) for exact running-sum-difference frame sums. One
    (key, day) shuffle+sort serves every lag and running sum."""
    base = Window.partitionBy(key).orderBy(day)
    prev_h = F.lag(high).over(base)
    prev_l = F.lag(low).over(base)
    prev_c = F.lag(close).over(base)
    hl = F.col(high) - F.col(low)
    tr = F.greatest(hl, F.abs(F.col(high) - prev_c), F.abs(F.col(low) - prev_c))
    d = daily.withColumns(
        {
            "__vmp": F.abs(F.col(high) - prev_l).cast("decimal(18,6)"),
            "__vmm": F.abs(F.col(low) - prev_h).cast("decimal(18,6)"),
            "__tr": tr.cast("decimal(18,6)"),
            "__has": prev_c.isNotNull().cast("long"),
        }
    )
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    zero = F.lit(0).cast("decimal(28,6)")

    def frame_sum(c):
        s = F.sum(c).over(run)
        return (s - F.coalesce(F.lag(s, n).over(base), zero)).cast("double")

    vmp_n = frame_sum(F.col("__vmp"))
    vmm_n = frame_sum(F.col("__vmm"))
    tr_n = frame_sum(F.col("__tr"))
    sh = F.sum("__has").over(run)
    h_n = sh - F.coalesce(F.lag(sh, n).over(base), F.lit(0))
    gate = (h_n >= n) & (tr_n != 0.0)
    return (
        d.withColumn("vi_plus", F.when(gate, vmp_n / tr_n))
        .withColumn("vi_minus", F.when(gate, vmm_n / tr_n))
        .drop("__vmp", "__vmm", "__tr", "__has")
    )
