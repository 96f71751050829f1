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
    p_fast = np.array(left_prefix(w_fast))
    p_slow = np.array(left_prefix(w_slow))
    p_sig = np.array(left_prefix(w_sig))

    def kernel_rows(pdf: pd.DataFrame, own) -> pd.DataFrame:
        x = pdf[price].to_numpy(dtype=np.float64)
        n = len(x)
        idx = np.arange(n)

        def conv(series, weights, prefix, cap):
            num = np.zeros(n, dtype=np.float64)
            for j, wt in enumerate(weights):
                if j >= n:
                    break
                num[j:] += series[: n - j] * wt
            return num / prefix[np.minimum(idx, cap)]

        ema_f = conv(x, w_fast, p_fast, MACD_K_FAST - 1)
        ema_s = conv(x, w_slow, p_slow, MACD_K_SLOW - 1)
        macd = ema_f - ema_s
        signal = conv(macd, w_sig, p_sig, MACD_K_SIG - 1)
        hist = macd - signal
        return pd.DataFrame(
            {
                key: pdf[key].to_numpy()[own],
                seq: pdf[seq].to_numpy()[own],
                "macd": macd[own],
                "signal": signal[own],
                "histogram": hist[own],
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
