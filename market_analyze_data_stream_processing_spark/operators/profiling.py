"""Dataset profiling and distribution-drift operators — the monitoring
layer a 100 TB training-data pipeline runs before/after every ingest:
per-column profiles, PSI (population stability index), two-sample KS
statistic, and chi-squared mix drift between two time slices.

Scale design: every operator is a constant number of hash aggregates /
window passes over the raw table — output cardinality is O(columns) or
O(groups), never O(rows). Drift comparisons NEVER self-join the raw
rows: both periods are tagged in one scan and reduced together, so one
pass computes both marginals. Float discipline: per-bucket terms are
fixed-order double expressions quantized to DECIMAL before any
cross-row sum, so group-aggregate accumulation order (nondeterministic
in a distributed engine) can't flip an oracle hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str], round_digits: int = 6) -> DataFrame:
    """One row per profiled numeric column: row count, null fraction,
    distinct count, min, max, mean.

    ONE scan: ``stack`` unpivots to (col_name, value) rows map-side
    (nulls kept, so count(1) per column is the row count), then ONE
    hash aggregate with a SINGLE distinct computes every statistic.
    This beats the one-row-agg-with-N-countDistincts form ~2×: N
    distinct aggregates force N Expand projections of the full scan,
    while the unpivot pays the same N× row fan-out ONCE and
    partial-aggregates it before the shuffle. Means accumulate in
    DECIMAL so they're exact before the final double division."""
    stack_args = ", ".join(f"'{c}', {c}" for c in cols)
    stacked = df.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, v)"
    )
    agg = stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_filled"),
        F.countDistinct("v").alias("n_distinct"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.sum(F.col("v").cast("decimal(28,6)")).alias("sum_v"),
    )
    p = float(10**round_digits)
    rnd = lambda x: F.floor(x * p + F.lit(0.5)) / F.lit(p)
    return agg.select(
        "col_name",
        "n_rows",
        rnd((F.col("n_rows") - F.col("n_filled")) / F.col("n_rows")).alias(
            "null_frac"
        ),
        "n_distinct",
        rnd(F.col("min_v")).alias("min_v"),
        rnd(F.col("max_v")).alias("max_v"),
        rnd(F.col("sum_v").cast("double") / F.col("n_filled")).alias("mean_v"),
    )


def psi_drift(
    tagged: DataFrame,
    value: str = "value",
    group: str = "grp",
    period: str = "period",  # 0 = reference, 1 = current
    bucket_width: float = 20.0,
    n_buckets: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """Population stability index per group between two tagged periods.

    Values land in fixed-width buckets (floor(v / width), clamped to
    [0, n_buckets]) — fixed breakpoints, so bucketing is embarrassingly
    parallel and identical across engines (no quantile estimation
    step). Counts are Laplace-smoothed by ``smooth`` so empty buckets
    never produce log(0). Each bucket's (p−q)·ln(p/q) term is quantized
    to DECIMAL(28,12) before the per-group sum — order-insensitive.
    Two hash aggregates total; output is O(groups)."""
    # Total bucket expression, matching bucket_index for EVERY double:
    # NULL/NaN → overflow slot, ±inf → edge slots (a bare
    # floor(v/width).cast('int') saturates floor(±inf) at Long.MaxValue
    # and then ERRORS on the LONG→INT cast under ANSI); the clamp runs
    # on the LONG floor BEFORE the int cast so huge finite values can't
    # overflow it either.
    v = F.col(value)
    b = (
        F.when(v.isNull() | F.isnan(v), F.lit(n_buckets))
        .when(v == float("inf"), F.lit(n_buckets))
        .when(v == float("-inf"), F.lit(0))
        .otherwise(
            F.least(
                F.greatest(F.floor(v / F.lit(bucket_width)), F.lit(0)),
                F.lit(n_buckets),
            )
        )
        .cast("int")
    )
    hist = (
        tagged.withColumn("__b", b)
        .groupBy(group, "__b")
        .agg(
            F.sum(F.when(F.col(period) == 0, 1).otherwise(0)).alias("c_ref"),
            F.sum(F.when(F.col(period) == 1, 1).otherwise(0)).alias("c_cur"),
        )
    )
    # Smoothed shares over the OBSERVED bucket slots of each group (a
    # slot no period ever hit carries no evidence either way, so the
    # metric is defined over observed slots; the smoothing mass in the
    # denominator scales by that same observed-slot count on both
    # sides, and the oracle mirrors the identical convention).
    from pyspark.sql import Window

    w = Window.partitionBy(group)
    nslots = F.count(F.lit(1)).over(w)
    t_ref = F.sum("c_ref").over(w) + F.lit(smooth) * nslots
    t_cur = F.sum("c_cur").over(w) + F.lit(smooth) * nslots
    p_ref = (F.col("c_ref") + F.lit(smooth)) / t_ref
    p_cur = (F.col("c_cur") + F.lit(smooth)) / t_cur
    term = ((p_cur - p_ref) * F.log(p_cur / p_ref)).cast("decimal(28,12)")
    return (
        hist.withColumn("__t", term)
        .groupBy(group)
        .agg(
            F.sum("c_ref").alias("n_ref"),
            F.sum("c_cur").alias("n_cur"),
            F.sum("__t").cast("double").alias("psi"),
        )
    )


def ks_statistic(
    tagged: DataFrame,
    value: str = "value",
    group: str = "grp",
    period: str = "period",
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per group:
    D = max over the merged sample of |F_ref(v) − F_cur(v)|.

    One hash aggregate collapses ties to (group, value) count pairs;
    one (group)-partitioned window ordered by value forms both
    empirical CDFs cumulatively (counts stay in LONG — exact); the
    ratio/abs/max are order-insensitive. No sort of raw rows: the
    window sorts the DISTINCT values only. Output is O(groups).

    A group present in only one period has no second CDF to compare:
    ks_d is NULL (gated explicitly — Spark's NULL-on-/0 vs an IEEE
    engine's NaN would otherwise diverge on that edge)."""
    from pyspark.sql import Window

    per_v = tagged.groupBy(group, value).agg(
        F.sum(F.when(F.col(period) == 0, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col(period) == 1, 1).otherwise(0)).alias("c_cur"),
    )
    w = Window.partitionBy(group).orderBy(value)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(group)
    cum_ref = F.sum("c_ref").over(run)
    cum_cur = F.sum("c_cur").over(run)
    n_ref = F.sum("c_ref").over(tot)
    n_cur = F.sum("c_cur").over(tot)
    d = F.when(
        (n_ref > 0) & (n_cur > 0), F.abs(cum_ref / n_ref - cum_cur / n_cur)
    )
    return (
        per_v.select(group, n_ref.alias("n_ref"), n_cur.alias("n_cur"), d.alias("__d"))
        .groupBy(group)
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.max("__d").alias("ks_d"),
        )
    )


def chi2_mix(
    tagged: DataFrame,
    group: str = "grp",
    period: str = "period",
) -> DataFrame:
    """Chi-squared contribution per category for a 2×K contingency
    table (period × group): for each cell, (observed − expected)²/
    expected with expected = row_total·col_total/grand_total.

    Counts are exact LONGs from one hash aggregate; the K column
    totals are a tiny second aggregate broadcast back (O(K) rows).
    Each category's two cell terms are one fixed-order double
    expression — no cross-row float sum at all. Emits per-category
    contributions; the caller sums the DECIMAL-quantized terms if a
    single test statistic is wanted."""
    cells = tagged.groupBy(group).agg(
        F.sum(F.when(F.col(period) == 0, 1).otherwise(0)).alias("o_ref"),
        F.sum(F.when(F.col(period) == 1, 1).otherwise(0)).alias("o_cur"),
    )
    totals = cells.agg(
        F.sum("o_ref").alias("t_ref"), F.sum("o_cur").alias("t_cur")
    )
    j = cells.crossJoin(F.broadcast(totals))
    grand = F.col("t_ref") + F.col("t_cur")
    row_tot = F.col("o_ref") + F.col("o_cur")
    e_ref = row_tot * F.col("t_ref") / grand
    e_cur = row_tot * F.col("t_cur") / grand
    # Degenerate-table gate: with an EMPTY period (zero column total —
    # e.g. every row lands on one side of the split) the expected
    # counts are 0 and the statistic is undefined — explicit NULL,
    # never an ANSI DIVIDE_BY_ZERO (found by the +30y time-shift
    # differential; DuckDB yields NaN on the same input).
    contrib = F.when(
        (F.col("t_ref") > 0) & (F.col("t_cur") > 0),
        (F.col("o_ref") - e_ref) * (F.col("o_ref") - e_ref) / e_ref
        + (F.col("o_cur") - e_cur) * (F.col("o_cur") - e_cur) / e_cur,
    )
    return j.select(
        group,
        "o_ref",
        "o_cur",
        contrib.alias("chi2_contrib"),
    )


def psi_from_counts(
    ref: list[int],
    cur: list[int],
    smooth: float = 0.5,
    observed_only: bool = True,
) -> float:
    """PSI from two aligned bucket-count vectors — the pure kernel the
    streaming drift monitor shares with the batch plan. With
    ``observed_only`` (the default) it matches psi_drift's convention
    exactly: the metric is defined over the slots OBSERVED by either
    side (a slot neither period ever hit carries no evidence), and the
    smoothing mass in each denominator scales by that same
    observed-slot count. Pass ``observed_only=False`` to score against
    every slot — required when the reference is ALL-ZERO (unknown key):
    under observed-only, concentrated current mass in one slot
    normalizes to share 1 on both sides and PSI degenerates to 0."""
    import math

    if observed_only:
        observed = [i for i in range(len(ref)) if ref[i] + cur[i] > 0]
    else:
        observed = list(range(len(ref)))
    if not observed:
        return 0.0
    nslots = len(observed)
    t_ref = sum(ref[i] for i in observed) + smooth * nslots
    t_cur = sum(cur[i] for i in observed) + smooth * nslots
    psi = 0.0
    for i in observed:
        p_ref = (ref[i] + smooth) / t_ref
        p_cur = (cur[i] + smooth) / t_cur
        psi += (p_cur - p_ref) * math.log(p_cur / p_ref)
    return psi


def bucket_index(v, bucket_width: float, n_buckets: int) -> int:
    """Total fixed-breakpoint bucketing: floor(v/width) clamped to
    [0, n_buckets], defined for EVERY input, in exact parity with the
    batch psi_drift bucket expression (which gates NULL/NaN to the
    overflow slot n_buckets and ±inf to the edge slots with the same
    CASE — a bare floor(v/width).cast('int') would send Spark NaN to
    slot 0 and ERROR on ±inf under ANSI, so the gates live in BOTH
    lowerings). A pandas float column can't distinguish NULL from NaN,
    so both route to the overflow slot here."""
    if v is None or v != v:
        return n_buckets
    if v == float("inf"):
        return n_buckets
    if v == float("-inf"):
        return 0
    return min(max(int(v // bucket_width), 0), n_buckets)


def bucketize_counts(
    values, bucket_width: float, n_buckets: int
) -> list[int]:
    """Histogram a value iterable with psi_drift's fixed-breakpoint
    bucketing (``bucket_index`` — total, null/NaN-safe); driver-side
    helper for building the frozen reference histogram a drift monitor
    compares against."""
    counts = [0] * (n_buckets + 1)
    for v in values:
        counts[bucket_index(v, bucket_width, n_buckets)] += 1
    return counts
