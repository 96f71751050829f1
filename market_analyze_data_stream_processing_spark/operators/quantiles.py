"""Strategy-switched quantile-threshold operators: exact percentile for
oracle-checkable correctness, sketch quantiles for 100 TB scale — the
SAME plan shape either way, selected by parameter or by a zero-job size
gate.

Round 13 proved the wire-the-prose discipline (the embedding-cell
blocking escape went from SCALING.md prose to the measured default code
path); this module closes the two remaining stated-but-not-wired scale
swaps in the percentile family:

- :func:`mad_outliers` — SURVEY §2.11's data-quality row said "exact
  percentile with the approx_percentile/KLL swap stated for scale";
  the swap is now a code path (``strategy="sketch"``) with an executed
  sf1 probe (tests/test_quantile_strategies.py) and SCALING.md rows.
- :func:`rfm` — "quantile-boundary swap stated for billion-customer
  scale"; ``strategy="boundaries"`` replaces the three single-task
  ntile sorts with one boundary aggregate (a 1-row broadcast) plus
  map-side comparisons, fully parallel at any customer count.

Strategy selection:

- ``"exact"`` / ``"ntile"``: the registered oracle-checked plans —
  exact ``percentile()`` medians, exact equal-count ntile splits.
- ``"sketch"`` / ``"boundaries"``: the scale forms.
- ``"auto"``: a ZERO-JOB size gate — Catalyst's optimized-plan
  statistics (``sizeInBytes``, file-source bytes; no count() scan) trip
  the scale form above :data:`SIZE_GATE_BYTES`.  The registry queries
  run with ``"auto"``, so the production default IS the gated switch:
  at the oracle-checked SFs (sf0.001–sf1, well under the gate) the plan
  is bit-identical to the exact form, and at 100 TB the same call site
  takes the sketch path without a code change.

Tolerance contract (documented here, measured at sf1 by the probe):

- ``approx_percentile(x, 0.5, accuracy)`` (Greenwald-Khanna) returns an
  actual data value whose RANK differs from the true median rank by at
  most ``n / accuracy`` rows.  At ``accuracy=10_000`` that is 0.01% of
  each group — the sketch median/MAD are values at quantile
  0.5 ± 1e-4, so the outlier threshold ``k * mad`` shifts by at most
  the data's local quantile density over that band, and flag flips are
  confined to rows whose |deviation| falls between the exact and
  sketch thresholds.  The sf1 probe measures the realized deltas
  (median rank drift, threshold delta, flag-flip count).
- Boundary scoring vs ntile: ntile guarantees equal COUNTS, breaking
  metric ties by key; boundary scoring puts all metric ties in one
  bucket (count skew bounded by the tie mass at the 4 boundaries) in
  exchange for removing the global sort.  The sf1 probe measures the
  realized per-customer score agreement.

Reference parity: the reference pipeline computes no robust quantiles
(its analytics are rolling means, `technical_indicators.py`); these
operators extend the engine's data-quality/segmentation family, sized
for the 100 TB goal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import stable_round

#: "auto" trips the scale strategy when the optimizer's estimated input
#: size exceeds this — far above every oracle-checked SF (sf1 orders
#: ≈ 0.2 GiB on disk) and far below where a single-task ntile sort or
#: one-task-per-group exact percentile would actually hurt (tens of GiB
#: of input ≈ hundreds of millions of rows).
SIZE_GATE_BYTES = 8 << 30

#: Greenwald-Khanna rank-error knob: 1/accuracy quantile mass.
DEFAULT_ACCURACY = 10_000


def estimated_input_bytes(df: DataFrame) -> int:
    """Sum of the LEAF relations' Catalyst size estimates — measured
    file bytes for parquet scans.  Reads plan STATISTICS only: no job,
    no count() scan (the property that makes the "auto" gate free;
    contrast the seed_cell_column count() watch item this round also
    closes).

    Leaves, not the root: without table stats Catalyst estimates a
    join's output as ~|left|·|right| row-width products — the sf1
    orders⋈customer frame "estimates" at 3 TB while its actual inputs
    are ~0.3 GiB of files (caught by the sf1 probe test).  Leaf file
    sizes are measured facts and are exactly the quantity the gate is
    about: how much data the quantile pass must chew through."""
    plan = df._jdf.queryExecution().optimizedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.length()):
        total += int(str(leaves.apply(i).stats().sizeInBytes()))
    return total


def _resolve(strategy: str, df: DataFrame, exact_name: str, scale_name: str) -> str:
    if strategy == "auto":
        return scale_name if estimated_input_bytes(df) > SIZE_GATE_BYTES else exact_name
    if strategy not in (exact_name, scale_name):
        raise ValueError(
            f"strategy must be 'auto', '{exact_name}' or '{scale_name}'; got {strategy!r}"
        )
    return strategy


def mad_outliers(
    grouped: DataFrame,
    group_col: str = "segment",
    value_col: str = "x",
    k: float = 4.4478,
    strategy: str = "auto",
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Per-group median/MAD robust outlier summary over ``(group, x)``.

    Output: group_col, n, med, mad, n_outliers, outlier_pct — the
    q_mad_outliers contract (plans/advanced.py), flagging
    ``|x - med| > k * mad`` (k = 3 * 1.4826: robust z > 3).

    ``strategy="exact"`` is the oracle-checked form: two exact
    ``percentile`` aggregates with 9dp floor-form snaps (cross-engine
    interpolation parity), each group concentrating into one task.
    ``strategy="sketch"`` is the same three-scan shape with
    ``approx_percentile`` — mergeable GK sketches, map-side combined,
    no single-task group concentration, rank error ≤ n/accuracy
    (tolerance contract in the module docstring).  ``"auto"`` gates on
    :func:`estimated_input_bytes`.
    """
    strategy = _resolve(strategy, grouped, "exact", "sketch")
    g = F.col(group_col)
    o = grouped.select(g.alias("__g"), F.col(value_col).alias("__x"))
    med_expr = (
        "percentile({c}, 0.5)"
        if strategy == "exact"
        else f"approx_percentile({{c}}, 0.5, {int(accuracy)})"
    )
    med = o.groupBy("__g").agg(
        stable_round(F.expr(med_expr.format(c="__x")), 9).alias("med")
    )
    dev = o.join(F.broadcast(med), "__g").withColumn(
        "adev", F.abs(F.col("__x") - F.col("med"))
    )
    if strategy == "exact":
        # Round-15 pass fusion, EXACT strategy only (guide §2.4 — drop a
        # whole scan+exchange): the former third pass re-scanned the
        # joined input just to count adev > k·mad after the MAD pass.
        # Exact percentile already concentrates each group's values into
        # one task (an ObjectHashAggregate buffer), so collecting the
        # group's sorted adev array costs the same class of memory — and
        # the array yields BOTH the MAD and the outlier count in one
        # aggregate. Two scans instead of three, ~10 stages instead of
        # 15. The sketch strategy keeps the three-scan shape: at 100 TB
        # per-group arrays are exactly what it exists to avoid.
        arr = dev.groupBy("__g").agg(
            F.first("med").alias("med"),
            F.count(F.lit(1)).alias("n"),
            F.sort_array(F.collect_list("adev")).alias("__arr"),
        )
        # Spark Percentile interpolation at q=0.5, verbatim: position =
        # 0.5·(size−1) has fraction exactly 0 or 0.5, so the result is
        # arr[k0] (odd size) or lower·0.5 + upper·0.5 (even size) — the
        # same multiply-then-add tree as Percentile.getPercentile's
        # lower·(higher−pos) + higher·(pos−lower); bit-identical.
        sz = F.size("__arr")
        k0 = F.greatest(
            F.floor((sz - F.lit(1)) / F.lit(2)).cast("int"), F.lit(0)
        )
        lower = F.try_element_at("__arr", k0 + F.lit(1))
        # greatest(..., 1): for an all-NULL group the array is EMPTY and
        # least(k0+2, sz) evaluates to 0 — try_element_at still raises
        # INVALID_INDEX_OF_ZERO for index 0 (only out-of-bounds is
        # forgiven), and without the guard the crash is masked only by
        # the null short-circuit of lower*0.5 + upper*0.5. Index 1 on an
        # empty array is a clean NULL; sz >= 1 values are unchanged.
        upper = F.try_element_at(
            "__arr", F.greatest(F.least(k0 + F.lit(2), sz), F.lit(1))
        )
        raw_mad = F.when(sz % 2 == 1, lower).otherwise(
            lower * F.lit(0.5) + upper * F.lit(0.5)
        )
        withmad = arr.withColumn("mad", stable_round(raw_mad, 9))
        # null-mad groups (no non-null deviations) keep the join form's
        # NULL counts: there the flag column was null for every row, so
        # sum() returned NULL, never 0.
        n_out = F.when(
            F.col("mad").isNotNull(),
            F.size(
                F.filter("__arr", lambda v: v > F.lit(k) * F.col("mad"))
            ).cast("long"),
        )
        return (
            withmad.select(
                F.col("__g").alias(group_col),
                F.col("n"),
                stable_round(F.col("med"), 4).alias("med"),
                stable_round(F.col("mad"), 4).alias("mad"),
                n_out.alias("n_outliers"),
                stable_round(n_out.cast("double") / F.col("n"), 6).alias(
                    "outlier_pct"
                ),
            )
            .orderBy(group_col)
        )
    mad = dev.groupBy("__g").agg(
        F.first("med").alias("med"),
        stable_round(F.expr(med_expr.format(c="adev")), 9).alias("mad"),
    )
    out_flag = F.col("adev") > F.lit(k) * F.col("mad")
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "__g")
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_round(F.first("med"), 4).alias("med"),
            stable_round(F.first("mad"), 4).alias("mad"),
            F.sum(out_flag.cast("long")).alias("n_outliers"),
            stable_round(
                F.sum(out_flag.cast("long")).cast("double") / F.count(F.lit(1)), 6
            ).alias("outlier_pct"),
        )
        .withColumnRenamed("__g", group_col)
        .orderBy(group_col)
    )


def quintile_boundary_scores(
    df: DataFrame,
    metrics: dict[str, str],
    accuracy: int = DEFAULT_ACCURACY,
    n_tiles: int = 5,
) -> DataFrame:
    """Attach 1..n_tiles scores per metric WITHOUT a global sort.

    ``metrics`` maps output score column -> input metric column; higher
    metric ⇒ higher score.  One aggregate computes every boundary
    (``approx_percentile`` at q = 1/n .. (n-1)/n) into a 1-row
    broadcast; scores are map-side ``1 + Σ (x > b_q)`` — the
    q_customer_deciles lowering generalized.  All metric ties share a
    bucket (vs ntile's key-tiebroken equal split); see the module
    tolerance contract.  NULL metric values score 1, matching the
    ntile strategy this substitutes (Spark's default ascending sort
    places NULLs first ⇒ tile 1) — without the guard, ``null > b``
    would null-poison the whole score sum.
    """
    qs = [i / n_tiles for i in range(1, n_tiles)]
    bounds = df.agg(
        *[
            F.expr(
                f"approx_percentile({col}, {q}, {int(accuracy)})"
            ).alias(f"__b_{out}_{i}")
            for out, col in metrics.items()
            for i, q in enumerate(qs)
        ]
    )
    scored = df.crossJoin(F.broadcast(bounds))
    for out, col in metrics.items():
        score = F.lit(1)
        for i in range(len(qs)):
            score = score + (F.col(col) > F.col(f"__b_{out}_{i}")).cast("int")
        scored = scored.withColumn(
            out, F.when(F.col(col).isNull(), F.lit(1)).otherwise(score)
        )
    return scored.drop(
        *[f"__b_{out}_{i}" for out in metrics for i in range(len(qs))]
    )


def rfm(
    orders: DataFrame,
    strategy: str = "auto",
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """RFM segmentation over the orders fact — the q_rfm contract
    (plans/advanced_stats.py): custkey, recency_days, frequency,
    monetary, r, f, m, segment, with score 5 = best on every axis.

    ``strategy="ntile"`` is the oracle-checked form: three ntile(5)
    windows over FULLY tiebroken orders (metric, custkey) — exact
    equal-count quintiles, each an unpartitioned single-task sort
    (fine while customers ≪ facts: the frame is post-aggregation).
    ``strategy="boundaries"`` is the billion-customer form: one
    approx-quantile boundary aggregate + map-side scoring
    (:func:`quintile_boundary_scores`), no global sort anywhere —
    recency scores on ``-recency_days`` so smaller recency (more
    recent) still maps to higher r.  ``"auto"`` gates on
    :func:`estimated_input_bytes` of the orders input.
    """
    strategy = _resolve(strategy, orders, "ntile", "boundaries")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("monetary"),
    )
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    base = (
        per_cust.crossJoin(F.broadcast(anchor))
        .withColumn("monetary", F.col("monetary").cast("double"))
        .withColumn("recency_days", F.datediff(F.col("mx"), F.col("last_order")))
    )
    if strategy == "ntile":
        scored = (
            base.withColumn(
                "r", F.ntile(5).over(Window.orderBy("last_order", "custkey"))
            )
            .withColumn(
                "f", F.ntile(5).over(Window.orderBy("frequency", "custkey"))
            )
            .withColumn(
                "m", F.ntile(5).over(Window.orderBy("monetary", "custkey"))
            )
        )
    else:
        scored = quintile_boundary_scores(
            base.withColumn("neg_recency", -F.col("recency_days")),
            {"r": "neg_recency", "f": "frequency", "m": "monetary"},
            accuracy=accuracy,
        ).drop("neg_recency")
    seg = (
        F.when(
            (F.col("r") >= 4) & (F.col("f") >= 4) & (F.col("m") >= 4), "champion"
        )
        .when((F.col("r") <= 2) & (F.col("f") >= 4), "at_risk")
        .when((F.col("r") >= 4) & (F.col("f") <= 2), "new")
        .otherwise("regular")
    )
    return scored.select(
        "custkey",
        F.col("recency_days").cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        stable_round(F.col("monetary"), 2).alias("monetary"),
        "r",
        "f",
        "m",
        seg.alias("segment"),
    ).orderBy("custkey")
