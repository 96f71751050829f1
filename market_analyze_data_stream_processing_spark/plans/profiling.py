"""Dataset profiling / distribution-drift queries — the pre-ingest
monitoring layer of a training-data pipeline (column profiles, PSI, KS,
chi-squared mix drift), oracle-checked like every other operator.

Drift queries tag the two halves of January 2024 (boundary 2024-01-16,
which splits the synthetic events table at every SF) in ONE scan —
never two scans or a self-join — then reduce to O(groups) rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalars import stable_round
from ..operators.profiling import chi2_mix, column_profile, ks_statistic, psi_drift
from ..sources.tables import load_table, plan_memo, spread
from .registry import register

_SPLIT = "2024-01-16"

#: DuckDB CTE mirroring _tagged() below.
_TAGGED_CTE = f"""
WITH tagged AS (
    SELECT event_type AS grp, value,
           CASE WHEN ts < TIMESTAMP '{_SPLIT} 00:00:00' THEN 0 ELSE 1 END
               AS period
    FROM events
)
"""


@plan_memo
def _tagged(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        "value",
        F.when(F.col("ts") < F.lit(f"{_SPLIT} 00:00:00").cast("timestamp"), 0)
        .otherwise(1)
        .alias("period"),
    )


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _profile_col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS col_name,
           count(*) AS n_rows,
           floor((count(*) - count({c})) / CAST(count(*) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS null_frac,
           count(DISTINCT {c}) AS n_distinct,
           floor(min({c}) * 1000000 + 0.5) / 1000000 AS min_v,
           floor(max({c}) * 1000000 + 0.5) / 1000000 AS max_v,
           floor(CAST(sum(CAST({c} AS DECIMAL(28,6))) AS DOUBLE)
                 / count({c}) * 1000000 + 0.5) / 1000000 AS mean_v
    FROM lineitem"""


@register(
    "q_column_profile",
    " UNION ALL ".join(_profile_col_sql(c) for c in _PROFILE_COLS),
    doc="Per-column dataset profile over lineitem's numeric columns: "
    "row count, null fraction, exact distinct count, min/max, mean — "
    "ONE scan for every column (at 100 TB this is the difference "
    "between 1 pass and |columns| passes). stack() unpivots map-side "
    "to (col_name, value) rows and ONE hash aggregate with a single "
    "distinct does the rest: measured ~2× faster than a one-row "
    "aggregate carrying N countDistincts, whose N Expand projections "
    "each replay the full scan. Means accumulate in DECIMAL, exact "
    "before the one double division.",
)
def q_column_profile(spark, sf_dir):
    # The single-file local scan serialized the stack-unpivot fan-out
    # (|cols|x rows) plus its value-level partial aggregate onto ONE
    # task — thread dumps showed one straggler in hashAgg while 31
    # cores idled (guide §2.5 input skew). Project to the profiled
    # columns FIRST (guide §2.3: shuffle 4 numeric columns, not the
    # row), then spread across cores; on a many-split production scan
    # the repartition cost is the narrow projection, and the unpivot
    # parallelism comes for free either way.
    li = load_table(spark, sf_dir, "lineitem")
    return column_profile(
        spread(li.select(*_PROFILE_COLS)), _PROFILE_COLS, round_digits=6
    )


@register(
    "q_psi_drift",
    _TAGGED_CTE
    + """
    , hist AS (
        -- total bucket mirror of operators/profiling.psi_drift:
        -- NULL/NaN -> overflow slot, +/-inf -> edge slots, clamp on
        -- the un-cast floor (DuckDB CAST(floor(inf) AS INT) errors
        -- just like Spark's ANSI LONG->INT saturation cast)
        SELECT grp,
               CAST(CASE WHEN value IS NULL OR isnan(value) THEN 20
                         WHEN value = 'Infinity'::DOUBLE THEN 20
                         WHEN value = '-Infinity'::DOUBLE THEN 0
                         ELSE greatest(least(floor(value / 25.0), 20), 0)
                    END AS INT) AS b,
               sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS c_ref,
               sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS c_cur
        FROM tagged GROUP BY 1, 2
    ), sh AS (
        SELECT grp, c_ref, c_cur,
               count(*) OVER w AS nslots,
               sum(c_ref) OVER w AS t_ref,
               sum(c_cur) OVER w AS t_cur
        FROM hist
        WINDOW w AS (PARTITION BY grp)
    ), terms AS (
        SELECT grp, c_ref, c_cur,
               CAST(((c_cur + 0.5::DOUBLE) / (t_cur + 0.5::DOUBLE * nslots)
                     - (c_ref + 0.5::DOUBLE) / (t_ref + 0.5::DOUBLE * nslots))
                    * ln(((c_cur + 0.5::DOUBLE) / (t_cur + 0.5::DOUBLE * nslots))
                         / ((c_ref + 0.5::DOUBLE) / (t_ref + 0.5::DOUBLE * nslots)))
                    AS DECIMAL(28,12)) AS t
        FROM sh
    )
    SELECT grp,
           CAST(sum(c_ref) AS BIGINT) AS n_ref,
           CAST(sum(c_cur) AS BIGINT) AS n_cur,
           floor(CAST(sum(t) AS DOUBLE) * 1000000000 + 0.5) / 1000000000 AS psi
    FROM terms GROUP BY grp
    """,
    doc="Population stability index per event_type between the two "
    "halves of the month (fixed-width buckets floor(value/25) clamped "
    "to [0, 20] — fixed breakpoints, so bucketing is embarrassingly "
    "parallel, no quantile-estimation pre-pass). Laplace smoothing 0.5 "
    "keeps empty buckets finite; each (p−q)·ln(p/q) term is quantized "
    "to DECIMAL(28,12) before the per-group sum, so distributed "
    "accumulation order can't flip the hash. Both periods are tagged "
    "in ONE scan; two hash aggregates total; output O(groups).",
)
def q_psi_drift(spark, sf_dir):
    out = psi_drift(
        _tagged(spark, sf_dir),
        bucket_width=25.0,
        n_buckets=20,
        smooth=0.5,
    )
    return out.select(
        "grp",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        stable_round(F.col("psi"), 9).alias("psi"),
    )


@register(
    "q_ks_drift",
    _TAGGED_CTE
    + """
    , per_v AS (
        SELECT grp, value,
               sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS c_ref,
               sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS c_cur
        FROM tagged GROUP BY 1, 2
    ), cdf AS (
        SELECT grp,
               sum(c_ref) OVER tot AS n_ref,
               sum(c_cur) OVER tot AS n_cur,
               CASE WHEN sum(c_ref) OVER tot > 0 AND sum(c_cur) OVER tot > 0
                    THEN abs(CAST(sum(c_ref) OVER run AS DOUBLE) / sum(c_ref) OVER tot
                             - CAST(sum(c_cur) OVER run AS DOUBLE) / sum(c_cur) OVER tot)
               END AS d
        FROM per_v
        WINDOW run AS (PARTITION BY grp ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               tot AS (PARTITION BY grp)
    )
    SELECT grp,
           CAST(max(n_ref) AS BIGINT) AS n_ref,
           CAST(max(n_cur) AS BIGINT) AS n_cur,
           floor(max(d) * 1000000000 + 0.5) / 1000000000 AS ks_d
    FROM cdf GROUP BY grp
    """,
    doc="Two-sample Kolmogorov–Smirnov statistic per event_type between "
    "the two halves of the month: D = max |F_ref(v) − F_cur(v)| over "
    "the merged sample. One hash aggregate collapses ties to (group, "
    "value) counts; one window ordered by the DISTINCT values (never "
    "the raw rows) forms both empirical CDFs cumulatively in LONG "
    "arithmetic; ratio/abs/max are order-insensitive. Output O(groups).",
)
def q_ks_drift(spark, sf_dir):
    out = ks_statistic(_tagged(spark, sf_dir))
    return out.select(
        "grp",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        stable_round(F.col("ks_d"), 9).alias("ks_d"),
    )


@register(
    "q_chi2_mix",
    _TAGGED_CTE
    + """
    , cells AS (
        SELECT grp,
               sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS o_ref,
               sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS o_cur
        FROM tagged GROUP BY 1
    ), tot AS (
        SELECT sum(o_ref) AS t_ref, sum(o_cur) AS t_cur FROM cells
    )
    SELECT grp,
           CAST(o_ref AS BIGINT) AS o_ref,
           CAST(o_cur AS BIGINT) AS o_cur,
           -- degenerate-table gate: an EMPTY period (zero column
           -- total) leaves the statistic undefined -> NULL on both
           -- engines (found by the +30y time-shift differential)
           CASE WHEN t_ref > 0 AND t_cur > 0 THEN
           floor(((o_ref - (o_ref + o_cur) * t_ref / CAST(t_ref + t_cur AS DOUBLE))
                  * (o_ref - (o_ref + o_cur) * t_ref / CAST(t_ref + t_cur AS DOUBLE))
                  / ((o_ref + o_cur) * t_ref / CAST(t_ref + t_cur AS DOUBLE))
                  + (o_cur - (o_ref + o_cur) * t_cur / CAST(t_ref + t_cur AS DOUBLE))
                  * (o_cur - (o_ref + o_cur) * t_cur / CAST(t_ref + t_cur AS DOUBLE))
                  / ((o_ref + o_cur) * t_cur / CAST(t_ref + t_cur AS DOUBLE)))
                 * 1000000000 + 0.5) / 1000000000 END AS chi2_contrib
    FROM cells, tot
    """,
    doc="Chi-squared mix drift: the event-type composition of the two "
    "month halves as a 2×K contingency table; per category, (o−e)²/e "
    "summed over its two cells with e = row_total·col_total/grand. "
    "Counts come from ONE hash aggregate; the 1-row totals frame is "
    "broadcast back (an allowlisted 1-row contract scalar). Each "
    "category's statistic is one fixed-order double expression — no "
    "cross-row float accumulation anywhere. An EMPTY period (zero "
    "column total — all data on one side of the split) degenerates "
    "the 2xK table: NULL statistic on both engines, never an ANSI "
    "DIVIDE_BY_ZERO (+30y time-shift differential finding).",
)
def q_chi2_mix(spark, sf_dir):
    out = chi2_mix(_tagged(spark, sf_dir))
    e_paired = out.select(
        "grp",
        F.col("o_ref").cast("long").alias("o_ref"),
        F.col("o_cur").cast("long").alias("o_cur"),
        stable_round(F.col("chi2_contrib"), 9).alias("chi2_contrib"),
    )
    return e_paired
