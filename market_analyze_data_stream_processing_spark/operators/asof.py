"""Two-table as-of join (point-in-time / trade-vs-quote alignment).

For every left row, attach the LATEST right row with the same key and
``right_ts <= left_ts`` — the canonical market-data alignment (the
reference aligns intraday metrics against the last known close the same
way, metrics.py-style "last value at or before t").

Spark has no ASOF JOIN operator; a naive range join
(``l.ts >= r.ts`` + window) explodes to O(|L|·|R|) per key before
pruning. This implementation is the UNION + single-window form instead:
tag both sides, union them, and carry the right-side columns forward
with ``last(ignorenulls)`` over one (key, ts)-ordered window — ONE
shuffle on the join key, O(|L|+|R|) rows, no pair blow-up. The same
shape Structured Streaming's stream-stream as-of would lower to with a
state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: all left columns, plus ``right_ts`` and
    ``right_cols`` from the latest right row with ``right_ts`` at or
    before ``left_ts`` (NULLs when no such row). Column names across the
    two inputs must be disjoint apart from ``on``. At equal timestamps
    the right row IS visible to the left row (<= semantics, matching
    SQL ASOF JOIN)."""
    carry = [right_ts, *right_cols]
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    for c in carry:
        lt = lt.withColumn(c, F.lit(None))
    rt = right.select(
        *on, F.col(right_ts).alias("__t"), F.lit(0).alias("__is_left"), *carry
    )
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    unioned = lt.unionByName(rt.select(*lt.columns))
    # right rows sort before left rows at the same __t so <= holds
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carry:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.where(F.col("__is_left") == 1).drop("__t", "__is_left")
