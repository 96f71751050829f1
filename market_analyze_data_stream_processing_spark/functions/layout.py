"""Z-order (Morton-curve) data-layout expressions.

A 100 TB table is pruned through file-level min/max statistics; sorting
by ONE column clusters only that column. Interleaving the bits of two
key columns into a single z-value and range-partitioning/sorting by it
clusters BOTH dimensions at once, so predicates on either column skip
most files (the technique behind Delta/Iceberg ``ZORDER BY``). The
z-value itself is a pure integer expression — whole-stage codegen, zero
shuffle to compute; only the final range repartition shuffles, once, at
layout time.

Both a Column builder (engine path) and a SQL-string mirror (DuckDB
oracle) are provided so the computation is differentially testable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton z-value (x in even positions, y in odd)."""
    mask = (1 << bits) - 1
    xs = x.cast("bigint").bitwiseAND(F.lit(mask))
    ys = y.cast("bigint").bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return out


def zvalue_sql(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """ANSI-SQL mirror of :func:`zvalue` (same bit interleave, same
    masking) for the DuckDB oracle."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_sql}) & {mask}) >> {i} & 1) << {2 * i})")
        terms.append(f"(((({y_sql}) & {mask}) >> {i} & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
