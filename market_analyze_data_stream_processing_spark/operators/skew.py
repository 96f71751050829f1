"""Skew mitigation (SURVEY design notes): salted joins for hot keys.

AQE's skew-join handles most cases at runtime; explicit salting is the
deterministic fallback when one key dominates (e.g. a viral ticker or a
stopword shingle): the big side scatters each hot key across N salt
buckets, the small side replicates N×, restoring parallelism at the
cost of a bounded small-side blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted.

    Salt is derived from a hash of the whole big-side row (deterministic,
    uniform), so rows of one hot key spread over ``n_salts`` reducers.
    Result equals the plain join (salt columns are internal).

    Only join types where replicating the small side cannot duplicate
    output rows are allowed: inner and the left family (outer/semi/anti
    emit each big row based on match existence, which replication
    preserves). right/full would emit unmatched SMALL rows once per salt
    replica — silently wrong, so they raise."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} joins; {how!r} would "
            "duplicate unmatched small-side rows once per salt replica"
        )
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    out = big_salted.join(small_rep, [key, "__salt"], how)
    return out.drop("__salt")
