"""Exact distributed heavy hitters via a Misra-Gries candidate pass +
exact recount — the two-pass shape that finds every item with frequency
> N/k over a corpus too large to groupBy in full.

Why not just ``groupBy(item).count()``? At 100 TB the full-vocabulary
aggregate shuffles every distinct item (web-scale token/URL/entity
vocabularies run to billions of keys, mostly singletons). The MG pass
bounds the shuffle to ≤ k candidate rows PER PARTITION — constant
output per task regardless of input size — and the pigeonhole argument
makes it lossless for the final answer: if count(x) > N/k globally,
then count_p(x) > N_p/k in at least one partition p, and Misra-Gries
with k counters retains every item whose partition-local count exceeds
N_p/k (its decrement total is < N_p/k). So the candidate union is a
SUPERSET of the true heavy hitters; the second pass recounts ONLY the
candidates (broadcast semi-join — no wide shuffle) and applies the
exact threshold, discarding false positives. Output is therefore
exact and independent of partitioning, even though the intermediate
candidate sets are not.

Reference parity: extends the reference's frequency analytics (its
pandas value_counts-style summaries, main.py) with the bounded-memory
distributed form a 100 TB corpus needs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_update(counters: dict[str, int], values, k: int) -> dict[str, int]:
    """Sequential Misra-Gries update: fold ``values`` into ``counters``
    (≤ k entries, mutated in place and returned). Shared by the batch
    per-partition pass and the streaming stateful twin."""
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def misra_gries_partials(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ k (item, lower-bound)
    rows per partition. Arrow-batched (mapInPandas) — the counter dict
    lives across the partition's batches, O(k) state per task."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            mg_update(counters, pdf[col], k)
        yield pd.DataFrame(
            {"item": list(counters.keys()), "lb": list(counters.values())}
        )

    return items.select(F.col(col).alias(col)).mapInPandas(
        mg, schema="item string, lb long"
    )


def heavy_hitters(items: DataFrame, col: str, k: int) -> DataFrame:
    """All items with exact frequency > N/k, with exact counts.

    Pass 1: Misra-Gries candidates per partition (≤ k rows each, a
    guaranteed superset of the answer — see module doc). Pass 2:
    broadcast the deduped candidates, semi-join-recount only them, and
    keep counts strictly above N/k. N rides along as a 1-row broadcast
    contract scalar (no driver round-trip in the plan)."""
    src = items.select(F.col(col).alias("item"))
    cands = misra_gries_partials(src, "item", k).select("item").distinct()
    total = src.agg(F.count(F.lit(1)).alias("total"))
    counts = (
        src.join(F.broadcast(cands), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("total"))
        .select(
            "item",
            "cnt",
            (F.col("cnt") / F.col("total")).alias("share"),
        )
    )
