"""Broadcast Bloom-filter prefiltering — the decontamination scale path.

The exact eval-overlap probe (``plans/text.q_decontaminate``) broadcasts
the eval n-gram SET as a join hash table. That works while the eval side
fits an executor hash map; a production benchmark suite can reach
hundreds of millions of grams, where the hash table (~50+ bytes/entry)
blows the broadcast budget but a bit-packed Bloom filter (~10 bits/key
for <1% FP) still fits comfortably. The pattern here:

1. BUILD distributedly: hash every eval gram to k bit positions, fold
   them into 64-bit words with a ``bit_or`` hash aggregate keyed on the
   word index — the driver collects AT MOST ``m_bits/64`` rows (the
   bitmap size, NOT the eval-set size), so the build scales to any eval
   corpus.
2. PROBE as a scan-level expression: the bitmap ships as an
   ``array<bigint>`` literal inside the plan (a broadcast in spirit —
   serialized once into the task binary), and membership is k
   element_at + shift + mask tests — pure JVM codegen, NO join, NO
   shuffle of the 100 TB corpus side.
3. CONFIRM exactly: Bloom filters have false positives but NO false
   negatives, so filtering survivors through the exact (now tiny)
   broadcast semi-join reproduces the exact answer bit-for-bit. The
   oracle for a Bloom-prefiltered query is therefore the plain exact
   SQL — parity proves the prefilter preserved semantics.

Spark's own ``bloom_filter_agg``/``might_contain`` expressions are
internal (not in the public function registry), so this module builds
the same shape from public API: ``xxhash64`` for the k hashes
(seed-varied via an extra hashed literal column) and ``bit_or``/
``shiftright`` for pack/probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of a value: pmod(xxhash64(value, seed), m).
    Shared by build and probe — any drift between the two would break
    the no-false-negative guarantee."""
    return [
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))
        for seed in range(k)
    ]


def bloom_build(
    keys: DataFrame, col: str = "s", m_bits: int = 1 << 18, k: int = 4
) -> list[int]:
    """Build the bitmap distributedly and return it as ``m_bits/64``
    signed 64-bit words (Spark LONG semantics, index 0 = bits 0-63).

    One explode (k rows per key) → one ``bit_or`` hash aggregate on the
    word index → a driver collect bounded by the BITMAP size: 4096 rows
    for the default 256 Kbit filter, whatever the key count."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("p")
    )
    masks = pos.select(
        F.shiftrightunsigned(F.col("p"), 6).alias("w"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
        ).alias("m"),
    )
    rows = masks.groupBy("w").agg(F.bit_or("m").alias("m")).collect()
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["m"]
    return words


def _bit_test(arr: Column, col: Column, m_bits: int, k: int) -> Column:
    """AND of k (element_at >> bit) & 1 probes of ``col`` against the
    bitmap ``arr``. True for every inserted key (no false negatives);
    true for a tunable ~(1-e^(-kn/m))^k fraction of absent keys."""
    test = F.lit(True)
    for h in _positions(col, m_bits, k):
        word = F.element_at(arr, F.shiftrightunsigned(h, 6).cast("int") + 1)
        bit = F.call_function("shiftright", word, (h % 64).cast("int"))
        test = test & (bit.bitwiseAND(F.lit(1)) == 1)
    return test


def bloom_might_contain(
    col: Column, words: list[int], m_bits: int = 1 << 18, k: int = 4
) -> Column:
    """Expression-form membership test against an in-plan array
    LITERAL. Only for small bitmaps: Spark evaluates a large array
    literal per row (measured ~5× slower at m=2^18 than the
    broadcast-column form), so corpus-scale prefiltering should go
    through :func:`bloom_prefilter` instead."""
    return _bit_test(F.lit(words), col, m_bits, k)


def bloom_prefilter(
    df: DataFrame,
    col: str,
    words: list[int],
    m_bits: int = 1 << 18,
    k: int = 4,
) -> DataFrame:
    """Filter ``df`` to rows whose ``col`` might be in the filter,
    shipping the bitmap as a ONE-ROW broadcast column (the allowlisted
    scalar-broadcast shape) rather than a per-plan literal: the joined
    array is a single shared reference per task instead of a per-row
    literal materialization, which keeps the probe O(k) per row
    whatever the bitmap size — measured 5× faster at the default
    m=2^18 than the literal form, and still join-shuffle-free on the
    corpus side (the 1-row build side broadcasts)."""
    spark = df.sparkSession
    bf = spark.createDataFrame([(words,)], "__bloom_words: array<bigint>")
    return (
        df.crossJoin(F.broadcast(bf))
        .where(_bit_test(F.col("__bloom_words"), F.col(col), m_bits, k))
        .drop("__bloom_words")
    )
