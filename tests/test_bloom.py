"""Broadcast Bloom prefilter: the no-false-negative contract, the
bounded build collect, and exactness of prefilter+confirm even at a
deliberately FP-heavy bitmap density."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
)


def test_no_false_negatives_ever(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(500)], ["s"])
    words = bloom_build(keys, m_bits=1 << 14, k=4)
    survivors = {
        r["s"]
        for r in keys.where(
            bloom_might_contain(F.col("s"), words, m_bits=1 << 14, k=4)
        ).collect()
    }
    assert len(survivors) == 500  # every inserted key passes


def test_build_collect_bounded_by_bitmap_not_keys(spark):
    m = 1 << 12  # 4096 bits = 64 words
    keys = spark.createDataFrame([(f"k{i}",) for i in range(5000)], ["s"])
    words = bloom_build(keys, m_bits=m, k=4)
    assert len(words) == m // 64  # 64 words whatever the key count
    # oversaturated on purpose: nearly every bit set, still well-formed
    assert sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in words) > m * 0.9


def test_prefilter_plus_confirm_is_exact_despite_false_positives(spark):
    """A deliberately tiny bitmap forces a high FP rate; the exact
    confirm join must still reproduce the plain semi-join answer."""
    m, k = 1 << 10, 2
    eval_keys = spark.createDataFrame([(f"e{i}",) for i in range(100)], ["s"])
    corpus = spark.createDataFrame(
        [(i, f"e{i % 250}") for i in range(1000)], ["doc_id", "s"]
    )
    words = bloom_build(eval_keys, m_bits=m, k=k)
    pre = corpus.where(bloom_might_contain(F.col("s"), words, m_bits=m, k=k))
    # FP-heavy: the prefilter passes absent keys too (sanity: it pruned
    # SOMETHING, else the test is vacuous... but never a present key)
    confirmed = sorted(
        (r["doc_id"], r["s"])
        for r in pre.join(F.broadcast(eval_keys), "s").collect()
    )
    exact = sorted(
        (r["doc_id"], r["s"])
        for r in corpus.join(F.broadcast(eval_keys), "s").collect()
    )
    assert confirmed == exact


def test_probe_is_join_free(spark):
    """The bitmap probe must be a scan-level expression: no join node in
    the prefilter plan (the whole point — the 100 TB side never
    shuffles for the Bloom stage)."""
    keys = spark.createDataFrame([("a",), ("b",)], ["s"])
    words = bloom_build(keys, m_bits=1 << 12, k=3)
    plan = (
        spark.createDataFrame([("a",), ("z",)], ["s"])
        .where(bloom_might_contain(F.col("s"), words, m_bits=1 << 12, k=3))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan
