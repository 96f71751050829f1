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


def test_literal_probe_is_join_free(spark):
    """The expression-form probe is a pure scan-level filter: no join,
    no exchange (the small-bitmap fast path)."""
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


def test_prefilter_never_shuffles_the_corpus(spark):
    """bloom_prefilter ships the bitmap as a 1-row broadcast: the only
    join is the broadcast attach (no shuffle Exchange anywhere, no
    corpus-side movement), and it agrees with the literal-form probe."""
    from market_analyze_data_stream_processing_spark.operators.bloom import (
        bloom_prefilter,
    )

    keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], ["s"])
    words = bloom_build(keys, m_bits=1 << 14, k=4)
    corpus = spark.createDataFrame(
        [(f"k{i}",) for i in range(100)], ["s"]
    )
    pre = bloom_prefilter(corpus, "s", words, m_bits=1 << 14, k=4)
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan  # no shuffle
    lit_rows = {
        r["s"]
        for r in corpus.where(
            bloom_might_contain(F.col("s"), words, m_bits=1 << 14, k=4)
        ).collect()
    }
    assert {r["s"] for r in pre.collect()} == lit_rows
    assert pre.columns == ["s"]  # helper column dropped
