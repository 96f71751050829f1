"""Heavy-hitter operator: exactness, candidate-superset guarantee, and
partitioning-independence (the oracle differential covers the corpus
query; these pin the algorithm on adversarial streams)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.operators.frequency import (
    heavy_hitters,
    misra_gries_partials,
)

# Skewed stream: two dominant items, a mid item, and a singleton tail
# engineered so MG decrements churn the counter dict.
ITEMS = (
    ["hot"] * 400
    + ["warm"] * 150
    + ["mild"] * 60
    + [f"tail{i}" for i in range(390)]
)


def _df(spark, partitions):
    return spark.createDataFrame(
        [(x,) for x in ITEMS], "item string"
    ).repartition(partitions)


def _expected(k):
    n = len(ITEMS)
    counts = Counter(ITEMS)
    return {i: c for i, c in counts.items() if c * k > n}


def test_exact_vs_bruteforce_and_partition_invariance(spark):
    for parts in (1, 7):
        out = {
            r["item"]: r["cnt"]
            for r in heavy_hitters(_df(spark, parts), "item", k=10).collect()
        }
        assert out == _expected(10), f"partitions={parts}"


def test_candidates_bounded_and_superset(spark):
    df = _df(spark, 5)
    partials = misra_gries_partials(df, "item", 10)
    per_part = (
        partials.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert all(r["count"] <= 10 for r in per_part)
    cands = {r["item"] for r in partials.select("item").distinct().collect()}
    assert set(_expected(10)) <= cands  # pigeonhole superset


def test_threshold_is_strict(spark):
    # 10 items x 10 each, N=100: with k=10 nothing exceeds N/k=10 strictly
    data = [(f"i{j}",) for j in range(10) for _ in range(10)]
    df = spark.createDataFrame(data, "item string")
    assert heavy_hitters(df, "item", k=10).count() == 0


def test_streaming_mg_matches_sequential_fold(spark, tmp_path):
    """Streaming Misra-Gries state must equal the sequential mg_update
    fold over the concatenated seq-ordered stream, across micro-batch
    boundaries, with replayed and duplicate seqs dropped."""
    import json
    import os
    import time

    from market_analyze_data_stream_processing_spark.operators.frequency import (
        mg_update,
    )
    from market_analyze_data_stream_processing_spark.streaming.stateful import (
        heavy_hitters_stateful,
    )

    stream_items = ["a", "b", "a", "c", "a", "d", "b", "a", "e", "b"]
    d = tmp_path / "in_mg"
    d.mkdir()
    batches = [stream_items[:4], stream_items[4:7], stream_items[7:]]
    seq = 0
    for i, batch in enumerate(batches):
        lines = []
        for item in batch:
            seq += 1
            lines.append(json.dumps({"key": "K", "seq": seq, "item": item}))
        if i == 1:  # replay of seq 2 + in-batch duplicate seq
            lines.append(json.dumps({"key": "K", "seq": 2, "item": "zz"}))
            lines.append(json.dumps({"key": "K", "seq": seq, "item": "zz"}))
        (d / f"b{i}.json").write_text("\n".join(lines))
    now = time.time()
    for i in range(len(batches)):
        os.utime(d / f"b{i}.json", (now + i, now + i))
    stream = (
        spark.readStream.schema("key string, seq long, item string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        heavy_hitters_stateful(stream, k=3)
        .writeStream.format("memory")
        .queryName("mg_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp_mg"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM mg_state WHERE n_seen = 10"
    ).collect()  # final trigger's summary
    got = {r["item"]: r["lb"] for r in rows}
    expected = mg_update({}, stream_items, 3)
    assert got == expected
    assert not any(r["item"] == "zz" for r in rows)


# --- pure-Python Misra-Gries invariants (no Spark session needed) -----

from hypothesis import given, settings
from hypothesis import strategies as st

_streams = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]), min_size=0, max_size=400
)
_ks = st.integers(min_value=1, max_value=8)


@given(_streams, _ks)
@settings(max_examples=200, deadline=None)
def test_mg_update_invariants(stream, k):
    """Classic MG guarantees: ≤ k counters; every lower bound
    undershoots the true count by at most N/(k+1); every item with
    true count > N/(k+1) is retained."""
    from collections import Counter

    from market_analyze_data_stream_processing_spark.operators.frequency import (
        mg_update,
    )

    summary = mg_update({}, stream, k)
    true = Counter(stream)
    n = len(stream)
    slack = n / (k + 1)
    assert len(summary) <= k
    for item, lb in summary.items():
        assert 0 < lb <= true[item]
        assert true[item] - lb <= slack
    for item, c in true.items():
        if c > slack:
            assert item in summary
