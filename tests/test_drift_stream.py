"""Streaming drift monitor: cross-batch accumulation and exact parity
with the batch PSI plan's convention (shared pure kernel)."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from market_analyze_data_stream_processing_spark.operators.profiling import (
    bucketize_counts,
    psi_from_counts,
)
from market_analyze_data_stream_processing_spark.streaming.drift import (
    drift_monitor_stateful,
)

IN_SCHEMA = StructType(
    [StructField("grp", StringType()), StructField("value", DoubleType())]
)

REF_VALUES = [5.0, 5.0, 30.0, 30.0, 30.0, 55.0]  # buckets 0,0,1,1,1,2 (w=25)


def _run(spark, tmp_path, batches, **kw):
    d = tmp_path / "in"
    d.mkdir()
    for i, rows in enumerate(batches):
        (d / f"b{i}.json").write_text(
            "\n".join(json.dumps({"grp": g, "value": v}) for g, v in rows)
        )
    ref = {"g": bucketize_counts(REF_VALUES, 25.0, 3)}
    stream = (
        spark.readStream.schema(IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    out = drift_monitor_stateful(
        stream, ref, bucket_width=25.0, n_buckets=3, **kw
    )
    q = (
        out.writeStream.format("memory")
        .queryName("drift_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql("SELECT * FROM drift_sink").collect()


def test_drift_state_accumulates_across_batches(spark, tmp_path):
    # batch 0 matches the reference shape; batch 1 piles into bucket 3
    rows = _run(
        spark,
        tmp_path,
        [
            [("g", 5.0), ("g", 30.0), ("g", 30.0), ("g", 55.0)],
            [("g", 99.0), ("g", 99.0), ("g", 99.0)],
        ],
    )
    by_n = {r["n_seen"]: r["psi"] for r in rows}
    # one emission per trigger, cumulative state carried across them
    # (file pickup order is not guaranteed, so the intermediate count is
    # 4 or 3 depending on which batch ran first — the final is always 7)
    assert 7 in by_n and len(by_n) == 2
    ref = bucketize_counts(REF_VALUES, 25.0, 3)
    full = [5.0, 30.0, 30.0, 55.0, 99.0, 99.0, 99.0]
    # exact value parity with the shared kernel on the full history
    assert abs(by_n[7] - psi_from_counts(ref, bucketize_counts(full, 25.0, 3))) < 1e-12
    # and on whichever prefix the first trigger saw
    (mid,) = [n for n in by_n if n != 7]
    prefix = full[:4] if mid == 4 else full[4:]
    assert abs(by_n[mid] - psi_from_counts(ref, bucketize_counts(prefix, 25.0, 3))) < 1e-12


def test_drift_tolerates_null_and_nonfinite_values(spark, tmp_path):
    """A null/NaN/inf value must not kill the streaming query — the
    alert feed has to be at least as robust as the pipeline it
    monitors. Null routes to the overflow slot (the batch twin's NULL
    path) and still counts toward n_seen."""
    rows = _run(
        spark,
        tmp_path,
        [[("g", 5.0), ("g", None), ("g", float("nan")), ("g", float("inf"))]],
    )
    (r,) = rows
    assert r["n_seen"] == 4
    from market_analyze_data_stream_processing_spark.operators.profiling import (
        bucket_index,
    )

    ref = bucketize_counts(REF_VALUES, 25.0, 3)
    cur = [0] * 4
    for v in [5.0, None, float("nan"), float("inf")]:
        cur[bucket_index(v, 25.0, 3)] += 1
    assert cur == [1, 0, 0, 3]  # null, NaN, inf all in the overflow slot
    assert abs(r["psi"] - psi_from_counts(ref, cur)) < 1e-12


def test_drift_unknown_key_scores_against_empty_reference(spark, tmp_path):
    rows = _run(spark, tmp_path, [[("novel", 5.0), ("novel", 5.0)]])
    (r,) = rows
    assert r["grp"] == "novel" and r["n_seen"] == 2
    # all mass vs an all-zero reference: positive, finite drift
    assert r["psi"] > 0.0


def test_kernel_matches_batch_psi_plan_convention(spark):
    """The pure kernel and the DataFrame psi_drift operator agree on
    the same tagged data — batch and stream can never diverge."""
    from market_analyze_data_stream_processing_spark.operators.profiling import (
        psi_drift,
    )

    ref_rows = [("g", v, 0) for v in REF_VALUES]
    cur_rows = [("g", v, 1) for v in [5.0, 80.0, 80.0, 99.0]]
    tagged = spark.createDataFrame(
        ref_rows + cur_rows, "grp string, value double, period int"
    )
    (batch,) = psi_drift(tagged, bucket_width=25.0, n_buckets=3).collect()
    kernel = psi_from_counts(
        bucketize_counts(REF_VALUES, 25.0, 3),
        bucketize_counts([5.0, 80.0, 80.0, 99.0], 25.0, 3),
    )
    assert abs(batch["psi"] - kernel) < 1e-9
