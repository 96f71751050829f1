"""CUSUM changepoint operator: closed-form correctness vs the textbook
recursion, and streaming-twin parity across micro-batches."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from market_analyze_data_stream_processing_spark.operators.changepoint import with_cusum


def _reference_cusum(values, mu, sigma, k_sigma=0.5, h_sigma=4.0):
    """The textbook sequential recursion, as a plain Python oracle."""
    k, h = k_sigma * sigma, h_sigma * sigma
    su = sd = 0.0
    out = []
    for x in values:
        su = max(0.0, su + (x - mu - k))
        sd = max(0.0, sd + (mu - k - x))
        out.append((su, sd, int(su > h), int(sd > h)))
    return out


def _daily(spark, closes, ticker="A"):
    rows = [
        (ticker, f"2024-01-{i + 1:02d}", float(c)) for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(
        rows, "ticker string, day string, close double"
    ).withColumn("day", F.to_date("day"))


def test_cusum_matches_textbook_recursion(spark):
    closes = [10.0, 10.5, 9.5, 10.0, 14.0, 15.0, 16.0, 9.0, 2.0, 2.0]
    out = sorted(
        with_cusum(_daily(spark, closes), k_sigma=0.5, h_sigma=1.0).collect(),
        key=lambda r: r["day"],
    )
    n = len(closes)
    mu = sum(closes) / n
    var = (sum(c * c for c in closes) - sum(closes) ** 2 / n) / (n - 1)
    ref = _reference_cusum(closes, mu, var**0.5, 0.5, 1.0)
    for row, (su, sd, au, ad) in zip(out, ref):
        assert abs(row["cusum_up"] - su) < 1e-9
        assert abs(row["cusum_dn"] - sd) < 1e-9
        assert (row["alarm_up"], row["alarm_dn"]) == (au, ad)


def test_cusum_single_row_key_is_null(spark):
    (row,) = with_cusum(_daily(spark, [10.0])).collect()
    assert row["cusum_up"] is None and row["alarm_up"] is None


def test_cusum_stateful_parity_across_batches(spark, tmp_path):
    from market_analyze_data_stream_processing_spark.streaming.stateful import (
        cusum_per_key_stateful,
    )

    closes = [10.0, 10.5, 9.5, 10.0, 14.0, 15.0, 16.0, 9.0]
    n = len(closes)
    mu = sum(closes) / n
    sigma = (
        (sum(c * c for c in closes) - sum(closes) ** 2 / n) / (n - 1)
    ) ** 0.5
    ref = _reference_cusum(closes, mu, sigma, 0.5, 1.0)

    d = tmp_path / "in"
    d.mkdir()
    # split mid-series: state must carry (P, min P) across the boundary;
    # b1 REPLAYS seq 4 (must be dropped by the seq guard, not re-advance P)
    import os
    import time

    (d / "b0.json").write_text(
        "\n".join(
            json.dumps({"key": "A", "seq": i, "value": v})
            for i, v in enumerate(closes[:5])
        )
    )
    (d / "b1.json").write_text(
        "\n".join(
            json.dumps({"key": "A", "seq": i, "value": v})
            for i, v in [(4, 999.0)]
            + [(5 + j, v) for j, v in enumerate(closes[5:])]
        )
    )
    now = time.time()
    for i, f in enumerate(["b0.json", "b1.json"]):
        os.utime(d / f, (now + i, now + i))  # pin file-source pickup order
    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("seq", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(d))
    )
    out = cusum_per_key_stateful(
        stream, {"A": (mu, sigma)}, k_sigma=0.5, h_sigma=1.0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        r["seq"]: r for r in spark.sql("SELECT * FROM cusum_sink").collect()
    }
    assert len(rows) == n
    assert not any(r["value"] == 999.0 for r in rows.values())  # replay dropped
    for i, (su, sd, au, ad) in enumerate(ref):
        assert abs(rows[i]["cusum_up"] - su) < 1e-9, i
        assert abs(rows[i]["cusum_dn"] - sd) < 1e-9, i
        assert (rows[i]["alarm_up"], rows[i]["alarm_dn"]) == (au, ad)
    # bit-for-bit parity with the batch operator: both quantize each
    # deviation to the same 1e-10 HALF_UP grid before exact prefix
    # accumulation, so equality here is ==, not a tolerance. (The test
    # values' squares are decimal(38,8)-exact, so the batch's
    # self-calibrated mu/sigma equal the floats frozen above.)
    batch = {
        r["day"]: r
        for r in with_cusum(
            _daily(spark, closes), k_sigma=0.5, h_sigma=1.0
        ).collect()
    }
    for i, day in enumerate(sorted(batch)):
        assert rows[i]["cusum_up"] == batch[day]["cusum_up"], i
        assert rows[i]["cusum_dn"] == batch[day]["cusum_dn"], i
