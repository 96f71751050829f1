"""Round-3 operator tests: chunk-level dedup gate, int8 embedding
quantization, winsorized statistics. The DuckDB oracle differential is the
primary gate for all three (they are oracle-backed in the registry); these
tests pin the semantic invariants the hash can't express."""

from __future__ import annotations

import math

import numpy as np
import pytest

from market_analyze_data_stream_processing_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chunk_rows(spark):
    return {r["doc_id"]: r for r in QUERIES["q_chunk_dup_rate"].fn(spark, SF).collect()}


def test_chunk_dup_rate_covers_every_doc(spark, chunk_rows):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(chunk_rows) == n_docs  # short docs included with 0 chunks


def test_chunk_dup_rate_invariants(chunk_rows):
    for r in chunk_rows.values():
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
        assert 0.0 <= r["dup_ratio"] <= 1.0
        # keep gate is the integer-exact form of dup_ratio <= 0.2
        assert r["keep"] == (r["n_dup_chunks"] * 5 <= r["n_chunks"])


def test_chunk_dup_rate_flags_injected_duplicate(spark):
    # Two docs sharing an identical 40-token prefix must both show >=2
    # duplicated chunks; a doc of unique tokens must show zero.
    words = " ".join(f"w{i}" for i in range(40))
    uniq = " ".join(f"u{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, words + " tail one"), (2, words + " tail two"), (3, uniq)],
        ["doc_id", "text"],
    )
    df.createOrReplaceTempView("documents_tmp")
    from pyspark.sql import functions as F

    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = df.select("doc_id", toks.alias("t"))
    n = F.floor(F.size(F.col("t")) / 20).cast("int")
    idx = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i * 20 + 1, 20)))
    )
    chunks = base.select("doc_id", F.explode(hashes).alias("h"))
    freq = chunks.groupBy("h").count()
    dup = (
        chunks.join(freq, "h")
        .groupBy("doc_id")
        .agg(F.sum(F.when(F.col("count") >= 2, 1).otherwise(0)).alias("dups"))
    )
    got = {r["doc_id"]: r["dups"] for r in dup.collect()}
    assert got[1] == 2 and got[2] == 2 and got[3] == 0


@pytest.fixture(scope="module")
def quant_rows(spark):
    return QUERIES["q_quantize_embeddings"].fn(spark, SF).collect()


def test_quantization_rmse_bounded_by_half_step(quant_rows):
    # floor(x/s + 0.5) rounds to the nearest code: per-dim error <= s/2,
    # so RMSE <= s/2 always.
    assert len(quant_rows) > 0
    for r in quant_rows:
        assert r["rmse"] <= r["scale"] / 2 + 1e-12
        assert r["n_nonzero"] >= 1  # max-|x| dim quantizes to ±127


def test_quantization_reconstruction_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(20).collect()
    got = {
        r["vec_id"]: r
        for r in QUERIES["q_quantize_embeddings"].fn(spark, SF).collect()
    }
    for row in emb:
        x = np.asarray(row["embedding"], dtype=np.float64)
        s = max(np.abs(x).max(), 1e-30) / 127.0
        q = np.floor(x / s + 0.5)
        rmse = math.sqrt(float(np.mean((x - q * s) ** 2)))
        r = got[row["vec_id"]]
        assert r["n_nonzero"] == int(np.count_nonzero(q))
        assert abs(r["rmse"] - round(rmse, 9)) < 1e-9


def test_winsorized_stats_shrink_toward_center(spark):
    rows = QUERIES["q_winsorized_stats"].fn(spark, SF).collect()
    assert rows, "no event types"
    for r in rows:
        # clipping can only reduce spread; the clipped mean stays within
        # the raw min/max envelope and <=10%+ties of rows are clipped
        assert r["n_clipped"] <= math.ceil(r["n_events"] * 0.11)
        assert r["winsorized_mean"] == pytest.approx(r["raw_mean"], abs=5.0)
