"""Covariance-matrix operator: numpy ground truth and partition
invariance (oracle differential covers the corpus)."""

from __future__ import annotations

import numpy as np

from market_analyze_data_stream_processing_spark.operators.linalg import (
    covariance_matrix,
)


def test_covariance_matches_numpy_and_partitioning(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(40, 5).astype(np.float32)
    rows = [(i, [float(v) for v in X[i]]) for i in range(40)]
    ref = np.cov(X.astype(np.float64), rowvar=False, ddof=1)
    for parts in (1, 6):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).repartition(parts)
        out = covariance_matrix(df, "embedding", dim=5).collect()
        assert len(out) == 15  # upper triangle of 5x5
        for r in out:
            i, j = r["i"] - 1, r["j"] - 1
            assert r["n"] == 40
            assert abs(r["cov"] - ref[i, j]) < 1e-9, (i, j, parts)
