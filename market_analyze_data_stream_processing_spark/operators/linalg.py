"""Distributed dense linear algebra over embedding columns: Gram /
covariance matrices — the building block behind PCA, whitening, and
Mahalanobis outlier scoring in an embedding-curation pipeline.

Scale shape: the naive lowering explodes every vector into d² pair
rows (a 4096× row blowup at d=64 — ruinous at 100 TB). Instead the
Gram matrix accumulates as PER-PARTITION numpy partials (one d×d
float64 matrix per task, X^T X over Arrow batches), emitting ≤
d(d+1)/2 upper-triangle rows per partition; the cross-partition
combine is one tiny hash aggregate. Column sums stay JVM-side as a
single posexplode + DECIMAL aggregate (exact, linear), and the final
covariance assembly joins d²/2 rows with a 1-row count broadcast —
driver never sees a vector.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_partials(emb: DataFrame, col: str, dim: int) -> DataFrame:
    """Per-partition upper-triangle partials of X^T X: rows
    (i, j, g) with 1-based i ≤ j, one set per partition. O(d²) task
    state, Arrow-batched; float64 accumulation inside numpy."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        G = np.zeros((dim, dim), dtype=np.float64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[col]])
            G += X.T @ X
            seen = True
        if not seen:
            return
        ii, jj = np.triu_indices(dim)
        yield pd.DataFrame(
            {"i": ii + 1, "j": jj + 1, "g": G[ii, jj]}
        )

    return emb.select(col).mapInPandas(part, schema="i int, j int, g double")


def covariance_matrix(emb: DataFrame, col: str = "embedding", dim: int = 64) -> DataFrame:
    """Sample covariance of the embedding columns: rows
    (i, j, n, cov) for 1-based i ≤ j.

    cov_ij = (Σ x_i x_j − S_i S_j / n) / (n − 1), with the cross-moment
    Σ x_i x_j from the numpy Gram partials (float, coarse-round at the
    caller) and the column sums S_i DECIMAL-exact from one posexplode
    aggregate. n rides as a 1-row broadcast contract scalar."""
    from ..session import ensure_pyfiles

    ensure_pyfiles(emb.sparkSession)
    g = (
        gram_partials(emb, col, dim)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )
    sums = (
        emb.select(F.posexplode(col).alias("p", "x"))
        .groupBy((F.col("p") + 1).alias("i"))
        .agg(F.sum(F.col("x").cast("decimal(28,8)")).cast("double").alias("s"))
    )
    n_row = emb.agg(F.count(F.lit(1)).cast("double").alias("n"))
    si = sums.select(F.col("i").alias("__si_i"), F.col("s").alias("s_i"))
    sj = sums.select(F.col("i").alias("__sj_j"), F.col("s").alias("s_j"))
    return (
        g.join(F.broadcast(si), g["i"] == si["__si_i"])
        .join(F.broadcast(sj), g["j"] == sj["__sj_j"])
        .crossJoin(F.broadcast(n_row))
        .select(
            "i",
            "j",
            F.col("n").cast("long").alias("n"),
            (
                (F.col("g") - F.col("s_i") * F.col("s_j") / F.col("n"))
                / (F.col("n") - 1.0)
            ).alias("cov"),
        )
    )
