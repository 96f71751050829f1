"""Similarity search over embedding columns (SURVEY.md §2.10 U2; the
reference's filtered cosine top-k, rag_engine.py:212-217).

Two paths, same semantics:
- ``knn_exact``: brute-force scan + TakeOrderedAndProject — at 100 TB
  this is an embarrassingly parallel map + per-partition top-k + driver
  merge of k rows per partition; no shuffle of the corpus.
- ``ann_lsh``: random-hyperplane LSH bucketing (sign bits of projections
  onto fixed seeded planes) — prunes the scan to matching buckets; the
  planes are literal arrays broadcast with the plan, the bucket filter
  pushes into the scan when bucket ids are materialized as a column.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine_sim, lit_vector


def knn_exact(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k against a broadcast query vector.

    orderBy+limit compiles to TakeOrderedAndProject: each partition keeps
    only k candidates, the driver merges — O(k · partitions) transfer.
    """
    emb = as_double(F.col(vec_col))
    q = lit_vector([float(x) for x in query_vec])
    sim = cosine_sim(emb, q)
    if round_to is not None:
        sim_out = F.round(sim, round_to)
    else:
        sim_out = sim
    return (
        df.withColumn("__sim", sim)
        .orderBy(F.desc("__sim"), F.asc(id_col))
        .limit(k)
        .withColumn("sim", sim_out if round_to is None else F.round(F.col("__sim"), round_to))
        .drop("__sim")
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Add the sign-LSH bucket id (int, one bit per plane)."""
    emb = as_double(F.col(vec_col))
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(emb, lit_vector(plane.tolist()), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn(out_col, bucket)


def ann_lsh(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 20,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Approximate top-k: restrict the exact scan to the query's LSH
    bucket. At scale the table is written partitioned by bucket, so this
    becomes partition pruning (read 1/2^planes of the data); recall is
    tunable via n_planes / multi-probe."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qv = np.asarray(list(query_vec), dtype=np.float64)
    q_bucket = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, qv)) > 0))
    bucketed = with_lsh_bucket(df, planes, vec_col=vec_col)
    return knn_exact(
        bucketed.where(F.col("bucket") == q_bucket).drop("bucket"),
        query_vec,
        k=k,
        vec_col=vec_col,
        id_col=id_col,
        round_to=round_to,
    )
