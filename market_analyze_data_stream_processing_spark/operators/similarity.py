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


def ann_ivf(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 20,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "label",
    round_to: int | None = 6,
) -> DataFrame:
    """IVF-style ANN: coarse cells from per-cluster centroids, probe the
    ``n_probe`` cells nearest the query, exact cosine inside them.

    Structure of a production IVF index: centroids are tiny (collected +
    broadcast as literal vectors), cell assignment is a pure expression
    argmax over centroid similarities, and at scale the table is
    partitioned by cell id so probing = partition pruning. Here the
    coarse clustering seeds from ``cluster_col`` groups (a k-means
    iteration would refine the same structure).
    """
    import numpy as np

    cents = (
        df.select(F.col(cluster_col).alias("c"), F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("c", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("c")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("vec"))
        .select("c", F.transform("vec", lambda s: s["m"]).alias("vec"))
        .collect()
    )
    centroids = {int(r["c"]): np.asarray(r["vec"], dtype=np.float64) for r in cents}
    qv = np.asarray(list(query_vec), dtype=np.float64)

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else -1.0

    probe = sorted(centroids, key=lambda c: -cos(centroids[c], qv))[:n_probe]

    emb = as_double(F.col(vec_col))
    sims = [cosine_sim(emb, lit_vector(centroids[c].tolist())) for c in sorted(centroids)]
    best = F.greatest(*sims)
    cell = F.lit(None).cast("int")
    for i, c in enumerate(sorted(centroids)):
        cell = F.when(sims[i] == best, F.lit(c)).otherwise(cell)
    pruned = df.withColumn("__cell", cell).where(F.col("__cell").isin(probe)).drop("__cell")
    return knn_exact(pruned, query_vec, k=k, vec_col=vec_col, id_col=id_col, round_to=round_to)


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
