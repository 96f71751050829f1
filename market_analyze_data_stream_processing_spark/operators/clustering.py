"""Iterative clustering over embedding columns: Lloyd's k-means with
deterministic seeding, expressed as DataFrame ops per iteration.

The iterative-algorithm capability slot (driver loop over declarative
steps — the shape MLlib uses internally): each iteration is

    assign:  argmax over centroid-similarity expressions (map-only; the
             centroids are tiny literal vectors broadcast with the plan)
    update:  posexplode + (cluster, dim) average — one shuffle

At 100 TB the assignment stage is embarrassingly parallel and the update
shuffle carries k·dim partial sums per partition (map-side combined),
not the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine_sim, lit_vector


def _collect_centroids(
    df: DataFrame, cluster_col: str, vec_col: str, dim: int
) -> dict[int, np.ndarray]:
    # Per-slot avg aggregates, no posexplode: the shuffle carries one
    # k×dim row per partition (map-side combined), never |rows|·dim.
    rows = df.groupBy(F.col(cluster_col).alias("c")).agg(
        *[F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"m{i}") for i in range(dim)]
    ).collect()
    return {
        int(r["c"]): np.asarray([r[f"m{i}"] for i in range(dim)], dtype=np.float64)
        for r in rows
    }


def assign_clusters(
    df: DataFrame, centroids: dict[int, np.ndarray], vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment by cosine — one array_max over
    (sim, cluster) structs, so each centroid fold is evaluated exactly
    once per row. Ties break to the highest cluster id (struct max),
    matching the previous when-ladder's last-match-wins order."""
    emb = as_double(F.col(vec_col))
    pairs = F.array(
        *[
            F.struct(cosine_sim(emb, lit_vector(v.tolist())).alias("s"), F.lit(c).alias("c"))
            for c, v in sorted(centroids.items())
        ]
    )
    return df.withColumn(out_col, F.array_max(pairs)["c"])


def kmeans(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 3,
) -> DataFrame:
    """Deterministic Lloyd k-means: seeds = the k lowest-id vectors (no
    RNG ⇒ replayable), fixed iteration count. Returns df + ``cluster``."""
    seed_rows = (
        df.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    )
    centroids = {
        i: np.asarray(list(r[vec_col]), dtype=np.float64)
        for i, r in enumerate(seed_rows)
    }
    dim = len(centroids[0])
    # Iterative working set: spread across cores (the synthetic table is
    # one parquet file = one input split, which would serialize the
    # fold-heavy assignment) and CACHE it — every iteration re-reads the
    # same rows, the canonical persist() case for iterative algorithms
    # (MLlib's k-means does the same). The cache is dropped before
    # returning; the final assignment plans against the original df.
    from ..sources.tables import spread

    final_centroids = centroids  # iterations=0 ⇒ assign against the seeds
    work = spread(df).persist()
    try:
        for _ in range(iterations):
            final_centroids = centroids  # assignment uses pre-update centroids
            assigned = assign_clusters(work, centroids, vec_col=vec_col)
            centroids = _collect_centroids(assigned, "cluster", vec_col, dim)
    finally:
        work.unpersist()
    return assign_clusters(df, final_centroids, vec_col=vec_col)
