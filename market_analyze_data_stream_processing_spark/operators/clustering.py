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


def _collect_centroids(df: DataFrame, cluster_col: str, vec_col: str) -> dict[int, np.ndarray]:
    rows = (
        df.select(F.col(cluster_col).alias("c"), F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("c", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("c")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("vec"))
        .select("c", F.transform("vec", lambda s: s["m"]).alias("vec"))
        .collect()
    )
    return {int(r["c"]): np.asarray(r["vec"], dtype=np.float64) for r in rows}


def assign_clusters(
    df: DataFrame, centroids: dict[int, np.ndarray], vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment by cosine, as a pure expression ladder."""
    emb = as_double(F.col(vec_col))
    sims = {c: cosine_sim(emb, lit_vector(v.tolist())) for c, v in sorted(centroids.items())}
    best = F.greatest(*sims.values())
    cell = F.lit(None).cast("int")
    for c, s in sims.items():
        cell = F.when(s == best, F.lit(c)).otherwise(cell)
    return df.withColumn(out_col, cell)


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
    assigned = df
    for _ in range(iterations):
        assigned = assign_clusters(df, centroids, vec_col=vec_col)
        centroids = _collect_centroids(assigned, "cluster", vec_col)
    return assigned
