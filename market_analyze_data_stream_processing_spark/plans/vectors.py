"""Similarity-search queries over the ``embeddings`` table (U2: the
reference's filtered cosine top-k retrieval, rag_engine.py:212-217,
generalized to the ANN family a training pipeline needs).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine_sim, lit_vector
from ..operators.similarity import ann_ivf, ann_lsh, knn_exact
from ..sources.tables import load_table
from .registry import register

# DuckDB cosine mirror: explicit dot/(|a|*|b|) with DOUBLE[] casts so the
# accumulation matches Spark's sequential fold.
_SIM_SQL = (
    "list_inner_product(e.embedding::DOUBLE[], q.qe)"
    " / (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_inner_product(q.qe, q.qe)))"
)


def _query_vec(spark, sf_dir, vec_id: int = 0):
    row = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


@register(
    "q_knn_exact",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label, round(sim, 6) AS sim
    FROM (
        SELECT e.vec_id, e.label, {_SIM_SQL} AS sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    ORDER BY sim DESC, vec_id
    LIMIT 20
    """,
    doc="U2 exact kNN: brute-force cosine top-20 vs the vec_id=0 query "
    "vector. Spark: broadcast literal vector + TakeOrderedAndProject — "
    "per-partition top-k, driver merges k·partitions rows; no corpus shuffle.",
)
def q_knn_exact(spark, sf_dir):
    qv = _query_vec(spark, sf_dir, 0)
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    return knn_exact(e, qv, k=20, vec_col="embedding", id_col="vec_id").select(
        "vec_id", "label", "sim"
    )


@register(
    "q_knn_per_label",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id, e.label, {_SIM_SQL} AS sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, label, round(sim, 6) AS sim, rn
    FROM (
        SELECT *, row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
    doc="Partitioned top-k: 3 nearest neighbours per label (grouped retrieval).",
)
def q_knn_per_label(spark, sf_dir):
    qv = _query_vec(spark, sf_dir, 0)
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    sim = cosine_sim(as_double(F.col("embedding")), lit_vector(qv))
    w = Window.partitionBy("label").orderBy(F.desc("__sim"), F.asc("vec_id"))
    return (
        e.withColumn("__sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("vec_id", "label", F.round("__sim", 6).alias("sim"), "rn")
    )


@register(
    "q_embedding_norms",
    """
    SELECT label, count(*) AS n_vecs,
           round(avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_norm,
           round(min(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS min_norm,
           round(max(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS max_norm
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
    doc="Vector-column profiling: L2-norm stats per label (JVM array fold, "
    "no Python).",
)
def q_embedding_norms(spark, sf_dir):
    from ..functions.vectors import l2_norm

    e = load_table(spark, sf_dir, "embeddings")
    norm = l2_norm(as_double(F.col("embedding")))
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(norm), 6).alias("avg_norm"),
            F.round(F.min(norm), 6).alias("min_norm"),
            F.round(F.max(norm), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


@register(
    "q_ann_lsh",
    None,  # approximate: no SQL oracle; recall vs exact is tested in pytest
    doc="U2 scale path: sign-LSH bucketed ANN (8 seeded hyperplanes → bucket "
    "pruning → exact cosine within bucket). At 100 TB the table is "
    "partitioned by bucket ⇒ partition-pruned scan of ~1/256 of the data.",
)
def q_ann_lsh(spark, sf_dir):
    qv = _query_vec(spark, sf_dir, 0)
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    return ann_lsh(e, qv, k=20, n_planes=8, vec_col="embedding", id_col="vec_id").select(
        "vec_id", "label", "sim"
    )


@register(
    "q_ann_ivf",
    None,  # approximate: recall vs exact is tested in pytest
    doc="U2 scale path #2: IVF-style ANN — coarse centroid cells, probe "
    "the 2 nearest cells, exact cosine within. At 100 TB the corpus is "
    "partitioned by cell id ⇒ probing is partition pruning.",
)
def q_ann_ivf(spark, sf_dir):
    qv = _query_vec(spark, sf_dir, 0)
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    return ann_ivf(e, qv, k=20, n_probe=2).select("vec_id", "label", "sim")
