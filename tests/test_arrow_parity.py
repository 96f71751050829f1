"""Edge-semantics parity for the round-11 Arrow kernels.

pq_encode and with_ivf_cell replaced interpreted higher-order-fold
expression ladders with mapInPandas numpy passes that claim BIT-parity:
same sequential-fold arithmetic, same tie-breaks, same zero-norm (NULL
cosine) resolution. These tests pin the claims on the inputs where the
two formulations could plausibly part: exact distance ties, duplicate
centroids, and zero-norm rows/centroids — the with_ivf_cell case is
checked directly against the ORIGINAL struct-expression twin built
inline here."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.functions.vectors import (
    as_double,
    cosine_sim,
    lit_vector,
)
from market_analyze_data_stream_processing_spark.operators.pq import pq_encode
from market_analyze_data_stream_processing_spark.operators.similarity import (
    with_ivf_cell,
)


def _cell_expr_twin(centroids, vec_col):
    """The pre-round-11 expression form of IVF cell assignment (array_max
    over (sim, cell) structs) — kept HERE as the parity oracle."""
    emb = as_double(F.col(vec_col))
    pairs = F.array(
        *[
            F.struct(
                cosine_sim(emb, lit_vector(centroids[c].tolist())).alias("s"),
                F.lit(c).alias("c"),
            )
            for c in sorted(centroids)
        ]
    )
    return F.array_max(pairs)["c"]


def _vec_frame(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_cell_matches_expression_twin_on_edges(spark):
    """Arrow cell ids == struct-expression cell ids on ties, zero-norm
    rows, zero-norm centroids, and ordinary vectors alike."""
    centroids = {
        0: np.array([1.0, 0.0, 0.0, 0.0]),
        1: np.array([0.0, 1.0, 0.0, 0.0]),
        2: np.array([1.0, 0.0, 0.0, 0.0]),  # duplicate of cell 0: exact tie
        5: np.array([0.0, 0.0, 0.0, 0.0]),  # zero-norm centroid: NULL sim
    }
    vecs = [
        [1.0, 0.0, 0.0, 0.0],   # ties cells 0 and 2 exactly
        [0.0, 1.0, 0.0, 0.0],   # cell 1
        [0.0, 0.0, 0.0, 0.0],   # zero-norm row: every sim NULL
        [0.5, 0.5, 0.0, 0.0],   # ties 0/2 vs 1? no — equal sim to 0,1,2
        [-1.0, 0.0, 0.0, 0.0],  # sim exactly -1 to cells 0/2
    ]
    df = _vec_frame(spark, vecs)
    got = {
        r["vec_id"]: r["cell"]
        for r in with_ivf_cell(df, centroids, "embedding", out_col="cell").collect()
    }
    want = {
        r["vec_id"]: r["cell"]
        for r in df.withColumn(
            "cell", _cell_expr_twin(centroids, "embedding")
        ).collect()
    }
    assert got == want
    # and the documented resolutions hold explicitly:
    assert got[0] == 2  # exact tie -> HIGHEST cell id
    assert got[2] == 5  # all-NULL (zero-norm row) -> highest cell id


def test_pq_encode_tie_resolves_to_lowest_code(spark):
    """Duplicate centroids produce identical distances; the (distance,
    code) struct-min semantics say the LOWEST code wins — pinned against
    the Arrow argmin-over-code-ascending implementation."""
    book = {
        (0, 3): [1.0, 0.0],
        (0, 7): [1.0, 0.0],  # same centroid, higher code
        (1, 2): [0.0, 1.0],
        (1, 4): [5.0, 5.0],
    }
    df = _vec_frame(spark, [[1.0, 0.0, 0.0, 1.0], [1.0, 0.0, 5.0, 5.0]])
    rows = {
        r["vec_id"]: (r["c0"], r["c1"])
        for r in pq_encode(df, book, m=2, sub_dim=2).collect()
    }
    assert rows[0] == (3, 2)  # tie in subspace 0 -> lowest code 3
    assert rows[1] == (3, 4)


def test_pq_encode_preserves_input_columns_and_types(spark):
    book = {(0, 0): [0.0, 0.0], (1, 0): [0.0, 0.0]}
    df = _vec_frame(spark, [[1.0, 2.0, 3.0, 4.0]]).withColumn(
        "label", F.lit(7).cast("int")
    )
    out = pq_encode(df, book, m=2, sub_dim=2)
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "embedding", "label", "c0", "c1",
    ]
    row = out.collect()[0]
    assert row["label"] == 7 and row["c0"] == 0 and row["c1"] == 0
    assert [round(float(x), 4) for x in row["embedding"]] == [1.0, 2.0, 3.0, 4.0]
