"""Vector scalar expressions — JVM-side array math, no Python UDFs.

The reference stores 384-dim MiniLM embeddings in ChromaDB and queries
by cosine (rag_engine.py:154, 212-217). Here vectors are plain
``array<float>`` columns and similarity is a Catalyst expression:
``aggregate(zip_with(a, b, *), 0.0, +)`` — a sequential left fold, which
keeps the float semantics deterministic and oracle-comparable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


# Literal-vector expression memo (round 15, the operators/stats.py
# _KERNEL_MEMO discipline): one 64-dim lit_vector costs ~65 Py4J
# roundtrips, and the kNN/ANN/retrieval family rebuilds the SAME query
# vector / hyperplane literals on every plan build (cProfile put ~60%
# of a warm q_ann_lsh build in expression-construction roundtrips).
# Unresolved Columns are immutable, input-independent descriptors;
# keyed by the float tuple + the gateway applicationId so a restarted
# JVM can never be served dead Py4J references. BOUNDED: lit_vector is
# also called with data-dependent vectors (fresh k-means centroids
# every run), so an unbounded dict would accumulate never-hit entries
# (each holding JVM Literal refs) for the process lifetime — on
# overflow the memo drops its oldest half (dict preserves insertion
# order), which also sheds dead-gateway entries over time.
_LIT_MEMO: dict[tuple, Column] = {}
_LIT_MEMO_MAX = 512


def lit_vector(values: Sequence[float]) -> Column:
    from .scalars import gateway_id

    key = (gateway_id(), tuple(float(v) for v in values))
    hit = _LIT_MEMO.get(key)
    if hit is None:
        if len(_LIT_MEMO) >= _LIT_MEMO_MAX:
            for stale in list(_LIT_MEMO)[: _LIT_MEMO_MAX // 2]:
                del _LIT_MEMO[stale]
        hit = _LIT_MEMO[key] = F.array(*[F.lit(v) for v in key[1]])
    return hit


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic accumulation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """cosine = dot/(||a||*||b||) — matches DuckDB's list_inner_product
    composition so the oracle can mirror it exactly. A zero-norm vector
    leaves cosine undefined: NULL, the same result DuckDB's NULL-on-/0
    produces, where ANSI Spark would otherwise DIVIDE_BY_ZERO (a zero
    or all-null embedding is reachable data at corpus scale)."""
    den = l2_norm(a) * l2_norm(b)
    return F.when(den != 0, dot(a, b) / den)
