"""PageRank operator: closed-form fixed points and dangling-mass
semantics on hand graphs (the oracle differential covers the derived
corpus graph)."""

from __future__ import annotations

from market_analyze_data_stream_processing_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_symmetric_cycle_is_uniform_fixed_point(spark):
    # A→B, B→A: the uniform 1/2 start is the exact fixed point, so any
    # iteration count returns 0.5 per node and total mass 1.
    out = {r["node"]: r["rank"] for r in
           pagerank(_edges(spark, [("A", "B"), ("B", "A")]), iterations=4).collect()}
    assert abs(out["A"] - 0.5) < 1e-12 and abs(out["B"] - 0.5) < 1e-12


def test_sink_accumulates_and_dangling_mass_leaks(spark):
    # A→C, B→C: C is dangling. After 1 iteration from uniform 1/3:
    # r(A)=r(B)=0.05, r(C)=0.05+0.85*(1/3+1/3)
    out = {r["node"]: r["rank"] for r in
           pagerank(_edges(spark, [("A", "C"), ("B", "C")]), iterations=1).collect()}
    t = 0.15 / 3
    assert abs(out["A"] - t) < 1e-12
    assert abs(out["B"] - t) < 1e-12
    assert abs(out["C"] - (t + 0.85 * (2 / 3))) < 1e-12
    # dangling: total mass < 1 by design (simplified variant)
    assert sum(out.values()) < 1.0


def test_out_fanout_splits_by_degree(spark):
    # A→B, A→C, B→A, C→A; after 1 iter: B and C each get d*(r(A)/2)
    out = {r["node"]: r["rank"] for r in
           pagerank(_edges(spark, [("A", "B"), ("A", "C"), ("B", "A"), ("C", "A")]),
                    iterations=1).collect()}
    t = 0.15 / 3
    third = 1 / 3
    assert abs(out["B"] - (t + 0.85 * (third / 2))) < 1e-12
    assert abs(out["B"] - out["C"]) < 1e-15
    assert abs(out["A"] - (t + 0.85 * (third + third))) < 1e-12


def test_triangle_count_k4_and_square(spark):
    from market_analyze_data_stream_processing_spark.operators.graph import (
        triangle_count,
    )

    # K4: C(3,2)=3 triangles per node, 4 triangles total; edges given in
    # mixed orientation + a duplicate + a self-loop, all canonicalized.
    k4 = [("A", "B"), ("C", "A"), ("A", "D"), ("B", "C"), ("D", "B"),
          ("C", "D"), ("B", "A"), ("D", "D")]
    out = {r["node"]: r["n_tri"] for r in triangle_count(_edges(spark, k4)).collect()}
    assert out == {"A": 3, "B": 3, "C": 3, "D": 3}
    # 4-cycle without diagonals: no triangles at all
    sq = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "A")]
    assert triangle_count(_edges(spark, sq)).count() == 0
