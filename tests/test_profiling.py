"""Profiling / drift operators: handcrafted-distribution semantics (the
oracle differentials cover the corpus; these pin the edge conventions —
null accounting, smoothing, tie handling, identical-distribution zeros).
"""

from __future__ import annotations

import math

from market_analyze_data_stream_processing_spark.operators.profiling import (
    chi2_mix,
    column_profile,
    ks_statistic,
    psi_drift,
)


def _tagged(spark, rows):
    return spark.createDataFrame(rows, "grp string, value double, period int")


def test_column_profile_counts_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, None), (2.0, 7.0), (None, 9.0)], "a double, b double"
    )
    out = {r["col_name"]: r for r in column_profile(df, ["a", "b"]).collect()}
    assert out["a"]["n_rows"] == 4
    assert abs(out["a"]["null_frac"] - 0.25) < 1e-9
    assert out["a"]["n_distinct"] == 2  # nulls don't count
    assert out["a"]["min_v"] == 1.0 and out["a"]["max_v"] == 2.0
    assert abs(out["a"]["mean_v"] - 5.0 / 3.0) < 1e-6
    assert abs(out["b"]["mean_v"] - 7.0) < 1e-9


def test_psi_zero_for_identical_distributions(spark):
    rows = [("g", float(v), p) for p in (0, 1) for v in (5, 30, 30, 55)]
    out = psi_drift(_tagged(spark, rows), bucket_width=25.0, n_buckets=3).collect()
    assert len(out) == 1
    assert out[0]["n_ref"] == 4 and out[0]["n_cur"] == 4
    assert abs(out[0]["psi"]) < 1e-12  # p == q in every bucket


def test_psi_positive_and_smoothed_on_disjoint_buckets(spark):
    rows = [("g", 5.0, 0)] * 3 + [("g", 80.0, 1)] * 3
    out = psi_drift(_tagged(spark, rows), bucket_width=25.0, n_buckets=3).collect()
    # disjoint buckets: PSI must be positive and finite (smoothing saves log 0)
    assert out[0]["psi"] > 0.0 and math.isfinite(out[0]["psi"])


def test_ks_statistic_known_value_and_ties(spark):
    # ref = {1, 2}, cur = {2, 3}: D at v=1 is |1/2 - 0| = 0.5; at v=2
    # |1 - 1/2| = 0.5; at v=3 |1 - 1| = 0 -> D = 0.5
    rows = [("g", 1.0, 0), ("g", 2.0, 0), ("g", 2.0, 1), ("g", 3.0, 1)]
    out = ks_statistic(_tagged(spark, rows)).collect()
    assert out[0]["n_ref"] == 2 and out[0]["n_cur"] == 2
    assert abs(out[0]["ks_d"] - 0.5) < 1e-12


def test_ks_zero_for_identical_samples(spark):
    rows = [("g", float(v), p) for p in (0, 1) for v in (1, 2, 2, 9)]
    out = ks_statistic(_tagged(spark, rows)).collect()
    assert out[0]["ks_d"] == 0.0


def test_ks_single_period_group_is_null(spark):
    """A group seen in only one period has no second CDF: ks_d must be
    an explicit NULL, not an engine-dependent /0 artifact."""
    rows = [("only_ref", 1.0, 0), ("only_ref", 2.0, 0), ("both", 1.0, 0), ("both", 1.0, 1)]
    out = {r["grp"]: r for r in ks_statistic(_tagged(spark, rows)).collect()}
    assert out["only_ref"]["n_ref"] == 2 and out["only_ref"]["n_cur"] == 0
    assert out["only_ref"]["ks_d"] is None
    assert out["both"]["ks_d"] == 0.0


def test_chi2_balanced_mix_is_zero(spark):
    # both categories split 50/50 across periods -> observed == expected
    rows = [(g, 0.0, p) for g in ("a", "b") for p in (0, 1) for _ in range(3)]
    out = {r["grp"]: r for r in chi2_mix(_tagged(spark, rows)).collect()}
    assert abs(out["a"]["chi2_contrib"]) < 1e-12
    assert abs(out["b"]["chi2_contrib"]) < 1e-12


def test_chi2_2x2_textbook_value(spark):
    # table: a=(10 ref, 20 cur), b=(20 ref, 10 cur); chi2 total = 20/3·... —
    # compute expected cells directly: t_ref=t_cur=30, grand=60,
    # e(a,ref)=30*30/60=15 -> each of the 4 cells contributes 25/15
    rows = (
        [("a", 0.0, 0)] * 10 + [("a", 0.0, 1)] * 20
        + [("b", 0.0, 0)] * 20 + [("b", 0.0, 1)] * 10
    )
    out = {r["grp"]: r for r in chi2_mix(_tagged(spark, rows)).collect()}
    assert abs(out["a"]["chi2_contrib"] - 2 * 25.0 / 15.0) < 1e-9
    assert abs(out["b"]["chi2_contrib"] - 2 * 25.0 / 15.0) < 1e-9
    assert out["a"]["o_ref"] == 10 and out["a"]["o_cur"] == 20
