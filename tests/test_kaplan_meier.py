"""Kaplan–Meier plan semantics on a handcrafted cohort — pins the
right-censoring branch the synthetic corpus may not exercise (its
users overwhelmingly convert)."""

from __future__ import annotations

import pytest

from market_analyze_data_stream_processing_spark.plans import QUERIES


@pytest.fixture()
def km_sf_dir(spark, tmp_path):
    # user 1: signup day 0, purchase day 2        (observed, dur 2)
    # user 2: signup day 0, browses until day 4   (CENSORED,  dur 4)
    # user 3: signup day 0, nothing after         (censored,  dur 0)
    rows = [
        (1, "2024-01-01 09:00:00", 1, "signup", 1.0, "{}"),
        (2, "2024-01-03 09:00:00", 1, "purchase", 1.0, "{}"),
        (3, "2024-01-01 09:00:00", 2, "signup", 1.0, "{}"),
        (4, "2024-01-05 09:00:00", 2, "view", 1.0, "{}"),
        (5, "2024-01-01 09:00:00", 3, "signup", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_km_censoring_and_survival_steps(spark, km_sf_dir):
    out = {
        r["dur_days"]: r
        for r in QUERIES["q_kaplan_meier"].fn(spark, km_sf_dir).collect()
    }
    # duration grid: 0 (user 3 censored), 2 (user 1 event), 4 (user 2 censored)
    assert set(out) == {0, 2, 4}
    assert (out[0]["d_events"], out[0]["c_censored"]) == (0, 1)
    assert (out[2]["d_events"], out[2]["c_censored"]) == (1, 0)
    assert (out[4]["d_events"], out[4]["c_censored"]) == (0, 1)
    # risk sets shrink by PRIOR exits only: n=3 at dur 0, 2 at dur 2, 1 at 4
    assert [out[k]["n_at_risk"] for k in (0, 2, 4)] == [3, 2, 1]
    # S: censoring never drops the curve; the one event at dur 2 takes
    # S to (1 - 1/2) = 0.5, which the trailing censor leaves unchanged
    assert out[0]["survival"] == 1.0
    assert abs(out[2]["survival"] - 0.5) < 1e-9
    assert abs(out[4]["survival"] - 0.5) < 1e-9
