"""Build a TIME-SHIFTED clone of a testdata SF directory: every event
timestamp moved by +N years (default +30), everything else untouched.

The time axis stresses what magnitude/sign clones cannot: fixed
calendar constants in queries (period-split dates, retention horizons)
suddenly sit on the far side of ALL data — the round-10 run of this
axis found q_chi2_mix's un-gated degenerate contingency table (one
period empty → ANSI DIVIDE_BY_ZERO on Spark vs NaN on DuckDB) — and
epoch-microsecond values grow toward the lpad tie-key idiom's
non-negative-epoch domain bound (STABILITY.md). Keep shifts POSITIVE:
pre-1970 timestamps would break that documented bound by design.

Usage:
    python tools/time_shift_clone.py [src_sf_dir] [dst_dir] [years]
    python tools/verify_local.py /tmp/sf_tshift
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb


def build(src: str, dst: str, years: int = 30) -> None:
    os.makedirs(dst, exist_ok=True)
    for p in glob.glob(os.path.join(src, "*.parquet")):
        if os.path.basename(p) != "events.parquet":
            shutil.copy(p, dst)
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT event_id, ts + INTERVAL {years} YEAR AS ts,
         user_id, event_type, value, props
  FROM '{src}/events.parquet'
) TO '{dst}/events.parquet' (FORMAT PARQUET)
"""
    )
    lo, hi = con.execute(
        f"SELECT min(ts), max(ts) FROM '{dst}/events.parquet'"
    ).fetchone()
    print(f"built {dst}: ts shifted +{years}y, range [{lo}, {hi}]")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_tshift"
    years = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    build(src, dst, years)
