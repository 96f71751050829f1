"""Build a magnitude-stressed clone of a testdata SF directory: every
event value ×SCALE (default 100), everything else untouched.

The driver regenerates data each round, and the quantization grids
carry REAL domain bounds (|x·10^d| < 2^53 for cross-engine exactness,
2^63 for Spark's LONG-floor saturation — operators/stats.quantize).
Generated values top out ~5e2, so a latent bound violation is
invisible until data magnitude grows. This tool makes that stress
explicit: scale the values two orders of magnitude (still INSIDE every
documented bound) and run the bit-exact oracle differential — anything
that reds has a grid sized to the data instead of to the documented
domain, which is a future driver red waiting for bigger numbers.

Round-10 findings (all fixed; STABILITY.md has the full analysis):
- ×100 — q_seasonality_strength: 12-digit grid on SQUARED price
  deviations crossed 2^53 (then saturated Spark's LONG floor at 2^63)
  → 6-digit square grid, good to |dev| ~ 9.5e4.
- ×100 — q_humanize_fmt: un-snapped %.2f formatting — Java HALF_UPs
  the shortest repr, C printf rounds the binary expansion — diverged
  on data-level half-cases once the ÷1e9 branch engaged →
  snap-before-format on both sides.
- ×1000 — q_roll_spread: DuckDB's wide-decimal→double cast
  double-rounds (int128→double, then ÷10^scale) past 2^53 → pure
  DECIMAL cross-products + the split-cast idiom
  (functions/scalars.decimal_to_double_split).
Post-fix the full differential is bit-exact at ×1, ×100 AND ×1000.

A SHIFT gives the sign axis: ``scale=1 shift=-250`` makes ~half the
event values negative, exercising every log/sqrt/ratio gate's
negative branch (round-10 run: 229/229 bit-exact — the positivity
gates null identically on both engines).

Recommended per-round axes (all 229/229 bit-exact as of round 10):
    scale=100            magnitude (inside every documented bound)
    scale=1000           magnitude frontier (bounds engage at x10000)
    scale=1.0000001      FRACTIONAL: full 16-digit mantissas — the
                         highest-yield axis; generated values sit
                         exactly on every grid and mask bare casts
    scale=1 shift=-250   sign axis (negative-branch gates)

Usage:
    python tools/magnitude_stress.py [src_sf_dir] [dst_dir] [scale] [shift]
    python tools/verify_local.py /tmp/sf_mag100
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb


def build(src: str, dst: str, scale: float = 100.0, shift: float = 0.0) -> None:
    os.makedirs(dst, exist_ok=True)
    for p in glob.glob(os.path.join(src, "*.parquet")):
        if os.path.basename(p) != "events.parquet":
            shutil.copy(p, dst)
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT event_id, ts, user_id, event_type,
         value * {scale!r} + {shift!r} AS value, props
  FROM '{src}/events.parquet'
) TO '{dst}/events.parquet' (FORMAT PARQUET)
"""
    )
    hi, lo, neg = con.execute(
        f"""SELECT max(value), min(value),
                   sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)
            FROM '{dst}/events.parquet'"""
    ).fetchone()
    print(
        f"built {dst}: x{scale} + {shift}, range [{lo}, {hi}], "
        f"{neg} negative rows"
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_mag100"
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 100.0
    shift = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    build(src, dst, scale, shift)
