"""Build an at-least-once REPLAY clone of a testdata SF directory:
every ``every``-th event payload is re-delivered under a FRESH event_id
(new ids, old timestamps) — the realistic Kafka redelivery shape that
round 10's ad-hoc sweep used to catch four oracles ordering frame-diff
CTEs by ``seq`` alone (seq/ts co-monotonicity is exactly what replayed
offsets break; see STABILITY.md §Replay axis).

NOT built here: exact-duplicate rows (the same event_id twice). That is
a violated primary key, not redelivery — rank/argmax tie-breaks between
bit-identical rows are engine-arbitrary, so it is out of contract by
design (STABILITY.md documents the uniqueness precondition).

Usage:
    python tools/replay_clone.py [src_sf_dir] [dst_dir] [every]
    python tools/verify_local.py /tmp/sf_replay
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb


def build(src: str, dst: str, every: int = 3) -> None:
    os.makedirs(dst, exist_ok=True)
    for p in glob.glob(os.path.join(src, "*.parquet")):
        if os.path.basename(p) != "events.parquet":
            shutil.copy(p, dst)
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT * FROM '{src}/events.parquet'
  UNION ALL
  SELECT event_id + (SELECT max(event_id) + 1
                     FROM '{src}/events.parquet') AS event_id,
         ts, user_id, event_type, value, props
  FROM '{src}/events.parquet'
  WHERE event_id % {every} = 0
) TO '{dst}/events.parquet' (FORMAT PARQUET)
"""
    )
    n_src, n_dst = (
        con.execute(f"SELECT count(*) FROM '{d}/events.parquet'").fetchone()[0]
        for d in (src, dst)
    )
    print(f"built {dst}: {n_src} events + {n_dst - n_src} replayed")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_replay"
    every = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    build(src, dst, every)
