"""Build an effective-sf1 testdata directory by 10×-replicating sf0.1
with PER-REPLICA KEY SHIFTS (scratch-dir only; /root/testdata is never
touched).

Why key shifts: naively unioning 10 copies of both sides of a join
multiplies match cardinality 100× (every copy of an orderkey meets
every copy of its lineitems) — that is data corruption, not scale.
Shifting every entity key by ``replica·SHIFT`` makes each replica a
referentially closed shard: joins and key-grouped aggregates grow 10×,
exactly what 10× more real data does. Dimension tables (region/nation)
and low-cardinality attributes (brands, segments, tickers) are kept
as-is, so per-group row counts grow 10× — series windows, baskets, and
inverted-index postings all deepen the way a real corpus would.

Known semantic deltas (timing sweep only — NOT an oracle corpus):
- events: the same (ticker, ts) now carries 10 ticks disambiguated by
  seq — a 10× denser tape, which is the stress we want on windows.
- documents/embeddings: text/vectors are duplicated under fresh ids, so
  the dedup family sees 10-clique duplication — an adversarial but
  realistic shape for a dedup engine (that is what dedup exists for);
  the DF caps and banding bounds must absorb it.

Usage: python tools/make_sf1.py [src_sf_dir] [dst_dir] [replicas]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

SHIFT = 100_000_000  # far above any sf0.1 key (max observed ~6e5)

#: per-table key columns to shift per replica (referential closure)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def build(src: str, dst: str, replicas: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"({c} + r.i * {SHIFT}) AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"range({replicas}) AS r(i)) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, dst, rep)
    print(f"built {dst} ({rep}x {src})")
