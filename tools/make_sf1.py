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

Two corpus modes (documents/embeddings):

- ``shard`` (default): the SAME referential-closure principle applied
  to text and vectors. Replica k>0 suffixes every document token with
  ``<k>q`` (disjoint vocabulary shards — shingle/token postings stay
  sf0.1-length per shard, so dedup/near-dup pair generation grows 10×
  LINEAR, like a real 10× corpus) and circularly rotates each
  embedding by k components (norms and intra-shard geometry preserved,
  cross-shard cosine scrambled — kNN/ANN candidate sets stay
  shard-local). This is the mode for full-registry ORACLE DIFFERENTIALS
  at sf1: every query's work scales the way real data would.
- ``clique``: replicas carry text/vectors VERBATIM under fresh ids, so
  the dedup family sees 10-clique duplication of the entire corpus.
  Deliberately adversarial (that is what dedup exists for) — but pair
  generation fills in ~100× (Σdf² over 10× postings), so it prices the
  documented q_supplier_overlap-class fill-in, not realistic scale.
  Round-11 measurement: the q_dup_clusters DuckDB oracle alone ran
  >25 min at sf1-clique before being cut off. Use for bounded timing
  probes of the dedup family, never for full-registry sweeps.

Known semantic delta in both modes: events keeps the same (ticker, ts)
tick times across replicas, disambiguated by seq — a 10× denser tape,
which is the stress we want on windows.

Usage: python tools/make_sf1.py [src_sf_dir] [dst_dir] [replicas] [mode]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 10 shard)
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

#: shard-mode column rewrites (referential closure for text/vectors):
#: token-suffix documents text per replica; circularly rotate embeddings.
SHARD_EXPRS = {
    ("documents", "text"): (
        "CASE WHEN r.i = 0 THEN text ELSE regexp_replace(text, "
        "'(\\S+)', '\\1' || CAST(r.i AS VARCHAR) || 'q', 'g') END AS text"
    ),
    ("documents", "n_chars"): (
        "CASE WHEN r.i = 0 THEN n_chars ELSE length(regexp_replace(text, "
        "'(\\S+)', '\\1' || CAST(r.i AS VARCHAR) || 'q', 'g')) END AS n_chars"
    ),
    ("embeddings", "embedding"): (
        "CAST(list_concat(embedding[r.i + 1:], embedding[1:r.i]) "
        "AS FLOAT[]) AS embedding"
    ),
}


def build(src: str, dst: str, replicas: int = 10, mode: str = "shard") -> None:
    if mode not in ("shard", "clique"):
        raise ValueError(f"mode must be shard|clique, got {mode!r}")
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
        exprs = []
        for c in cols:
            if c in keys:
                exprs.append(f"({c} + r.i * {SHIFT}) AS {c}")
            elif mode == "shard" and (t, c) in SHARD_EXPRS:
                exprs.append(SHARD_EXPRS[(t, c)])
            else:
                exprs.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet', "
            f"range({replicas}) AS r(i)) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else "shard"
    build(src, dst, rep, mode)
    print(f"built {dst} ({rep}x {src}, {mode} mode)")
