"""Build an adversarial clone of a testdata SF directory and (optionally)
run the oracle differential against it.

The driver's correctness gate runs on clean generated data; the edges
that break engines differently — zero prices (ANSI DIVIDE_BY_ZERO on
Spark, ln(0) errors on DuckDB, NULL-vs-inf divergences), flat
(zero-variance) series (built-in corr() crashes under ANSI), single-row
keys — may be absent at one SF and present at another, and testdata is
regenerated between rounds. This tool injects exactly those edges into
a copy of the events table so `tools/verify_local.py` can prove the
whole registry is TOTAL on them, not merely lucky about the data:

- every ~1/1251th event's price zeroed (spread across tickers/days);
- `solo_tick`: a single-event ticker (n=1 moments, stddev of one row);
- `flatline`: six identical closes (zero return variance);
- `zero_open`: a series whose first price is exactly 0.0;
- `null_tick`: an event with a NULL price (skipped by windows/aggs, must
  not crash or desync either engine);
- documents: an empty text, a whitespace-only text, a NULL text, a
  single-token text (no 3-shingles), a NULL-lang row, a unicode/emoji
  text, and an exact-duplicate pair (curation paths must treat all of
  them as data);
- embeddings: an all-zero vector (zero norm — cosine undefined) and an
  exact duplicate of an existing vector (distance ties). A NaN-component
  vector is deliberately NOT injected here: the covariance/Gram kernel's
  policy for non-finite input is a loud REFUSAL (operators/linalg.py
  gram_partials raises; DuckDB's oracle cast errors its own way), so the
  edge is pinned by tests/test_linalg.py::
  test_covariance_refuses_non_finite_components instead of by this
  differential, which must stay 229/229 green.

Round-9 result: the injected edges crashed 9 registry queries
(q_autocorr, q_ljung_box, q_sharpe, q_risk_report, q_pairs_spread,
q_series_correlation, q_hurst, q_stats_agg, q_ulcer) before the
operators were gated / lowered through the exact-moment Pearson kernel
(operators/stats.py); after, 229/229 hash-match the oracle on BOTH the
clean and the adversarial data. `tests/test_ansi_totality.py` pins the
semantics; this tool reproduces the full differential:

    python tools/adversarial_data.py /root/testdata/sf0.01 /tmp/sfz
    python tools/verify_local.py /tmp/sfz
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb

EXTRA_ROWS = """
      (900001, TIMESTAMP '2024-03-05 10:00:00', 41, 'solo_tick', 12.5, ''),
      (900002, TIMESTAMP '2024-03-01 09:00:00', 42, 'flatline', 7.0, ''),
      (900003, TIMESTAMP '2024-03-02 09:00:00', 43, 'flatline', 7.0, ''),
      (900004, TIMESTAMP '2024-03-03 09:00:00', 44, 'flatline', 7.0, ''),
      (900005, TIMESTAMP '2024-03-04 09:00:00', 45, 'flatline', 7.0, ''),
      (900006, TIMESTAMP '2024-03-05 09:00:00', 46, 'flatline', 7.0, ''),
      (900007, TIMESTAMP '2024-03-06 09:00:00', 47, 'flatline', 7.0, ''),
      (900008, TIMESTAMP '2024-03-01 08:00:00', 48, 'zero_open', 0.0, ''),
      (900009, TIMESTAMP '2024-03-02 08:00:00', 49, 'zero_open', 3.0, ''),
      (900010, TIMESTAMP '2024-03-03 08:00:00', 50, 'zero_open', 4.0, ''),
      (900011, TIMESTAMP '2024-03-04 08:00:00', 51, 'null_tick', CAST(NULL AS DOUBLE), ''),
      (900012, TIMESTAMP '2024-03-05 08:00:00', 52, 'null_tick', 2.5, ''),
      (900013, TIMESTAMP '2024-03-06 08:00:00', 53, 'null_tick', 6.0, ''),
      (900014, TIMESTAMP '2024-03-06 09:00:00', 54, 'null_tick', CAST(NULL AS DOUBLE), '')
"""


def build(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    perturbed = {"events.parquet", "documents.parquet", "embeddings.parquet"}
    for p in glob.glob(os.path.join(src, "*.parquet")):
        if os.path.basename(p) not in perturbed:
            shutil.copy(p, dst)
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (900001, '', 'en', 'adversarial', 0),
    (900002, '   ' || chr(10) || chr(9) || ' ', 'en', 'adversarial', 6),
    (900003, 'word', 'en', 'adversarial', 4),
    (900004, 'alpha beta gamma delta epsilon zeta', NULL, 'adversarial', 35),
    (900005, 'héllo wörld — naïve café ✓ ✓ ✓ 日本語テキスト', 'fr', 'adversarial', 43),
    (900006, 'the same duplicated sentence appears twice verbatim', 'en', 'adversarial', 51),
    (900007, 'the same duplicated sentence appears twice verbatim', 'en', 'adversarial', 51),
    (900008, CAST(NULL AS VARCHAR), 'en', 'adversarial', 0)
  ) v(doc_id, text, lang, source, n_chars)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT * FROM '{src}/embeddings.parquet'
  UNION ALL
  SELECT 900001 AS vec_id,
         CAST(list_transform(range(64), x -> 0.0) AS FLOAT[]) AS embedding,
         0 AS label
  UNION ALL
  SELECT 900002 AS vec_id, embedding, label
  FROM '{src}/embeddings.parquet' WHERE vec_id = 0
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  WITH zeroed AS (
    SELECT event_id, ts, user_id, event_type,
           CASE WHEN event_id % 1251 = 7 THEN 0.0 ELSE value END AS value,
           props
    FROM '{src}/events.parquet'
  ),
  extra AS (
    SELECT * FROM (VALUES {EXTRA_ROWS})
        v(event_id, ts, user_id, event_type, value, props)
  )
  SELECT * FROM zeroed UNION ALL SELECT * FROM extra
) TO '{dst}/events.parquet' (FORMAT PARQUET)
"""
    )
    n0, n = con.execute(
        f"SELECT count(*) FILTER (value = 0), count(*) "
        f"FROM '{dst}/events.parquet'"
    ).fetchone()
    print(f"built {dst}: {n} events, {n0} zero-price rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfz"
    build(src, dst)
