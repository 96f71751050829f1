"""Registry/evidence sync guard: COVERAGE.md, `__spark_entry__.queries()`,
`oracle_sql()`, bench, and the pytest suite must all agree on the query
inventory — prevents a silent evidence gap where queries exist but never
get a driver correctness row or a pinned test (round 1 shipped 32 such
queries before the driver's sweep ran)."""

from __future__ import annotations

import importlib.util
import os
import re

from market_analyze_data_stream_processing_spark.plans import QUERIES

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_contract_mirrors_registry():
    mod = _entry_module()
    qs = mod.queries()
    osql = mod.oracle_sql()
    assert set(qs) == set(QUERIES), (
        "queries() and the plans registry disagree: "
        f"only-entry={set(qs) - set(QUERIES)} only-registry={set(QUERIES) - set(qs)}"
    )
    with_oracle = {n for n, q in QUERIES.items() if q.oracle}
    assert set(osql) == with_oracle, (
        f"oracle_sql() drift: missing={with_oracle - set(osql)} "
        f"extra={set(osql) - with_oracle}"
    )


def test_coverage_md_in_sync():
    with open(os.path.join(ROOT, "COVERAGE.md")) as f:
        text = f.read()
    documented = set(re.findall(r"^\| `(\w+)` \|", text, re.M))
    assert documented == set(QUERIES), (
        "COVERAGE.md stale — rerun tools/gen_coverage.py: "
        f"missing={set(QUERIES) - documented} extra={documented - set(QUERIES)}"
    )
    m = re.search(r"^(\d+) queries: (\d+) DuckDB-oracle-checked", text, re.M)
    assert m, "COVERAGE.md header line missing"
    n_oracle = sum(1 for q in QUERIES.values() if q.oracle)
    assert (int(m.group(1)), int(m.group(2))) == (len(QUERIES), n_oracle)


def test_every_rows_only_query_has_a_pytest_marker():
    """A query without a SQL oracle must be correctness-pinned somewhere
    in the test suite: its name, or the operator function it wraps, must
    appear in tests/ so the weaker rows-only driver check is backed by a
    real assertion."""
    rows_only = [n for n, q in QUERIES.items() if not q.oracle]
    test_dir = os.path.dirname(os.path.abspath(__file__))
    corpus = ""
    for fn in os.listdir(test_dir):
        if fn.endswith(".py"):
            with open(os.path.join(test_dir, fn)) as f:
                corpus += f.read()
    infra = {
        "F", "W", "Window", "load_table", "spread", "col", "lit", "alias",
        "where", "select", "withColumn", "groupBy", "agg", "orderBy", "limit",
        "broadcast", "range", "len", "float", "int", "str", "sorted",
    }
    corpus_words = set(re.findall(r"\w+", corpus))
    unpinned = []
    for name in rows_only:
        called = set(QUERIES[name].fn.__code__.co_names) - infra
        if name not in corpus and not (called & corpus_words):
            unpinned.append(name)
    assert not unpinned, f"rows-only queries with no pytest evidence: {unpinned}"


def test_no_hugeint_oracle_columns():
    """DuckDB SUM(INTEGER) returns HUGEINT; arrow/pandas-based comparators
    (the driver's included) coerce it to float64/decimal128, so its value
    hash diverges from Spark's bigint even when every value is identical
    (bit us: q12 in round 2). Every oracle must cast integer sums ::BIGINT."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    offenders = {}
    for name, q in QUERIES.items():
        if not q.oracle:
            continue
        schema = con.execute(q.oracle).arrow().schema
        huge = [f.name for f in schema if str(f.type) == "decimal128(38, 0)"]
        if huge:
            offenders[name] = huge
    assert not offenders, f"oracle emits HUGEINT columns (add ::BIGINT): {offenders}"
