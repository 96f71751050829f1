"""transformWithStateInPandas twins (Spark 4 StatefulProcessor API).

Same computations as tests/test_stateful.py's applyInPandasWithState
forms — parity here proves the two APIs run the identical recursion
(the batch step is shared code), so the legacy API can be swapped out
without semantic drift.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from market_analyze_data_stream_processing_spark.streaming.stateful import (
    HAS_TRANSFORM_WITH_STATE,
    ROCKSDB_PROVIDER,
    ewma_per_key_tws,
    latest_per_key_tws,
)

# Applied to the ENGINE tests only — the processor-logic tests below run
# everywhere (fake state, no protobuf state server needed).
needs_tws_engine = pytest.mark.skipif(
    not HAS_TRANSFORM_WITH_STATE,
    reason="transformWithStateInPandas needs Spark >= 4.0 AND protobuf "
    "(the TWS state-server wire protocol); this environment lacks "
    "google.protobuf, so the engine parity tests run only where it exists",
)

IN_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("seq", LongType()),
        StructField("value", DoubleType()),
        StructField("payload", StringType()),
    ]
)


class _FakeValueState:
    """Stand-in for the TWS ValueState client: same
    exists()/get()/update() surface, dict-backed. Lets the processor
    classes execute WITHOUT the protobuf state server, so the TWS code
    path has run in this repo even where the engine dependency is
    missing."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.states[name] = _FakeValueState()
        return self.states[name]


def test_ewma_processor_logic_matches_legacy_fn():
    """The TWS processor and the legacy applyInPandasWithState closure
    must produce identical emissions for the same batch sequence (they
    share _ewma_step; this pins the state-handling glue around it).
    Runs WITHOUT the streaming engine — no protobuf needed."""
    import pandas as pd

    from market_analyze_data_stream_processing_spark.streaming.stateful import (
        _EwmaProcessor,
    )

    proc = _EwmaProcessor(alpha=0.25)
    proc.init(_FakeHandle())
    batches = [
        [pd.DataFrame({"seq": [1, 2], "value": [10.0, 30.0]})],
        # cross-batch replay of seq 2 + in-batch duplicate of seq 4
        [pd.DataFrame({"seq": [2, 3, 4, 4], "value": [999.0, 20.0, 40.0, 999.0]})],
        [pd.DataFrame({"seq": [5], "value": [25.0]})],
    ]
    emitted = []
    for parts in batches:
        emitted.extend(df for df in proc.handleInputRows(("A",), parts, None))
    out = pd.concat(emitted).reset_index(drop=True)
    expect = pd.Series([10.0, 30.0, 20.0, 40.0, 25.0]).ewm(
        alpha=0.25, adjust=False
    ).mean()
    assert list(out["seq"]) == [1, 2, 3, 4, 5]
    assert not (out["value"] == 999.0).any()
    assert (out["ewma"] - expect).abs().max() < 1e-12
    proc.close()


def test_latest_processor_logic_keeps_max_seq():
    import pandas as pd

    from market_analyze_data_stream_processing_spark.streaming.stateful import (
        _LatestProcessor,
    )

    proc = _LatestProcessor(ttl_ms=None)
    proc.init(_FakeHandle())
    b0 = [pd.DataFrame({"seq": [1, 3], "value": [10.0, 30.0], "payload": ["a1", "a3"]})]
    b1 = [pd.DataFrame({"seq": [2], "value": [20.0], "payload": ["stale"]})]
    b2 = [pd.DataFrame({"seq": [9], "value": [90.0], "payload": ["a9"]})]
    outs = [list(proc.handleInputRows(("A",), b, None)) for b in (b0, b1, b2)]
    assert outs[0][0]["payload"].iloc[0] == "a3"
    assert outs[1] == []  # stale seq never emits
    assert outs[2][0]["payload"].iloc[0] == "a9"
    proc.close()


def test_latest_processor_stale_activity_rewrites_state_for_ttl():
    """TTL parity with the legacy form: ANY activity keeps the key
    alive. TWS value-state TTL refreshes on write, so an all-stale batch
    must RE-WRITE the unchanged best row (no emission) — a key fed only
    stale replays would otherwise expire and re-emit as brand new."""
    import pandas as pd

    from market_analyze_data_stream_processing_spark.streaming.stateful import (
        _LatestProcessor,
    )

    class _CountingState(_FakeValueState):
        def __init__(self):
            super().__init__()
            self.writes = 0

        def update(self, v):
            self.writes += 1
            super().update(v)

    class _CountingHandle(_FakeHandle):
        def getValueState(self, name, schema, ttlDurationMs=None):
            self.states[name] = _CountingState()
            return self.states[name]

    proc = _LatestProcessor(ttl_ms=60_000)
    handle = _CountingHandle()
    proc.init(handle)
    state = handle.states["latest"]
    fresh = [pd.DataFrame({"seq": [5], "value": [50.0], "payload": ["a5"]})]
    stale = [pd.DataFrame({"seq": [2], "value": [20.0], "payload": ["old"]})]
    assert len(list(proc.handleInputRows(("A",), fresh, None))) == 1
    w0 = state.writes
    assert list(proc.handleInputRows(("A",), stale, None)) == []
    assert state.writes == w0 + 1  # rewritten (TTL refresh), not skipped
    assert state.get() == (5, 50.0, "a5")  # ...with the UNCHANGED best row
    proc.close()


@pytest.fixture()
def tws_spark(spark):
    """transformWithState requires the RocksDB state store provider;
    scope the conf change to the test."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    yield spark
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def _write_batches(d, batches):
    d.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        f = d / f"b{i}.json"
        f.write_text("\n".join(json.dumps(r) for r in rows))
        # FileStreamSource orders batches by mtime; pin strictly increasing
        os.utime(f, (now + i, now + i))


@needs_tws_engine
def test_ewma_tws_matches_pandas_across_batches(tws_spark, tmp_path):
    import pandas as pd

    spark = tws_spark
    d = tmp_path / "in_ewma_tws"
    a_vals = [10.0, 30.0, 20.0, 40.0, 25.0]
    b_vals = [5.0, 6.0]
    _write_batches(
        d,
        [
            [
                {"key": "A", "seq": 1, "value": a_vals[0], "payload": ""},
                {"key": "A", "seq": 2, "value": a_vals[1], "payload": ""},
                {"key": "B", "seq": 1, "value": b_vals[0], "payload": ""},
            ],
            [
                {"key": "A", "seq": 2, "value": 999.0, "payload": "replay"},
                {"key": "A", "seq": 3, "value": a_vals[2], "payload": ""},
                {"key": "A", "seq": 4, "value": a_vals[3], "payload": ""},
                {"key": "A", "seq": 4, "value": 999.0, "payload": "dup-in-batch"},
                {"key": "B", "seq": 2, "value": b_vals[1], "payload": ""},
            ],
            [{"key": "A", "seq": 5, "value": a_vals[4], "payload": ""}],
        ],
    )
    stream = (
        spark.readStream.schema(IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
        .select("key", "seq", "value")
    )
    out = ewma_per_key_tws(stream, alpha=0.25)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp_ewma_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM ewma_tws ORDER BY key, seq").collect()
    got = {(r["key"], r["seq"]): r["ewma"] for r in rows}
    assert len(rows) == len(a_vals) + len(b_vals)
    assert not any(r["value"] == 999.0 for r in rows)
    expect_a = pd.Series(a_vals).ewm(alpha=0.25, adjust=False).mean()
    expect_b = pd.Series(b_vals).ewm(alpha=0.25, adjust=False).mean()
    for i, e in enumerate(expect_a):
        assert abs(got[("A", i + 1)] - e) < 1e-12
    for i, e in enumerate(expect_b):
        assert abs(got[("B", i + 1)] - e) < 1e-12


@needs_tws_engine
def test_latest_tws_keeps_max_seq_and_drops_stale(tws_spark, tmp_path):
    spark = tws_spark
    d = tmp_path / "in_latest_tws"
    _write_batches(
        d,
        [
            [
                {"key": "A", "seq": 1, "value": 10.0, "payload": "a1"},
                {"key": "A", "seq": 3, "value": 30.0, "payload": "a3"},
                {"key": "B", "seq": 1, "value": 5.0, "payload": "b1"},
            ],
            [
                {"key": "A", "seq": 2, "value": 20.0, "payload": "stale"},
                {"key": "A", "seq": 9, "value": 90.0, "payload": "a9"},
                {"key": "C", "seq": 1, "value": 1.0, "payload": "c1"},
            ],
        ],
    )
    stream = (
        spark.readStream.schema(IN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    out = latest_per_key_tws(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("latest_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp_latest_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM latest_tws").collect()
    final = {}
    for r in rows:
        if r["key"] not in final or r["seq"] > final[r["key"]]["seq"]:
            final[r["key"]] = r
    assert final["A"]["payload"] == "a9" and final["A"]["value"] == 90.0
    assert final["B"]["payload"] == "b1"
    assert final["C"]["payload"] == "c1"
    assert not any(r["payload"] == "stale" for r in rows)
