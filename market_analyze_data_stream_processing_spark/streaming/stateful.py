"""Custom stateful streaming operators (SURVEY.md §2.9 X7 low-latency
path, §2.10 UDAF surface): ``applyInPandasWithState`` keeps the latest
row per key in bounded state — the reference's LATEST_TECH_*/
LATEST_METRICS_* live-overwrite semantics without a table rewrite per
trigger.

This is the lower-latency alternative to the foreachBatch merge in
``upsert.py``: state lives in the state store (checkpointed, bounded by
TTL timeouts), and each trigger emits only changed keys.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LATEST_STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("value", DoubleType()),
        StructField("payload", StringType()),
    ]
)

LATEST_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("seq", LongType()),
        StructField("value", DoubleType()),
        StructField("payload", StringType()),
    ]
)


def _latest_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Keep the max-seq row per key; emit only when it advances."""
    best_seq, best_value, best_payload = (
        state.get if state.exists else (-1, None, None)
    )
    changed = False
    for pdf in pdfs:
        if pdf.empty:
            continue
        row = pdf.loc[pdf["seq"].idxmax()]
        if int(row["seq"]) > best_seq:
            best_seq = int(row["seq"])
            best_value = float(row["value"])
            best_payload = str(row["payload"])
            changed = True
    if changed:
        state.update((best_seq, best_value, best_payload))
        yield pd.DataFrame(
            [{"key": key[0], "seq": best_seq, "value": best_value, "payload": best_payload}]
        )


def latest_per_key_stateful(stream: DataFrame, key_col: str = "key") -> DataFrame:
    """A8/X7 streaming form: latest row per key via applyInPandasWithState.

    Update-mode output: one row per key per trigger IF it changed. State
    is one tuple per live key — at 10 M keys that's MBs per executor,
    partitioned by the groupBy hash."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _latest_fn,
            outputStructType=LATEST_OUTPUT_SCHEMA,
            stateStructType=LATEST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
