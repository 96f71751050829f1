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


def _make_latest_fn(ttl_ms: int | None):
    def _latest_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Keep the max-seq row per key; emit only when it advances.
        With a TTL, a key idle past ``ttl_ms`` is evicted (X6's stateful
        form: bounded state under key churn) — its next arrival starts
        from scratch and re-emits as new."""
        if state.hasTimedOut:
            state.remove()
            return
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
        if ttl_ms is not None:
            # any activity refreshes the clock; idle keys age out
            state.setTimeoutDuration(ttl_ms)
        if changed:
            yield pd.DataFrame(
                [{"key": key[0], "seq": best_seq, "value": best_value, "payload": best_payload}]
            )

    return _latest_fn


EWMA_STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("seq", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)


def _make_ewma_fn(alpha: float):
    def _ewma_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Recursive (adjust=False) EWMA continued across micro-batches:
        e_t = (1-alpha)*e_{t-1} + alpha*x_t, seeded from state. Rows at
        or before the last processed seq are dropped (late-replay guard),
        so replays emit identical values. State per key is ONE (seq,
        ewma) pair — unlike the batch kernel (operators/analytics q_ewma
        path) no history is held, which is what makes the recursion the
        streaming-native form of the operator."""
        last_seq, last = state.get if state.exists else (-1, None)
        parts = [p for p in pdfs if not p.empty]
        if not parts:
            return
        pdf = pd.concat(parts).sort_values("seq", kind="mergesort")
        pdf = pdf[pdf["seq"] > last_seq]
        # The seq > last_seq guard only drops duplicates from EARLIER
        # micro-batches; two copies of one seq inside the same batch
        # would both advance the recursion. Keep the first per seq so
        # in-batch replays emit once, like cross-batch ones.
        pdf = pdf.drop_duplicates(subset=["seq"], keep="first")
        if pdf.empty:
            return
        vals = pdf["value"].astype(float)
        if last is None:
            ewma = vals.ewm(alpha=alpha, adjust=False).mean()
        else:
            # Prepend the state value as the seed row, then drop it:
            # ewm(adjust=False) starts the recursion at its first element.
            seeded = pd.concat([pd.Series([last]), vals], ignore_index=True)
            ewma = seeded.ewm(alpha=alpha, adjust=False).mean().iloc[1:]
        out = pd.DataFrame(
            {
                "key": key[0],
                "seq": pdf["seq"].astype("int64").to_numpy(),
                "value": vals.to_numpy(),
                "ewma": ewma.to_numpy(),
            }
        )
        state.update((int(out["seq"].iloc[-1]), float(out["ewma"].iloc[-1])))
        yield out

    return _ewma_fn


def ewma_per_key_stateful(
    stream: DataFrame, alpha: float = 0.1, key_col: str = "key"
) -> DataFrame:
    """X3/A-family streaming form: per-key recursive EWMA via
    applyInPandasWithState. Emits one row per input row with the running
    smoothed value; state is a single (seq, ewma) pair per key, so state
    size is O(live keys) regardless of stream length — the unbounded-
    history operator the batch window form cannot express incrementally."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _make_ewma_fn(alpha),
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def latest_per_key_stateful(
    stream: DataFrame, key_col: str = "key", ttl_ms: int | None = None
) -> DataFrame:
    """A8/X7 streaming form: latest row per key via applyInPandasWithState.

    Update-mode output: one row per key per trigger IF it changed. State
    is one tuple per live key — at 10 M keys that's MBs per executor,
    partitioned by the groupBy hash. ``ttl_ms`` bounds state under
    unbounded key churn (one-shot keys age out instead of accumulating
    forever); an evicted key that reappears is treated as brand new,
    whatever its seq."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _make_latest_fn(ttl_ms),
            outputStructType=LATEST_OUTPUT_SCHEMA,
            stateStructType=LATEST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
