"""Upsert sinks (SURVEY.md §2.1 S4/S6, §2.9 X5–X7): checkpointed
foreachBatch keep-latest-per-key merges — the Spark-native form of the
reference's per-message CSV read-modify-write (consumer.py:95-109) and
Chroma ``collection.upsert`` (consumer.py:176-181).

Local implementation merges into plain Parquet (read + union + keep-last
+ atomic-rename overwrite). At production scale the identical
``keep_last_merge`` batch logic lands in a Delta/Iceberg MERGE INTO —
the merge semantics are the contract, the table format is a deployment
choice; partition-by-key keeps the rewrite local to touched partitions.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.analytics import keep_last


def keep_last_merge(
    existing: DataFrame | None,
    incoming: DataFrame,
    keys: list[str],
    order: list[str],
) -> DataFrame:
    """The merge kernel: union existing+incoming, keep the latest row per
    key (W5 — the reference's ``~index.duplicated(keep='last')``)."""
    merged = (
        existing.unionByName(incoming, allowMissingColumns=True)
        if existing is not None
        else incoming
    )
    return keep_last(merged, key=keys, order=order)


def upsert_parquet(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    order: list[str],
    retention_predicate=None,
) -> None:
    """Merge a (micro-)batch into a parquet table with keep-last-per-key
    semantics + optional retention trim (X6), atomically via
    write-new-then-rename. Idempotent for replayed batches (same rows →
    same keep-last outcome), which is what makes checkpointed
    foreachBatch exactly-once in effect (X7)."""
    existing = spark.read.parquet(path) if os.path.exists(path) else None
    merged = keep_last_merge(existing, incoming, keys, order)
    if retention_predicate is not None:
        merged = merged.where(retention_predicate)
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)


def stream_upsert_parquet(
    stream: DataFrame,
    path: str,
    keys: list[str],
    order: list[str],
    checkpoint: str,
    retention_predicate=None,
    trigger_once: bool = False,
):
    """S4/S6 as a streaming sink: checkpointed foreachBatch around
    ``upsert_parquet``.

    Arrival order for keep-last is (batch_id, within-batch row id) —
    assigned inside the batch function (monotonically_increasing_id is
    not allowed on streaming frames) and appended after any caller-
    supplied order columns, so re-sent keys resolve to the latest
    arrival exactly like the reference's keep='last'."""
    spark = stream.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        if batch_df.isEmpty():
            return
        batch_df = batch_df.withColumn(
            "__batch_id", F.lit(batch_id).cast("long")
        ).withColumn("__row_seq", F.monotonically_increasing_id())
        upsert_parquet(
            spark,
            batch_df,
            path,
            keys,
            order + ["__batch_id", "__row_seq"],
            retention_predicate=retention_predicate,
        )

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="60 seconds")  # X1 cadence
    return writer.start()


def retention_filter(now: float, retention_days: int = 30, doc_type: str = "daily_summary"):
    """X6 (consumer.py:26-27, 115-130): drop ``daily_summary`` docs older
    than 30 days; all other types untouched. At scale this predicate is a
    partition drop (date-bucketed partitions), not a row delete."""
    from pyspark.sql import functions as F

    cutoff = now - retention_days * 86400.0
    return ~((F.col("type") == doc_type) & (F.col("timestamp") < cutoff))
