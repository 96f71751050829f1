"""Upsert sinks (SURVEY.md §2.1 S4/S6, §2.9 X5–X7): checkpointed
foreachBatch keep-latest-per-key merges — the Spark-native form of the
reference's per-message CSV read-modify-write (consumer.py:95-109) and
Chroma ``collection.upsert`` (consumer.py:176-181).

Local implementation merges into hash-bucket-partitioned Parquet: the
table is laid out as ``path/__bucket=NN/`` directories keyed by
``xxhash64(keys) % n_buckets``, and a micro-batch only READS and
REWRITES the buckets its keys hash into (partition-pruned scan +
dynamic partition overwrite). Untouched bucket directories are never
opened — per-trigger I/O is O(batch ∧ touched buckets), not O(table),
which is what makes a 60 s trigger viable against a 100 TB store. At
production scale the identical ``keep_last_merge`` batch logic lands in
a Delta/Iceberg MERGE INTO — the merge semantics are the contract, the
table format is a deployment choice.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _bucket_expr(keys: list[str], n_buckets: int):
    return F.pmod(
        F.xxhash64(*[F.col(k).cast("string") for k in keys]), F.lit(n_buckets)
    ).cast("int")


def upsert_parquet(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    order: list[str],
    retention_predicate=None,
    n_buckets: int = 16,
) -> None:
    """Merge a (micro-)batch into a bucket-partitioned parquet table with
    keep-last-per-key semantics + optional retention trim (X6).

    Scale shape: only the ≤``n_buckets`` partitions containing incoming
    keys are read (partition-pruned scan on the ``__bucket`` directory
    column) and only those are replaced (dynamic partition overwrite) —
    per-batch I/O is proportional to the touched buckets, never the
    whole table, and the table path always exists (no reader-visible
    swap window; the commit protocol stages and renames per partition).

    Idempotent for replayed batches (same rows → same keep-last
    outcome), which is what makes checkpointed foreachBatch exactly-once
    in effect (X7). ``n_buckets`` is a table constant — changing it on
    an existing table would split keys across buckets; keep it fixed per
    path. ``retention_predicate`` is enforced on touched buckets as part
    of the merge; a full-table retention sweep is a separate maintenance
    job (at scale: a date-partition drop, see ``retention_filter``).
    """
    incoming = incoming.withColumn("__bucket", _bucket_expr(keys, n_buckets))
    touched: list[int] | None = None
    existing = None
    if os.path.exists(path):
        # Materialize the batch ONCE so the touched-bucket set and the
        # written rows come from the same data — a non-deterministic
        # incoming frame evaluated twice could write a bucket that was
        # never read-merged (silent data loss).
        incoming = incoming.localCheckpoint()
        touched = [r[0] for r in incoming.select("__bucket").distinct().collect()]
        existing = spark.read.parquet(path).where(F.col("__bucket").isin(touched))
    merged = keep_last_merge(existing, incoming, keys, order)
    if retention_predicate is not None:
        merged = merged.where(retention_predicate)
    survived: set[int] | None = None
    if touched and retention_predicate is not None:
        # The survived-bucket set must be computed BEFORE the overwrite:
        # `merged`'s plan scans the pre-write file listing of `path`, and
        # re-executing it after dynamic overwrite has replaced those files
        # fails with FILE_NOT_EXIST on any partially-trimmed bucket.
        # Persist so the write below reuses this materialization.
        merged = merged.persist()
        survived = {r[0] for r in merged.select("__bucket").distinct().collect()}
    (
        merged.repartition("__bucket")
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    if survived is not None:
        # Dynamic overwrite only replaces partitions present in the output:
        # a touched bucket whose every row was retention-trimmed (the only
        # way a touched bucket can vanish — a keep-last merge always emits
        # ≥1 row per incoming key) would keep its stale directory, so drop
        # those explicitly (≤n_buckets dirs).
        left = {
            int(d.split("=", 1)[1])
            for d in os.listdir(path)
            if d.startswith("__bucket=")
        }
        for b in set(touched) & left - survived:
            shutil.rmtree(os.path.join(path, f"__bucket={b}"), ignore_errors=True)
        merged.unpersist()


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
