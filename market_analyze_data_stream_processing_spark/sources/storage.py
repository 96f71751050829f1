"""Table layout helpers — the 100 TB storage story (SURVEY §4 O1/O7):

- ``write_partitioned``: hive-style partition directories; equality and
  IN filters on partition columns become partition PRUNING (the scan
  never lists non-matching directories). The reference's per-ticker CSV
  files were an accidental version of this; here it's the planner's.
- ``write_bucketed``: co-located join layout; two tables bucketed by the
  same key join WITHOUT a shuffle (SortMergeJoin reads bucket-aligned
  splits). This is how the prices⋈docs or orders⋈lineitem join avoids
  moving 100 TB.
- ``retention_drop_partitions``: retention as partition deletion (O(1)
  metadata per day dropped) — the scale form of X6 instead of row
  deletes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")


def retention_drop_partitions(
    path: str, partition_col: str, keep_predicate
) -> list[str]:
    """Drop whole partition directories failing ``keep_predicate(value)``.
    Returns dropped partition values. Metadata-cost retention: no data
    rewrite for surviving partitions."""
    dropped = []
    if not os.path.isdir(path):
        return dropped
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(f"{partition_col}="):
            continue
        value = entry.split("=", 1)[1]
        if not keep_predicate(value):
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
            dropped.append(value)
    return dropped


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Lay a table out along a Morton z-curve over two key columns:
    range-partition by the interleaved z-value (one shuffle) and sort
    within each output file. Every file then covers a narrow range of
    BOTH columns, so file min/max statistics prune scans filtered on
    either dimension — single-column sort only achieves this for one.
    The z-value is a layout key, not data: it is dropped on write."""
    from ..functions.layout import zvalue
    from pyspark.sql import functions as F

    z = df.withColumn("__z", zvalue(F.col(x_col), F.col(y_col), bits=bits))
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_partitions(
    spark,
    path: str,
    partition_col: str,
    max_files: int = 4,
    target_bytes: int = 128 << 20,
) -> list[tuple[str, int, int]]:
    """Small-file compaction, partition directory by partition directory
    — the maintenance job that keeps a streaming-ingested table scannable
    (every micro-batch appends a file per task; after a week a 100 TB
    table is millions of KB-files and the scan is metadata-bound).

    Only directories with MORE than ``max_files`` data files are
    rewritten, each to ceil(bytes / target_bytes) files — so a nightly
    run costs the fragmented fraction of the table, not a full rewrite,
    and already-compact partitions keep their files byte-identical
    (their scan caches / object etags stay valid). Returns
    (partition_value, files_before, files_after) per rewritten
    partition.

    The swap is write-to-temp + directory rename — atomic on a local /
    HDFS-like filesystem. On an object store, pair it with a manifest
    commit (table-format territory) instead of relying on rename.
    """
    results: list[tuple[str, int, int]] = []
    if not os.path.isdir(path):
        return results
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(f"{partition_col}="):
            continue
        pdir = os.path.join(path, entry)
        data_files = [
            f
            for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        if len(data_files) <= max_files:
            continue
        total = sum(os.path.getsize(os.path.join(pdir, f)) for f in data_files)
        n_out = max(1, -(-total // target_bytes))  # ceil-div
        tmp = pdir + "._compacting"
        shutil.rmtree(tmp, ignore_errors=True)
        spark.read.parquet(pdir).coalesce(int(n_out)).write.mode(
            "overwrite"
        ).parquet(tmp)
        old = pdir + "._old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old, ignore_errors=True)
        n_after = len(
            [
                f
                for f in os.listdir(pdir)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ]
        )
        results.append((entry.split("=", 1)[1], len(data_files), n_after))
    return results
