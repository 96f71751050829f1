"""Table layout: partition pruning, bucketed shuffle-free joins,
partition-drop retention (the 100 TB storage mechanics, asserted on the
physical plan)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.sources.storage import (
    explain_string,
    retention_drop_partitions,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture(scope="module")
def prices(spark):
    rows = [
        (t, f"2024-01-{d:02d}", 100.0 + d)
        for t in ["MC.PA", "AIR.PA", "SU.PA"]
        for d in range(1, 6)
    ]
    return spark.createDataFrame(rows, ["ticker", "date", "Close"])


def test_partition_pruning_hits_one_directory(spark, prices, tmp_path):
    path = str(tmp_path / "prices_part")
    write_partitioned(prices, path, ["ticker"])
    assert sorted(e for e in os.listdir(path) if e.startswith("ticker=")) == [
        "ticker=AIR.PA", "ticker=MC.PA", "ticker=SU.PA",
    ]
    q = spark.read.parquet(path).where(F.col("ticker") == "MC.PA")
    plan = explain_string(q)
    assert "PartitionFilters" in plan and "MC.PA" in plan
    assert q.count() == 5


def test_bucketed_join_has_no_shuffle(spark, prices, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import shutil

        warehouse = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
        for t in ("t_prices_b", "t_meta_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
        write_bucketed(prices, "t_prices_b", ["ticker"], n_buckets=4, sort_cols=["ticker"])
        meta = prices.select("ticker").distinct().withColumn("sector", F.lit("lux"))
        write_bucketed(meta, "t_meta_b", ["ticker"], n_buckets=4, sort_cols=["ticker"])
        j = spark.table("t_prices_b").join(spark.table("t_meta_b"), "ticker")
        plan = explain_string(j)
        assert "SortMergeJoin" in plan
        # bucket-aligned scan: no Exchange feeds the join
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == 15
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_retention_drop_partitions(spark, prices, tmp_path):
    path = str(tmp_path / "by_date")
    write_partitioned(prices, path, ["date"])
    dropped = retention_drop_partitions(path, "date", lambda d: d >= "2024-01-03")
    assert dropped == ["2024-01-01", "2024-01-02"]
    left = spark.read.parquet(path)
    assert left.count() == 9  # 3 tickers × 3 surviving days
    # partition values are type-inferred (string → date) on read
    assert str(left.agg(F.min("date")).first()[0]) == "2024-01-03"


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Schema evolution: a 100 TB table accretes columns over time;
    mergeSchema reads old+new files as one superset schema with NULLs
    for missing columns — the append-only evolution contract."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, 10.0)], "id long, a double").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, 20.0, "new")], "id long, a double, b string"
    ).write.mode("append").parquet(path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "a", "b"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["b"] is None and rows[2]["b"] == "new"


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered files must cover a NARROW range of BOTH key columns
    (file min/max stats then prune scans filtered on either dimension);
    a single-column sort clusters one dimension and leaves the other at
    full span — the contrast that justifies the Morton layout."""
    import glob

    from market_analyze_data_stream_processing_spark.sources.storage import (
        write_zordered,
    )

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )

    def file_spans(path):
        sx, sy = [], []
        for f in glob.glob(f"{path}/*.parquet"):
            r = (
                spark.read.parquet(f)
                .agg(
                    (F.max("x") - F.min("x")).alias("dx"),
                    (F.max("y") - F.min("y")).alias("dy"),
                )
                .first()
            )
            sx.append(r["dx"])
            sy.append(r["dy"])
        return sum(sx) / len(sx), sum(sy) / len(sy)

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, "x", "y", n_files=16, bits=6)
    zx, zy = file_spans(zpath)
    # 16 files over a 64×64 grid ⇒ ~16×16 z-blocks: both spans well under
    # half the global span of 63
    assert zx < 0.45 * 63 and zy < 0.45 * 63, (zx, zy)

    spath = str(tmp_path / "sorted_x")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)
    px, py = file_spans(spath)
    assert px < 0.45 * 63          # the sorted dimension clusters...
    assert py > 0.9 * 63, (px, py)  # ...the other stays at full span


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime row-level filtering for big shuffle joins: a selective
    filter on the dimension side injects a bloom_filter_agg /
    might_contain pair that prunes fact rows BEFORE the shuffle. The
    size thresholds here are scaled down to local test data — at
    production scale the defaults (10 GB application side) fire on
    their own; the assertion is that the session/plan shape supports
    the injection at all."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sf = "/root/testdata/sf0.01"
        l = spark.read.parquet(f"{sf}/lineitem.parquet")
        o = spark.read.parquet(f"{sf}/orders.parquet").where(
            F.col("o_totalprice") > 400000
        )
        j = l.join(o, l.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan
        assert j.count() > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_compact_partitions_rewrites_only_fragmented_dirs(spark, tmp_path):
    """Compaction touches ONLY over-fragmented partition directories
    (compliant ones keep their files byte-identical — etag/cache
    stability), reduces file counts to the byte-target, and preserves
    table content exactly."""
    import os

    from market_analyze_data_stream_processing_spark.sources.storage import (
        compact_partitions,
    )

    path = str(tmp_path / "t")
    frag = spark.range(0, 2000).withColumn("part", F.lit("hot"))
    frag.repartition(12).write.partitionBy("part").parquet(path)
    ok = spark.range(2000, 2100).withColumn("part", F.lit("cold"))
    ok.coalesce(2).write.mode("append").partitionBy("part").parquet(path)

    cold_dir = os.path.join(path, "part=cold")
    cold_before = sorted(os.listdir(cold_dir))
    before = {r["id"] for r in spark.read.parquet(path).collect()}

    results = compact_partitions(spark, path, "part", max_files=4)
    assert [r[0] for r in results] == ["hot"]  # cold untouched
    (_, n_before, n_after) = results[0]
    assert n_before == 12 and 1 <= n_after <= 4
    hot_files = [
        f for f in os.listdir(os.path.join(path, "part=hot"))
        if f.endswith(".parquet")
    ]
    assert len(hot_files) == n_after
    # compliant partition: files byte-identical (names unchanged)
    assert sorted(os.listdir(cold_dir)) == cold_before
    # content exact
    after = {r["id"] for r in spark.read.parquet(path).collect()}
    assert after == before and len(after) == 2100
    # idempotent: a second run finds nothing fragmented
    assert compact_partitions(spark, path, "part", max_files=4) == []
    # missing path: no-op
    assert compact_partitions(spark, str(tmp_path / "nope"), "part") == []
