"""Explicit partitioning / ship-strategy surface (DataSet.partitionByHash
:1276, partitionByRange :1302, rebalance :1251, partitionCustom :1334;
DataSetUtils.zipWithIndex :68 / zipWithUniqueId :119)."""

from __future__ import annotations

from pyspark.sql import functions as F

from proteus_engine_spark.operators.partitioning import (
    partition_by_hash,
    partition_by_range,
    partition_custom,
    rebalance,
    zip_with_index,
    zip_with_unique_id,
)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_by_hash_plans_hash_exchange(spark):
    df = spark.range(1000).withColumn("k", F.col("id") % 7)
    plan = _plan(partition_by_hash(df, "k", n=8))
    assert "hashpartitioning" in plan and "k#" in plan


def test_partition_by_range_plans_range_exchange(spark):
    df = spark.range(1000).withColumn("k", F.col("id") % 7)
    plan = _plan(partition_by_range(df, "k", n=8))
    assert "rangepartitioning" in plan


def test_rebalance_round_robin(spark):
    df = spark.range(1000).filter(F.col("id") < 10)  # skewed tiny remainder
    out = rebalance(df, n=4)
    assert "RoundRobinPartitioning" in _plan(out) or "roundrobin" in _plan(out).lower()
    assert out.count() == 10


def test_partition_custom_expression_key(spark):
    df = spark.range(100)
    out = partition_custom(df, (F.col("id") % 5).cast("int"), n=5)
    assert out.count() == 100
    assert "hashpartitioning" in _plan(out)


def test_zip_with_unique_id_unique(spark):
    df = spark.range(500).repartition(8)
    out = zip_with_unique_id(df)
    ids = [r["unique_id"] for r in out.collect()]
    assert len(set(ids)) == 500


def test_zip_with_index_contiguous_and_order_preserving(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2).orderBy(F.col("id").desc())
    out = zip_with_index(df)
    rows = sorted((r["idx"], r["id"]) for r in out.collect())
    # contiguous 0..99, and index follows the descending sort order
    assert [i for i, _ in rows] == list(range(100))
    assert rows[0] == (0, 99) and rows[99] == (99, 0)


def test_zip_with_index_plan_is_jvm_only(spark):
    # The whole scheme must stay inside Catalyst: no Python evaluation
    # node (the r5 implementation round-tripped every row through
    # df.rdd.zipWithIndex — a full-corpus Python pass at 100 TB). The
    # localCheckpoint scan DOES surface as an ExistingRDD of JVM
    # InternalRows — that is the deliberate one-time materialization that
    # pins one partitioning for both passes (AQE re-planning between the
    # count and assign passes dropped whole partitions at sf0.1), not a
    # Python crossing.
    df = spark.range(1000).repartition(8)
    plan = _plan(zip_with_index(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "row_number" in plan
    # offsets arrive via broadcast, not a shuffled join
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_zip_with_index_multi_partition_counts(spark):
    # uneven partitions: offsets must accumulate per-partition counts
    df = spark.range(1003).repartition(7)
    out = zip_with_index(df)
    idxs = [r["idx"] for r in out.collect()]
    assert sorted(idxs) == list(range(1003))


# --- widen_if_narrow (r17 optimization round: scale-adaptive widening) ---


def test_widen_if_narrow_repartitions_single_file(spark, tmp_path):
    from proteus_engine_spark.operators.partitioning import widen_if_narrow

    p = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = widen_if_narrow(df, 8)
    assert "REPARTITION_BY_NUM" in _plan(out)
    assert sorted(r["id"] for r in out.collect()) == list(range(100))


def test_widen_if_narrow_skips_wide_scan(spark, tmp_path):
    from proteus_engine_spark.operators.partitioning import widen_if_narrow

    p = str(tmp_path / "many")
    spark.range(100).repartition(10).write.parquet(p)
    df = spark.read.parquet(p)
    # 10 files >= 8 target: provably wide, the repartition must be skipped
    out = widen_if_narrow(df, 8)
    assert out is df
    # but a higher target than the file count still repartitions
    assert "REPARTITION_BY_NUM" in _plan(widen_if_narrow(df, 64))


def test_widen_if_narrow_key_columns_and_nonfile_fallback(spark):
    from proteus_engine_spark.operators.partitioning import widen_if_narrow

    df = spark.range(100).withColumn("k", F.col("id") % 5)
    # non-file plans (range) have no input files: always repartition
    plan = _plan(widen_if_narrow(df, 8, "k"))
    assert "hashpartitioning" in plan and "k#" in plan
    plan = _plan(widen_if_narrow(df, 8))
    assert "REPARTITION_BY_NUM" in plan
