"""Join surface with the reference's semantics.

Reference: DataSet.join/leftOuterJoin/rightOuterJoin/fullOuterJoin/
joinWithTiny/joinWithHuge/coGroup/cross
(/root/reference/flink-java/src/main/java/org/apache/flink/api/java/
DataSet.java:751,841,864,895,797,820,1009,1056) and JoinHint
(/root/reference/flink-core/src/main/java/org/apache/flink/api/common/
operators/base/JoinOperatorBase.java:38).

Spark-first mapping: Catalyst already chooses broadcast-hash / shuffle-hash /
sort-merge / nested-loop (the reference's DriverStrategy.java:76–116
enumeration) from statistics + AQE runtime stats, so there is no physical
join implementation here — only semantics + hint plumbing. Semi/anti joins,
which the reference only reaches through IN/EXISTS rewrite, are exposed as
first-class join types (left_semi / left_anti).

Scale notes: hints matter at 100 TB. ``JoinHint.BROADCAST_HASH_SECOND`` on a
dimension table avoids shuffling the 100 TB fact side entirely;
REPARTITION_* hints map to Spark's shuffle-hash/merge hints which AQE can
still override on skew.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class JoinHint(Enum):
    """Parity with org.apache.flink.api.common.operators.base.JoinOperatorBase.JoinHint."""

    OPTIMIZER_CHOOSES = "optimizer_chooses"
    BROADCAST_HASH_FIRST = "broadcast_hash_first"
    BROADCAST_HASH_SECOND = "broadcast_hash_second"
    REPARTITION_HASH_FIRST = "repartition_hash_first"
    REPARTITION_HASH_SECOND = "repartition_hash_second"
    REPARTITION_SORT_MERGE = "repartition_sort_merge"


_JOIN_TYPES = {
    "inner",
    "left",
    "right",
    "full",
    "left_semi",
    "left_anti",
    "cross",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    hint: JoinHint = JoinHint.OPTIMIZER_CHOOSES,
) -> DataFrame:
    """Equi/theta join with a Flink-style physical hint.

    ``joinWithTiny``/``joinWithHuge`` (DataSet.java:797,820) are the
    BROADCAST_HASH_* hints.
    """
    if how not in _JOIN_TYPES:
        raise ValueError(f"unknown join type {how!r}")
    if hint is JoinHint.BROADCAST_HASH_FIRST:
        left = F.broadcast(left)
    elif hint is JoinHint.BROADCAST_HASH_SECOND:
        right = F.broadcast(right)
    elif hint in (JoinHint.REPARTITION_HASH_FIRST, JoinHint.REPARTITION_HASH_SECOND):
        # Spark's SHUFFLE_HASH hint picks the build side by size; attach to
        # the side the caller nominated as the build (hash) side.
        side = left if hint is JoinHint.REPARTITION_HASH_FIRST else right
        if hint is JoinHint.REPARTITION_HASH_FIRST:
            left = side.hint("shuffle_hash")
        else:
            right = side.hint("shuffle_hash")
    elif hint is JoinHint.REPARTITION_SORT_MERGE:
        left = left.hint("merge")
    return left.join(right, on, how)


def join_with_tiny(left: DataFrame, tiny: DataFrame, on, how: str = "inner") -> DataFrame:
    """DataSet.joinWithTiny parity (DataSet.java:797): broadcast the right side."""
    return left.join(F.broadcast(tiny), on, how)


def join_with_huge(tiny: DataFrame, huge: DataFrame, on, how: str = "inner") -> DataFrame:
    """DataSet.joinWithHuge parity (DataSet.java:820): broadcast the left side."""
    return F.broadcast(tiny).join(huge, on, how)


def cross(left: DataFrame, right: DataFrame, broadcast_right: bool = False) -> DataFrame:
    """Cartesian product (DataSet.cross, DataSet.java:1056). ``crossWithTiny``
    → broadcast nested-loop instead of shuffled cartesian."""
    return left.crossJoin(F.broadcast(right) if broadcast_right else right)


def single_row_join(left: DataFrame, single: DataFrame, condition: Column | None = None) -> DataFrame:
    """DataSetSingleRowJoin parity (/root/reference/flink-libraries/flink-table/
    src/main/scala/org/apache/flink/table/plan/nodes/dataset/
    DataSetSingleRowJoin.scala:42): join against a guaranteed-single-row input
    (scalar aggregate) by broadcasting it — no shuffle of the big side."""
    cond = condition if condition is not None else F.lit(True)
    return left.join(F.broadcast(single), cond, "inner")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with manual key salting for skew mitigation.

    A hot key (one that would overwhelm a single shuffle partition at
    100 TB) is spread across ``n_salts`` sub-partitions: the left side gets
    a random salt in [0, n_salts), the right side is replicated once per
    salt value, and the join key becomes (key, salt). The result is
    row-identical to the unsalted join for ``inner``/``left``/``left_semi``/
    ``left_anti`` (right-side rows are replicated, so right/full outer
    would duplicate unmatched right rows — rejected).

    Prefer AQE's skew-join handling (on by default in the engine session)
    when it fires; this operator is for the cases AQE can't split —
    e.g. a skewed aggregation feeding a join, or deliberate two-stage
    aggregation over a hot key.
    """
    if how in ("right", "rightouter", "full", "fullouter", "outer"):
        raise ValueError(f"salted_join does not support how={how!r} (right side is replicated)")
    salts = right.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt__"))
    l = left.withColumn("__salt__", (F.rand(seed=42) * n_salts).cast("int"))
    r = right.crossJoin(F.broadcast(salts))
    joined = l.join(
        r, (l[left_key] == r[right_key]) & (l["__salt__"] == r["__salt__"]), how
    )
    return joined.drop("__salt__")


def co_group(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    func,
    schema,
) -> DataFrame:
    """DataSet.coGroup parity (DataSet.java:1009): per-key grouped two-input
    apply. ``func(key, left_pdf, right_pdf) -> pandas.DataFrame``.

    Spark-first: `groupBy(...).cogroup(...).applyInPandas` — co-partitioned by
    key, Arrow-batched; each side shuffles once on its key, same as the
    reference's repartition-both strategy.
    """
    return (
        left.groupBy(*left_keys)
        .cogroup(right.groupBy(*right_keys))
        .applyInPandas(func, schema=schema)
    )
