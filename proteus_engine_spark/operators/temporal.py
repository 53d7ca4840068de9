"""Temporal joins beyond plain equi-joins: as-of join and range join.

The reference has no as-of join operator (its closest is the stream
interval join, DataStreamWindowJoin.scala:45); these are the
training-pipeline extensions (point-in-time feature lookup, event
alignment) built per the public Spark patterns:

- as_of_join: per-key "latest right row at or before left.ts".
  Implementation is the union-tag trick — all built-in, one shuffle:
  union both sides tagged, window last(right_value, ignorenulls) over
  (key ORDER BY ts, tag) gives each left row the most recent right row ≤
  its timestamp. No per-group pandas, no driver loop; scales as a single
  sort-shuffle like any window op, and AQE handles key skew.
- range_join: equi-key + time-band condition; on batch Spark plans the
  band as a post-join filter of the key join (fine when keys are
  selective); the streaming variant is streaming.windows.interval_join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right.ts <= left.ts (within `tolerance` if given), per key.

    pd.merge_asof semantics (backward direction), distributed: one shuffle
    on key, one window sort — the same cost as a single OVER query.
    """
    lcols = left.columns
    l = left.withColumn("__tag__", F.lit(1)).withColumn("__ts__", F.col(left_ts))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__tag__"),
        *[F.col(c) for c in right_vals],
    )
    # align schemas: left gets null right_vals; right gets null left cols
    for c in right_vals:
        l = l.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    for c in lcols:
        if c not in {key}:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l.select(key, "__ts__", "__tag__", *[c for c in lcols if c != key], *right_vals).unionByName(
        r.select(key, "__ts__", "__tag__", *[c for c in lcols if c != key], *right_vals)
    )
    # right rows (tag 0) sort before left rows at equal ts → "at or before"
    w = Window.partitionBy(key).orderBy("__ts__", "__tag__").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = unioned.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"__asof_{c}") for c in right_vals],
        F.last(F.when(F.col("__tag__") == 0, F.col("__ts__")), ignorenulls=True)
        .over(w)
        .alias("__asof_ts__"),
    )
    out = filled.filter(F.col("__tag__") == 1)
    if tolerance is not None:
        within = F.col("__asof_ts__") >= F.col("__ts__") - F.expr(f"INTERVAL {tolerance}")
        sel = [F.when(within, F.col(f"__asof_{c}")).alias(c) for c in right_vals]
    else:
        sel = [F.col(f"__asof_{c}").alias(c) for c in right_vals]
    return out.select(*[F.col(c) for c in lcols], *sel)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cond: Column,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
) -> DataFrame:
    """Batch time-band join: right.ts ∈ [left.ts - lower, left.ts + upper].
    Equi-key condition keeps it a hash join with a band residual."""
    cond = (
        key_cond
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond, "inner")
