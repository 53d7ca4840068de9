"""Rich* function context parity (SURVEY §2.10).

Reference: RichFunction.open/close + RuntimeContext
(flink-core/.../api/common/functions/RichFunction.java:57,
RuntimeContext.java — getBroadcastVariable :183, accumulators :120,
LongCounter/IntCounter/DoubleCounter/Histogram).

Spark-first: broadcast variables ARE spark.sparkContext.broadcast (same
torrent distribution job-side), accumulators ARE Spark accumulators (same
driver-merged counters). This module packages them in the reference's
shape so a Rich-style UDF body ports mechanically: `open` corresponds to
closure/broadcast capture at definition time, `close` to nothing (Arrow
batches hold no per-task resources a Python UDF must release).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession


class RuntimeContext:
    """The subset of the reference RuntimeContext a function body uses:
    named broadcast variables and named accumulator counters. Instances
    are picklable into UDF closures (broadcast handles and accumulators
    both serialize by design)."""

    def __init__(self) -> None:
        self._broadcasts: dict[str, Any] = {}
        self._counters: dict[str, Any] = {}

    # getBroadcastVariable (RuntimeContext.java:183)
    def broadcast_variable(self, name: str):
        return self._broadcasts[name].value

    # getLongCounter / getDoubleCounter (RuntimeContext.java:120)
    def counter(self, name: str):
        return self._counters[name]


def runtime_context(
    spark: SparkSession,
    broadcasts: dict[str, Any] | None = None,
    counters: list[str] | None = None,
) -> RuntimeContext:
    """Build a RuntimeContext: each entry in `broadcasts` is torrent-
    broadcast once (withBroadcastSet parity, DataSet.java via
    Operator.withBroadcastSet); each name in `counters` becomes a
    zero-initialized Spark accumulator readable on the driver via
    `ctx.counter(name).value` after an action."""
    sc = spark.sparkContext
    ctx = RuntimeContext()
    for name, value in (broadcasts or {}).items():
        ctx._broadcasts[name] = sc.broadcast(value)
    for name in counters or []:
        ctx._counters[name] = sc.accumulator(0)
    return ctx
