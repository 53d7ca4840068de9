"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``proteus_engine_spark``; see
``proteus_engine_spark/queries/`` for the registry of implemented
operators (one entry per SURVEY.md §2 line).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver launches from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from proteus_engine_spark.queries import oracles as _oracles  # noqa: E402
from proteus_engine_spark.queries import queries as _queries  # noqa: E402
from proteus_engine_spark.queries.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3, the reference's own example anchor:
    flink-examples-batch/.../relational/TPCHQuery3.java:86) on sf0.001."""
    return REGISTRY["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracles()
