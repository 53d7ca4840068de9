"""Query registry: binds every implemented operator to (a) a runnable
PySpark query and (b) an equivalent DuckDB oracle SQL string.

This is the engine's correctness-gate surface (SURVEY.md §5): the driver
runs each registered query at sf0.01 against the oracle and compares
row-count + schema + order-insensitive value hash. Queries whose semantics
are not SQL-expressible (custom stateful streaming ops, hash-dependent
near-dup) register with ``oracle=None`` and get a rows-only check.

Determinism contract for oracle-checked queries:
- Every computed column is aliased identically in Spark and SQL.
- Floating aggregates are computed in exact DECIMAL arithmetic and cast to
  DOUBLE at the end (order-independent, so hash-stable across engines).
- Top-k cuts are made deterministic with explicit tie-breaks.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
