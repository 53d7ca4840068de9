"""Import all query modules so their @register calls populate REGISTRY."""

from proteus_engine_spark.queries.registry import REGISTRY, oracles, queries

from proteus_engine_spark.queries import datapipe_q, functions_q, relational, windows_q  # noqa: F401

__all__ = ["REGISTRY", "queries", "oracles"]
