"""Import all query modules so their @register calls populate REGISTRY."""

from proteus_engine_spark.queries.registry import REGISTRY, oracles, queries

from proteus_engine_spark.queries import (  # noqa: F401
    datapipe_q,
    functions_q,
    relational,
    relational_ext,
    streaming_q,
    temporal_q,
    windows_q,
)

__all__ = ["REGISTRY", "queries", "oracles"]
