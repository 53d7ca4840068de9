"""Graph library (SURVEY §2.11 — Gelly's in-tree library re-expressed on
DataFrames + the `operators.iterations` primitive)."""

from proteus_engine_spark.graph.library import (
    degrees,
    jaccard_index,
    label_propagation,
    page_rank,
    triangle_list,
)

__all__ = [
    "degrees",
    "jaccard_index",
    "label_propagation",
    "page_rank",
    "triangle_list",
]
