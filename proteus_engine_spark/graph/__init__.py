"""Graph library (SURVEY §2.11 — Gelly's in-tree library re-expressed on
DataFrames + the `operators.iterations` primitive)."""

from proteus_engine_spark.graph.spargel import gather_sum_apply, pregel, scatter_gather, sssp
from proteus_engine_spark.graph.library import (
    adamic_adar,
    community_detection,
    degrees,
    global_clustering_coefficient,
    hits,
    jaccard_index,
    label_propagation,
    local_clustering_coefficient,
    page_rank,
    summarize,
    triadic_census,
    triangle_list,
    vertex_metrics,
)

__all__ = [
    "adamic_adar",
    "community_detection",
    "degrees",
    "gather_sum_apply",
    "global_clustering_coefficient",
    "hits",
    "jaccard_index",
    "label_propagation",
    "local_clustering_coefficient",
    "page_rank",
    "pregel",
    "summarize",
    "scatter_gather",
    "sssp",
    "triadic_census",
    "triangle_list",
    "vertex_metrics",
]
