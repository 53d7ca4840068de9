from proteus_engine_spark.operators.joins import JoinHint, co_group, cross, join, single_row_join
from proteus_engine_spark.operators.aggregates import (
    agg_with_combiner_note,
    grouping_sets,
    max_by,
    min_by,
    sum0,
)
from proteus_engine_spark.operators.setops import (
    intersect,
    intersect_all,
    minus,
    minus_all,
    union,
    union_all,
)
from proteus_engine_spark.operators.sort import first_n, offset_fetch, sort_partition, top_k_per_group
from proteus_engine_spark.operators.windows import hop, over, session, tumble

__all__ = [
    "JoinHint",
    "join",
    "co_group",
    "cross",
    "single_row_join",
    "sum0",
    "min_by",
    "max_by",
    "grouping_sets",
    "agg_with_combiner_note",
    "union",
    "union_all",
    "intersect",
    "intersect_all",
    "minus",
    "minus_all",
    "first_n",
    "offset_fetch",
    "top_k_per_group",
    "sort_partition",
    "tumble",
    "hop",
    "session",
    "over",
]
