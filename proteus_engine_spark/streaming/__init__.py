"""Streaming surface (SURVEY §2.9): Structured Streaming equivalents of the
reference's DataStream API — sources, watermarks, windowed aggregates,
stream-static side inputs (the PROTEUS delta), interval joins, stateful
operators (count windows, process-function-with-timers), and a CEP subset.
"""

from proteus_engine_spark.streaming.sources import events_stream, rate_stream
from proteus_engine_spark.streaming.side_inputs import (
    broadcast_side_input,
    forwarded_side_input,
    keyed_side_input,
)
from proteus_engine_spark.streaming.windows import (
    interval_join,
    windowed_agg,
)
from proteus_engine_spark.streaming.stateful import count_window_agg, process_keyed

__all__ = [
    "events_stream",
    "rate_stream",
    "broadcast_side_input",
    "keyed_side_input",
    "forwarded_side_input",
    "windowed_agg",
    "interval_join",
    "count_window_agg",
    "process_keyed",
]
