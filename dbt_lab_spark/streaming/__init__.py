from dbt_lab_spark.streaming.windows import (
    tumbling_window_agg,
    sliding_window_agg,
    session_window_agg,
    read_events_stream,
    run_stream_to_memory,
)
from dbt_lab_spark.streaming.stateful import stateful_sessionize

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "read_events_stream",
    "run_stream_to_memory",
    "stateful_sessionize",
]
