from dbt_lab_spark.streaming.windows import (
    tumbling_window_agg,
    sliding_window_agg,
    session_window_agg,
    read_events_stream,
    run_stream_to_memory,
    streaming_dedup,
    stream_stream_interval_join,
)
from dbt_lab_spark.streaming.stateful import (
    stateful_sessionize,
    stateful_sessionize_event_time,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "read_events_stream",
    "run_stream_to_memory",
    "streaming_dedup",
    "stream_stream_interval_join",
    "stateful_sessionize",
    "stateful_sessionize_event_time",
]
