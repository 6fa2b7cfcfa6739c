from data_services_spark.streaming.events import (
    read_event_stream, stream_tumbling_counts, stream_session_counts,
    stream_dedup, run_to_memory_sink,
)

__all__ = [
    "read_event_stream", "stream_tumbling_counts", "stream_session_counts",
    "stream_dedup", "run_to_memory_sink",
]
