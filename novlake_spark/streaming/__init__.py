from novlake_spark.streaming.events import (
    events_stream,
    run_available_now,
    stream_dedup,
    stream_session_counts,
    stream_tumbling,
    stream_user_counts,
)

__all__ = [
    "events_stream",
    "run_available_now",
    "stream_dedup",
    "stream_session_counts",
    "stream_tumbling",
    "stream_user_counts",
]
