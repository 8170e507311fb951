from threat_detection_nosql_spark.streaming.stream_queries import (
    events_stream,
    run_stream_to_table,
    session_windows_per_user,
    sliding_type_counts,
    stateful_user_profiles,
    streaming_anomaly_flags,
    windowed_user_counts,
)

__all__ = [
    "events_stream",
    "run_stream_to_table",
    "session_windows_per_user",
    "sliding_type_counts",
    "stateful_user_profiles",
    "streaming_anomaly_flags",
    "windowed_user_counts",
]
