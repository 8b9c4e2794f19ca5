from sqlpp_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    run_stream_to_memory,
    session_windows,
    stateful_user_counts,
    tumbling_counts,
)
