from f1_lakehouse_spark.streaming.ingest import (  # noqa: F401
    run_available_now_to_memory,
    stream_bronze_ingest,
    stream_events,
    streaming_session_windows,
    streaming_windowed_counts,
)
