from lime_etl_spark.streaming.pipeline import (
    read_event_stream,
    run_available_now,
    sessionize_stream,
    stream_upsert_sink,
    windowed_kpis,
)

__all__ = [
    "read_event_stream",
    "run_available_now",
    "sessionize_stream",
    "stream_upsert_sink",
    "windowed_kpis",
]
