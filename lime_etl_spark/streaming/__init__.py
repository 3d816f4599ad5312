from lime_etl_spark.streaming.pipeline import (
    read_event_stream,
    run_available_now,
    sessionize_stream,
    stream_upsert_sink,
    windowed_kpis,
)
from lime_etl_spark.streaming.stateful import running_user_totals

__all__ = [
    "read_event_stream",
    "run_available_now",
    "running_user_totals",
    "sessionize_stream",
    "stream_upsert_sink",
    "windowed_kpis",
]
