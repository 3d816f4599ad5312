from lime_etl_spark.streaming.pipeline import (
    dedup_stream,
    interval_join_streams,
    kafka_reader_options,
    purchase_attribution_stream,
    read_event_stream,
    read_kafka_stream,
    run_available_now,
    run_with_metrics,
    sessionize_stream,
    stream_scd2_sink,
    stream_upsert_sink,
    StreamRunMetrics,
    windowed_kpis,
)
from lime_etl_spark.streaming.stateful import running_user_totals

__all__ = [
    "StreamRunMetrics",
    "dedup_stream",
    "interval_join_streams",
    "kafka_reader_options",
    "purchase_attribution_stream",
    "read_event_stream",
    "read_kafka_stream",
    "run_available_now",
    "run_with_metrics",
    "running_user_totals",
    "sessionize_stream",
    "stream_scd2_sink",
    "stream_upsert_sink",
    "windowed_kpis",
]
