"""Structured Streaming tests: the stream operators must agree with
the equivalent batch computation over the same files (stream/batch
unification is the point of Structured Streaming)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.sources.readers import load_table
from lime_etl_spark.streaming import (
    read_event_stream,
    run_available_now,
    sessionize_stream,
    stream_upsert_sink,
    windowed_kpis,
)


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    """The driver's events table re-landed as a 4-file directory, the
    shape a streaming file source consumes."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(path)
    return path


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_windowed_kpis_match_batch(spark, event_dir):
    stream = windowed_kpis(read_event_stream(spark, event_dir), "1 day")
    got = run_available_now(stream, "kpis_stream", output_mode="complete")

    # same declarative agg applied as a plain batch query
    batch = (
        spark.read.parquet(event_dir)
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "approx_users",
            "total_value",
            "n_purchases",
        )
    )
    assert _canon(got) == _canon(batch)
    assert got.count() > 0


def test_sessionize_stream_matches_batch_session_window(spark, event_dir):
    stream = sessionize_stream(read_event_stream(spark, event_dir), gap="30 minutes")
    got = run_available_now(stream, "sessions_stream", output_mode="complete")

    batch = (
        spark.read.parquet(event_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("sess"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            "n_events",
            "session_start",
            "session_end",
            F.col("sess.start").alias("window_start"),
            F.col("sess.end").alias("window_end"),
        )
    )
    assert _canon(got) == _canon(batch)


def test_stream_upsert_sink_latest_wins(spark, tmp_path):
    src = tmp_path / "src"
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime.datetime(2026, 1, 1)

    def mk_rows(keys, version):
        return [
            (k, k, "click", float(version), "{}", t0 + datetime.timedelta(minutes=k))
            for k in keys
        ]

    cols = ["event_id", "user_id", "event_type", "value", "props", "ts"]
    spark.createDataFrame(mk_rows(range(1, 11), 1), cols).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    def run_once():
        q = stream_upsert_sink(
            read_event_stream(spark, str(src)), target, ckpt, keys=["event_id"]
        )
        q.awaitTermination(120)

    run_once()
    first = {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()}
    assert first == {k: 1.0 for k in range(1, 11)}

    # a later file updates keys 5..15; only the new file is processed
    spark.createDataFrame(mk_rows(range(5, 16), 2), cols).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()
    second = {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()}
    assert second == {**{k: 1.0 for k in range(1, 5)}, **{k: 2.0 for k in range(5, 16)}}

    # replay with no new files: checkpoint makes it a no-op
    run_once()
    third = {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()}
    assert third == second
