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


def test_stream_stream_join_matches_batch(spark, event_dir):
    """purchase_attribution_stream (watermarked interval join) must
    produce exactly the pairs the equivalent batch join produces."""
    from lime_etl_spark.streaming import purchase_attribution_stream, run_available_now

    stream = purchase_attribution_stream(
        read_event_stream(spark, event_dir), max_gap="30 minutes", watermark="2 hours"
    )
    got = run_available_now(stream, "attrib_stream", output_mode="append")

    ev = spark.read.parquet(event_dir)
    p = ev.where(F.col("event_type") == "purchase").alias("l")
    c = ev.where(F.col("event_type") == "click").alias("r")
    batch = p.join(
        c,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") <= F.col("l.ts"))
        & (F.col("r.ts") > F.col("l.ts") - F.expr("INTERVAL 30 minutes")),
    ).select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("purchase_ts"),
        F.col("r.event_id").alias("click_id"),
        F.col("r.ts").alias("click_ts"),
    )
    assert len(_canon(batch)) > 0  # corpus actually exercises the join
    assert _canon(got) == _canon(batch)


def test_late_rows_dropped_by_watermark_are_counted(spark, tmp_path):
    """Rows arriving behind the watermark are excluded from stateful
    aggregation AND surfaced in run_with_metrics — the silent-loss
    signal a production pipeline alerts on.

    Two Spark subtleties the layout below accounts for: (1) late-event
    filtering uses the PREVIOUS micro-batch's watermark (eviction uses
    the current one), so the stragglers land two batches after the
    rows that advanced the watermark; (2) the drop counter sits after
    map-side partial aggregation, so N late rows in one group count as
    >=1 dropped partial row, not N."""
    import time

    from lime_etl_spark.streaming import run_with_metrics

    src = str(tmp_path / "late_src")
    cols = ["event_id", "user_id", "event_type", "value", "props", "ts"]
    day1 = datetime.datetime(2026, 1, 1, 12, 0)
    day2 = datetime.datetime(2026, 1, 2, 12, 0)

    def land(rows):
        spark.createDataFrame(rows, cols).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # file source orders batches by modification time

    # batch 0: day2 noon rows -> watermark advances to day2 11:00
    land([(i, i, "view", 1.0, "{}", day2) for i in range(5)])
    # batch 1: more on-time rows (makes day2-11:00 the *previous*
    # watermark that batch 2's late filter applies)
    land([(10 + i, i, "view", 1.0, "{}", day2) for i in range(5)])
    # batch 2: stragglers from day1 -- a full day behind the watermark
    land([(100 + i, i, "view", 1.0, "{}", day1) for i in range(3)])

    stream = windowed_kpis(
        read_event_stream(spark, src, max_files_per_trigger=1),
        window_duration="1 day",
        watermark="1 hour",
    )
    result, metrics = run_with_metrics(stream, "late_kpis", output_mode="update")

    assert metrics["input_rows"] == 13
    assert metrics["micro_batches"] >= 3
    assert metrics["rows_dropped_by_watermark"] >= 1
    # update mode re-emits a window per refinement; the latest (max)
    # count is the window's state. day1 never materialized; day2 = 10.
    rows: dict = {}
    for r in result.collect():
        rows[r["window_start"]] = max(rows.get(r["window_start"], 0), r["n_events"])
    assert rows[datetime.datetime(2026, 1, 2)] == 10
    assert datetime.datetime(2026, 1, 1) not in rows


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """Replayed events (same event_id) landing in LATER micro-batches
    within the watermark horizon must be dropped; first wins."""
    import time

    from lime_etl_spark.streaming import dedup_stream, run_available_now

    src = str(tmp_path / "dup_src")
    cols = ["event_id", "user_id", "event_type", "value", "props", "ts"]
    t = datetime.datetime(2026, 3, 1, 12, 0)

    def land(rows):
        spark.createDataFrame(rows, cols).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    land([(i, i, "view", 1.0, "{}", t) for i in range(5)])
    # batch 2 replays ids 2..4 (same event time) and adds 5..6
    land([(i, i, "view", 99.0, "{}", t) for i in range(2, 7)])

    stream = dedup_stream(
        read_event_stream(spark, src, max_files_per_trigger=1),
        keys=("event_id",),
        watermark="1 hour",
    )
    got = run_available_now(stream, "dedup_stream_out", output_mode="append")
    rows = {r["event_id"]: r["value"] for r in got.collect()}
    assert sorted(rows) == list(range(7))
    # first occurrence won: replayed ids keep the original value
    assert all(rows[i] == 1.0 for i in range(5)) and rows[5] == 99.0


def test_stream_scd2_sink_matches_batch_rebuild(spark, tmp_path):
    """SCD2 maintained incrementally across micro-batches must equal
    the batch scd2 over the full change set — including versions that
    arrive for already-closed keys in later batches."""
    import time

    from lime_etl_spark.operators.etl import scd2
    from lime_etl_spark.streaming import read_event_stream, stream_scd2_sink

    src = str(tmp_path / "scd_src")
    target = str(tmp_path / "scd_target")
    ckpt = str(tmp_path / "scd_ckpt")
    cols = ["event_id", "user_id", "event_type", "value", "props", "ts"]
    t = datetime.datetime(2026, 4, 1, 9, 0)

    def land(rows):
        spark.createDataFrame(rows, cols).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    b1 = [(1, 10, "chg", 1.0, "{}", t),
          (2, 10, "chg", 2.0, "{}", t + datetime.timedelta(hours=1)),
          (3, 20, "chg", 5.0, "{}", t)]
    # batch 2 extends user 10's history and starts user 30
    b2 = [(4, 10, "chg", 3.0, "{}", t + datetime.timedelta(hours=2)),
          (5, 30, "chg", 9.0, "{}", t),
          (3, 20, "chg", 5.0, "{}", t)]  # replayed duplicate
    land(b1)
    land(b2)

    sel = ["user_id", "value", "ts", "event_id"]
    q = stream_scd2_sink(
        read_event_stream(spark, src, max_files_per_trigger=1).select(*sel),
        target, ckpt, keys=["user_id"], tiebreak=["event_id"],
    )
    q.awaitTermination(120)

    got = spark.read.parquet(target)
    allrows = spark.createDataFrame(b1 + b2, cols).dropDuplicates().select(*sel)
    want = scd2(allrows, ["user_id"], F.unix_micros("ts"), ["event_id"])

    def canon(df):
        return sorted(
            (r["user_id"], r["value"], r["effective_from_us"],
             r["effective_to_us"], r["is_current"])
            for r in df.collect()
        )

    assert canon(got) == canon(want)
    # user 10's batch-1 current row was closed by the batch-2 version
    cur = {r["user_id"]: r["value"] for r in got.where("is_current").collect()}
    assert cur == {10: 3.0, 20: 5.0, 30: 9.0}


def test_kafka_option_plumbing(spark):
    """Connector jar absent (like JDBC): validate the option builder
    and that the load path fails at data-source lookup, not before."""
    from lime_etl_spark.streaming import kafka_reader_options, read_kafka_stream

    opts = kafka_reader_options(
        "b1:9092,b2:9092", "events", max_offsets_per_trigger=100_000
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "events"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["failOnDataLoss"] == "false"

    with pytest.raises(ValueError, match="required"):
        kafka_reader_options("", "events")
    with pytest.raises(ValueError, match="positive"):
        kafka_reader_options("b:9092", "t", max_offsets_per_trigger=0)

    try:
        df = read_kafka_stream(spark, "b1:9092", "events")
    except Exception as e:
        assert "kafka" in str(e).lower()  # DATA_SOURCE_NOT_FOUND
    else:  # connector present: projection must expose the event schema
        assert "event_id" in df.columns and "kafka_ts" in df.columns


def test_compaction_trigger_gates_and_compacts(spark, tmp_path):
    """CompactionTrigger: file-count gate, rate gate, and the actual
    rewrite — many tiny appended files collapse to ~1; an immediate
    re-check is rate-limited; data survives byte-for-byte."""
    from lime_etl_spark.operators.maintenance import parquet_file_count
    from lime_etl_spark.streaming.pipeline import CompactionTrigger

    sink = str(tmp_path / "sink")
    for i in range(8):
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode("append").parquet(sink)
    assert parquet_file_count(sink) >= 8

    # below the file-count gate -> not due
    trig = CompactionTrigger(sink, max_files=100, min_interval_s=0.0)
    assert trig.maybe_compact(spark) is False

    trig = CompactionTrigger(sink, max_files=4, min_interval_s=3600.0)
    assert trig.maybe_compact(spark) is True
    assert parquet_file_count(sink) <= 4
    assert spark.read.parquet(sink).count() == 80

    # regrow the small files: due again by count, but rate-limited
    for i in range(8):
        spark.range(i).coalesce(1).write.mode("append").parquet(sink)
    assert trig.maybe_compact(spark) is False
    trig.min_interval_s = 0.0
    assert trig.maybe_compact(spark) is True
    assert trig.compactions == 2


def test_with_compaction_wraps_foreach_batch(spark, tmp_path):
    """with_compaction runs the wrapped process first, then the
    rate-limited compaction against the freshly-appended sink."""
    from lime_etl_spark.streaming.pipeline import CompactionTrigger, with_compaction

    sink = str(tmp_path / "sink2")

    def process(batch_df, batch_id):
        batch_df.coalesce(1).write.mode("append").parquet(sink)

    trig = CompactionTrigger(sink, max_files=2, min_interval_s=0.0)
    wrapped = with_compaction(process, trig)
    for b in range(5):
        wrapped(spark.range(b * 5, (b + 1) * 5), b)
    assert trig.compactions >= 1
    assert spark.read.parquet(sink).count() == 25


def test_stream_static_enrichment_matches_batch(spark, event_dir):
    """Stream-static join: per-micro-batch lookup against a static dim
    must produce exactly the batch join of the same inputs, and the
    join builds no streaming state (stateless operator)."""
    from lime_etl_spark.streaming.pipeline import enrich_with_static

    # static dim derived once: per-user first-seen event type
    dim = (
        spark.read.parquet(event_dir)
        .groupBy("user_id")
        .agg(F.min("event_type").alias("first_type"))
    )
    enriched = enrich_with_static(
        read_event_stream(spark, event_dir), dim, on="user_id"
    ).select("event_id", "user_id", "first_type")
    got = run_available_now(enriched, "enriched_stream", output_mode="append")

    want = (
        spark.read.parquet(event_dir)
        .join(dim, "user_id")
        .select("event_id", "user_id", "first_type")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_near_dup_matches_batch_lsh(spark, sf_dir, tmp_path):
    """Incremental LSH across micro-batches must find exactly the
    pairs the batch pipeline finds on the union corpus — including
    the planted duplicates that are CROSS-batch by construction
    (originals land in batch 1, their copies in batch 2)."""
    import time

    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )
    from lime_etl_spark.streaming import stream_near_dup_sink

    src = str(tmp_path / "docs_src")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    docs.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes so file order is deterministic
    copies.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_near_dup_sink(
        stream,
        index_path=str(tmp_path / "nd_index"),
        pairs_path=str(tmp_path / "nd_pairs"),
        checkpoint_path=str(tmp_path / "nd_ckpt"),
    )
    q.awaitTermination(180)

    got = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in spark.read.parquet(str(tmp_path / "nd_pairs"))
        .dropDuplicates()
        .collect()
    }
    corpus = docs.unionByName(copies)
    sh = doc_shingles(corpus).persist()
    want = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .collect()
    }
    sh.unpersist()
    assert got == want
    # the planted copies are cross-batch: they MUST appear
    assert any(b - a == 1000000 for a, b, _ in got)


def test_stream_embedding_near_dup_matches_batch_banded(spark, sf_dir, tmp_path):
    """The dense-vector twin of the LSH stream test: incremental
    sign-band probing across micro-batches must find exactly the
    pairs the batch banded operator finds on the union corpus —
    including planted near-identical copies that are CROSS-batch by
    construction (originals in batch 1, copies in batch 2)."""
    import time

    from lime_etl_spark.operators.dedup import embedding_near_dup_pairs
    from lime_etl_spark.streaming import stream_embedding_near_dup_sink

    src = str(tmp_path / "vec_src")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    # exact copies of every 20th vector under new ids → cosine 1.0
    # pairs that straddle the batch boundary
    copies = emb.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "label", "embedding"
    )
    emb.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes so file order is deterministic
    copies.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("vec_id bigint, label int, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_embedding_near_dup_sink(
        stream,
        index_path=str(tmp_path / "end_index"),
        pairs_path=str(tmp_path / "end_pairs"),
        checkpoint_path=str(tmp_path / "end_ckpt"),
    )
    q.awaitTermination(180)

    got = {
        (r["vec_a"], r["vec_b"], round(r["cosine"], 9))
        for r in spark.read.parquet(str(tmp_path / "end_pairs"))
        .dropDuplicates()
        .collect()
    }
    want = {
        (r["vec_a"], r["vec_b"], round(r["cosine"], 9))
        for r in embedding_near_dup_pairs(emb.unionByName(copies)).collect()
    }
    assert got == want
    # the planted copies are cross-batch: they MUST appear, at cos≈1
    planted = {(a, b) for a, b, c in got if b - a == 1000000 and c > 0.999999}
    assert planted, "cross-batch exact copies not detected"


def test_streaming_observed_metrics_surface_in_progress(spark, event_dir):
    """df.observe on a STREAM: per-micro-batch DQ counters ride the
    StreamingQueryProgress (observedMetrics), so in-flight telemetry
    needs no second pass in streaming either — the stream twin of
    maintenance.observe_dq. The observed totals across batches must
    equal the batch-mode audit."""
    stream = read_event_stream(spark, event_dir, max_files_per_trigger=2)
    observed = stream.observe(
        "dq",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("n_negative"),
    )
    seen: list = []

    def sink(batch_df, batch_id):
        batch_df.count()

    q = (
        observed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", event_dir + "_obs_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for p in q.recentProgress:
        om = p["observedMetrics"] if isinstance(p, dict) else p.observedMetrics
        if om and "dq" in om:
            row = om["dq"]
            seen.append((row["n_rows"], row["n_negative"]))
    total_rows = sum(r for r, _ in seen)
    total_neg = sum(n for _, n in seen)
    # event_dir is the sf fixture's events re-landed; compare to its count
    expected = spark.read.parquet(event_dir).count()
    assert total_rows == expected
    assert total_neg == 0
    assert len(seen) >= 2  # rate limit forced multiple micro-batches
