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


def test_cusum_alarm_stream_single_batch_replays_batch_walk(spark, sf_dir, tmp_path):
    """One micro-batch covering all files: the in-batch (ts, event_id)
    sort makes the stream walk identical to a pure-pandas CUSUM replay
    — final S+/S-, alarm flag and crossing index must match exactly."""
    import pandas as pd

    from lime_etl_spark.streaming.stateful import cusum_alarm_stream

    src = str(tmp_path / "events")
    load_table(spark, sf_dir, "events").write.parquet(src)
    ref_cents, alarm_cents = 3500, 100_000

    stream = cusum_alarm_stream(
        read_event_stream(spark, src), ref_cents=ref_cents, alarm_cents=alarm_cents
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cusum_single")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_type"]: r
        for r in spark.table("cusum_single")
        .groupBy("event_type")
        .agg(
            F.max("n_obs").alias("n_obs"),
            F.max_by("s_pos_cents", "n_obs").alias("s_pos_cents"),
            F.max_by("s_neg_cents", "n_obs").alias("s_neg_cents"),
            F.max_by("alarmed", "n_obs").alias("alarmed"),
            F.max_by("alarm_n_obs", "n_obs").alias("alarm_n_obs"),
        )
        .collect()
    }

    ev = pd.read_parquet(src).sort_values(["ts", "event_id"])
    for etype, g in ev.groupby("event_type"):
        n = sp = sn = alarm_n = 0
        for v in g["value"]:
            n += 1
            c = int(round(float(v) * 100))
            sp = max(0, sp + c - ref_cents)
            sn = min(0, sn + c - ref_cents)
            if alarm_n == 0 and (sp > alarm_cents or -sn > alarm_cents):
                alarm_n = n
        r = got[etype]
        assert r["n_obs"] == n
        assert r["s_pos_cents"] == sp and r["s_neg_cents"] == sn
        assert r["alarmed"] == (alarm_n > 0)
        assert (r["alarm_n_obs"] or 0) == alarm_n


def test_cusum_alarm_latches_across_micro_batches(spark, tmp_path):
    """Order-invariant planted keys across SEVERAL micro-batches: a key
    whose every observation sits above ref accumulates S+ = Σ(x−ref)
    regardless of arrival order (alarm latches at a deterministic
    index), and an all-below key keeps S+ = 0 with the mirrored S-."""
    import datetime as dt

    from lime_etl_spark.streaming.stateful import cusum_alarm_stream

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(90):
        rows.append((i + 1, t0 + dt.timedelta(minutes=i), 1, "hot", 45.0, "{}"))
        rows.append((1000 + i, t0 + dt.timedelta(minutes=i), 2, "cold", 25.0, "{}"))
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).repartition(3).write.parquet(src)

    stream = cusum_alarm_stream(
        read_event_stream(spark, src, max_files_per_trigger=1),
        ref_cents=3500,
        alarm_cents=50_000,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cusum_multi")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("cusum_multi")
    # state persisted across micro-batches
    assert out.groupBy("event_type").count().where("count > 1").count() > 0
    final = {
        r["event_type"]: r
        for r in out.groupBy("event_type")
        .agg(
            F.max("n_obs").alias("n_obs"),
            F.max_by("s_pos_cents", "n_obs").alias("s_pos_cents"),
            F.max_by("s_neg_cents", "n_obs").alias("s_neg_cents"),
            F.max_by("alarm_n_obs", "n_obs").alias("alarm_n_obs"),
        )
        .collect()
    }
    # hot: +1000 cents per obs -> alarm strictly after 50 obs, latched at 51
    assert final["hot"]["n_obs"] == 90
    assert final["hot"]["s_pos_cents"] == 90 * 1000
    assert final["hot"]["alarm_n_obs"] == 51
    # cold: -1000 per obs -> S+ pinned at 0, S- runs negative, alarms at 51
    assert final["cold"]["s_pos_cents"] == 0
    assert final["cold"]["s_neg_cents"] == -90 * 1000
    assert final["cold"]["alarm_n_obs"] == 51


def test_cusum_prefix_form_equals_sequential_recursion():
    """_cusum_advance's vectorized prefix form is bit-identical to
    Page's sequential recursion, including seed carry-over, alarm
    latching mid-batch, and multi-batch splits at every cut point."""
    import hashlib

    import numpy as np

    from lime_etl_spark.streaming.stateful import _cusum_advance

    def seq(d, n, sp, sn, alarm_n, alarm):
        for c in d:
            n += 1
            sp = max(0, sp + int(c))
            sn = min(0, sn + int(c))
            if alarm_n == 0 and (sp > alarm or -sn > alarm):
                alarm_n = n
        return n, sp, sn, alarm_n

    # deterministic adversarial sequences: md5-derived swings around 0
    for seed_ix, alarm in ((0, 50), (1, 5), (2, 10_000)):
        d = np.array(
            [
                int.from_bytes(
                    hashlib.md5(f"{seed_ix}:{i}".encode()).digest()[:2], "big"
                )
                % 41
                - 20
                for i in range(200)
            ],
            dtype=np.int64,
        )
        want = seq(d, 0, 0, 0, 0, alarm)
        # whole batch at once
        assert _cusum_advance(d, 0, 0, 0, 0, alarm) == want
        # split into two batches at several cut points (state carry)
        for cut in (1, 7, 50, 199):
            st = _cusum_advance(d[:cut], 0, 0, 0, 0, alarm)
            assert _cusum_advance(d[cut:], *st, alarm) == want
    # empty batch is a no-op
    assert _cusum_advance(np.array([], dtype=np.int64), 3, 9, -4, 2, 10) == (
        3,
        9,
        -4,
        2,
    )


def test_sprt_gate_stream_single_batch_replays_batch_op(spark, sf_dir, tmp_path):
    """One micro-batch covering all files: the stream's final per-type
    row must equal the batch ev_sprt_gate exactly — same int64 LLR,
    same latched decision and crossing index."""
    from lime_etl_spark.operators.insights6 import (
        SPRT_CUT,
        SPRT_INC_NEG_E6,
        SPRT_INC_POS_E6,
        SPRT_LOWER_E6,
        SPRT_UPPER_E6,
        ev_sprt_gate,
    )
    from lime_etl_spark.streaming.stateful import sprt_gate_stream

    src = str(tmp_path / "events")
    load_table(spark, sf_dir, "events").write.parquet(src)
    stream = sprt_gate_stream(
        read_event_stream(spark, src),
        cut=SPRT_CUT,
        inc_pos_e6=SPRT_INC_POS_E6,
        inc_neg_e6=SPRT_INC_NEG_E6,
        upper_e6=SPRT_UPPER_E6,
        lower_e6=SPRT_LOWER_E6,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sprt_single")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_type"]: r
        for r in spark.table("sprt_single")
        .groupBy("event_type")
        .agg(
            F.max("n_obs").alias("n_obs"),
            F.max_by("llr_e6", "n_obs").alias("llr_e6"),
            F.max_by("decision", "n_obs").alias("decision"),
            F.max_by("n_at_decision", "n_obs").alias("n_at_decision"),
        )
        .collect()
    }
    want = {r["event_type"]: r for r in ev_sprt_gate(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for et, w in want.items():
        g = got[et]
        assert g["n_obs"] == w["total_obs"]
        assert g["llr_e6"] == w["final_llr_e6"]
        assert g["decision"] == w["decision"]
        if w["decision"] == "continue":
            assert g["n_at_decision"] is None
        else:
            assert g["n_at_decision"] == w["n_at_decision"]


def test_sprt_gate_stream_latches_across_micro_batches(spark, tmp_path):
    """A planted always-above-cut key crosses the upper boundary at a
    deterministic index and the decision must latch (stay accept_h1
    with the same n_at_decision) across subsequent micro-batches."""
    import datetime as dt
    import math

    from lime_etl_spark.streaming.stateful import sprt_gate_stream

    inc_pos = math.floor(math.log(0.40 / 0.35) * 1_000_000)
    inc_neg = math.floor(math.log(0.60 / 0.65) * 1_000_000)
    upper = math.floor(math.log(0.95 / 0.05) * 1_000_000)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(60):
        rows.append((i + 1, t0 + dt.timedelta(minutes=i), 1, "hot", 99.0, "{}"))
        rows.append((1000 + i, t0 + dt.timedelta(minutes=i), 2, "cold", 1.0, "{}"))
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).repartition(3).write.parquet(src)
    stream = sprt_gate_stream(
        read_event_stream(spark, src, max_files_per_trigger=1),
        cut=50.0,
        inc_pos_e6=inc_pos,
        inc_neg_e6=inc_neg,
        upper_e6=upper,
        lower_e6=-upper,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sprt_multi")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("sprt_multi").collect()
    assert len([r for r in out if r["event_type"] == "hot"]) > 1  # several batches
    expected_cross = -(-upper // inc_pos)  # ceil: first n with n*inc_pos >= upper
    hot = [r for r in out if r["event_type"] == "hot" and r["decision"] == "accept_h1"]
    assert hot, "hot key never crossed"
    assert {r["n_at_decision"] for r in hot} == {expected_cross}  # latched, stable
    cold_final = max(
        (r for r in out if r["event_type"] == "cold"), key=lambda r: r["n_obs"]
    )
    assert cold_final["decision"] == "accept_h0"
