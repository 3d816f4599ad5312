"""Batch-5 continuation: attribution touches, backfill planner,
compression-ratio Pandas UDF, streaming DQ circuit breaker."""

from __future__ import annotations

import os
import zlib

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.plans.registry import get
from lime_etl_spark.sources.readers import load_table
from lime_etl_spark.streaming import (
    DqGateResult,
    read_event_stream,
    with_dq_gate,
)
from tests.oracle import assert_query_matches_oracle

SET_E = ["ev_attribution_touches", "etl_backfill_plan"]


@pytest.mark.parametrize("name", SET_E)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


@pytest.mark.parametrize("name", SET_E + ["txt_compression_ratio"])
def test_nonempty(spark, sf_dir, name):
    assert get(name).builder(spark, sf_dir).count() > 0


def test_attribution_touch_structure(spark, sf_dir):
    rows = get("ev_attribution_touches").builder(spark, sf_dir).collect()
    for r in rows:
        assert r["n_touches"] >= 1
        assert r["first_touch_us"] <= r["last_touch_us"]


def test_backfill_plan_finds_exactly_the_gap_days(spark, sf_dir):
    """The simulated checkpoint drops day-of-month % 7 == 0; the plan
    must return exactly those days within the table's bounds."""
    rows = get("etl_backfill_plan").builder(spark, sf_dir).collect()
    assert rows
    assert all(r["missing_day"].day % 7 == 0 for r in rows)


def test_compression_ratio_matches_direct_zlib(spark, sf_dir):
    """The Arrow-batched UDF must agree byte-for-byte with direct
    python zlib over the same rows (the rows-only oracle)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    expect: dict[str, list[int]] = {}
    for r in docs:
        e = expect.setdefault(r["source"], [0, 0, 0])
        e[0] += 1
        e[1] += len(r["text"])
        e[2] += len(zlib.compress(r["text"].encode("utf-8"), 6))
    got = get("txt_compression_ratio").builder(spark, sf_dir).collect()
    for r in got:
        n, chars, comp = expect[r["source"]]
        assert (r["n_docs"], r["total_chars"], r["total_compressed"]) == (n, chars, comp)
        assert 0.0 < r["compression_ratio"] < 1.0


def test_compression_udf_is_arrow_batched(spark, sf_dir):
    from tests.test_plan_quality import plan_of

    plan = plan_of(spark, sf_dir, "txt_compression_ratio")
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_dq_gate_quarantines_bad_batches(spark, sf_dir, tmp_path):
    """Stream the events directory through a gated sink that rejects
    batches where the poisoned column is ever null: poisoned files are
    quarantined whole, clean files reach the sink, nothing is lost."""
    src = str(tmp_path / "src")
    ev = load_table(spark, sf_dir, "events")
    # file 0: clean; file 1: every props NULL (the poison batch)
    ev.limit(200).coalesce(1).write.parquet(src)
    ev.limit(100).withColumn("props", F.lit(None).cast("string")).coalesce(
        1
    ).write.mode("append").parquet(src)

    applied: list[int] = []
    out = str(tmp_path / "out")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)
        applied.append(batch_df.count())

    ledger = DqGateResult()
    gated = with_dq_gate(
        sink,
        check_cols=["props"],
        quarantine_path=str(tmp_path / "quarantine"),
        max_null_rate=0.0,
        ledger=ledger,
    )
    q = (
        read_event_stream(spark, src, max_files_per_trigger=1)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(gated)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert any(v["passed"] for v in ledger.values())
    assert any(not v["passed"] for v in ledger.values())
    # clean rows reached the sink
    assert sum(applied) == 200
    # poisoned rows are parked, not dropped
    qdirs = os.listdir(str(tmp_path / "quarantine"))
    assert qdirs
    quarantined = spark.read.parquet(str(tmp_path / "quarantine")).count()
    assert quarantined == 100
