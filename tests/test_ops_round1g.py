"""Batch-7 continuation: bucketed range join + window frame battery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.operators.events import interval_overlap_join
from lime_etl_spark.plans.registry import get
from tests.oracle import assert_query_matches_oracle

SET_G = ["ev_concurrent_sessions", "q_order_value_frames"]


@pytest.mark.parametrize("name", SET_G)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


@pytest.mark.parametrize("name", SET_G)
def test_nonempty(spark, sf_dir, name):
    assert get(name).builder(spark, sf_dir).count() > 0


def test_interval_join_exact_vs_naive(spark):
    """The bucketed range join must return EXACTLY the naive
    overlap-predicate pairs on a synthetic set with awkward interval
    shapes (zero-length, bucket-straddling, long intervals)."""
    rows = [
        (1, 0, 50), (2, 40, 60), (3, 60, 60), (4, 200, 5000),
        (5, 4999, 5001), (6, 10_000, 10_000), (7, 55, 199),
    ]
    df = spark.createDataFrame(rows, "id long, start_us long, end_us long")
    left = df.select(F.col("id").alias("a_id"), F.col("start_us").alias("a_s"), F.col("end_us").alias("a_e"))
    right = df.select(F.col("id").alias("b_id"), F.col("start_us").alias("b_s"), F.col("end_us").alias("b_e"))
    got = interval_overlap_join(
        left, right, "a_s", "a_e", "b_s", "b_e",
        bucket_us=100,
        extra_pred=F.col("l.a_id") < F.col("r.b_id"),
    ).select("a_id", "b_id")
    naive = {
        (a[0], b[0])
        for a in rows for b in rows
        if a[0] < b[0] and a[1] <= b[2] and b[1] <= a[2]
    }
    assert {(r["a_id"], r["b_id"]) for r in got.collect()} == naive


def test_interval_join_is_hash_not_nested_loop(spark):
    """The point of the operator: the plan must be an equi hash join on
    the bucket, not a BroadcastNestedLoopJoin on the raw predicate."""
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") * 1000).alias("start_us"),
        (F.col("id") * 1000 + 500).alias("end_us"),
    )
    left = df.select(F.col("id").alias("a_id"), F.col("start_us").alias("a_s"), F.col("end_us").alias("a_e"))
    right = df.select(F.col("id").alias("b_id"), F.col("start_us").alias("b_s"), F.col("end_us").alias("b_e"))
    joined = interval_overlap_join(left, right, "a_s", "a_e", "b_s", "b_e")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "Join" in plan


def test_concurrent_sessions_has_zero_and_nonzero(spark, sf_dir):
    rows = get("ev_concurrent_sessions").builder(spark, sf_dir).collect()
    assert any(r["n_concurrent"] > 0 for r in rows), "no overlap found at all"
    for r in rows:
        assert r["start_us"] <= r["end_us"]


def test_frames_single_window_exchange(spark, sf_dir):
    """All four frame variants must share one shuffle: a single
    hashpartitioning(o_custkey) in the plan."""
    from tests.test_plan_quality import plan_of

    plan = plan_of(spark, sf_dir, "q_order_value_frames")
    import re

    assert len(re.findall(r"hashpartitioning\(o_custkey", plan)) == 1, plan
