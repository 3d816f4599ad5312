"""Batch-3 continuation operators (embedding health, conversion
latency, join-skew profile) vs DuckDB oracle at sf0.001 + invariants."""

from __future__ import annotations

import pytest

from lime_etl_spark.plans.registry import get
from tests.oracle import assert_query_matches_oracle

SET_D = [
    "emb_dim_stats",
    "emb_norm_audit",
    "ev_purchase_latency",
    "dq_join_skew",
]


@pytest.mark.parametrize("name", SET_D)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


@pytest.mark.parametrize("name", SET_D)
def test_nonempty(spark, sf_dir, name):
    assert get(name).builder(spark, sf_dir).count() > 0


def test_dim_stats_cover_every_dimension(spark, sf_dir):
    rows = get("emb_dim_stats").builder(spark, sf_dir).collect()
    assert {r["pos"] for r in rows} == set(range(1, 65))
    n = rows[0]["n_vals"]
    assert all(r["n_vals"] == n for r in rows), "ragged embedding arrays"
    assert all(r["min_v"] <= r["max_v"] for r in rows)


def test_norm_audit_bounds(spark, sf_dir):
    for r in get("emb_norm_audit").builder(spark, sf_dir).collect():
        assert 0.0 <= r["min_sq_norm"] <= r["max_sq_norm"]
        assert r["n_zero_vecs"] + r["n_off_unit"] <= 2 * r["n_vecs"]


def test_purchase_latency_buckets_monotone(spark, sf_dir):
    r = get("ev_purchase_latency").builder(spark, sf_dir).collect()[0]
    assert r["n_converted"] > 0
    assert 0 <= r["min_latency_us"] <= r["p50_latency_us"] <= r["max_latency_us"]
    assert r["n_lt_1h"] <= r["n_lt_1d"] <= r["n_lt_7d"] <= r["n_converted"]


def test_join_skew_internal_consistency(spark, sf_dir):
    rows = get("dq_join_skew").builder(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_keys"] <= r["n_rows"]
        assert r["max_key_rows"] >= r["avg_key_rows"]
        assert r["skew_ratio"] >= 1.0
