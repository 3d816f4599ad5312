"""Profiling operators (operators/profiling.py) + the engagement /
path / k-fold additions, vs DuckDB oracle at sf0.001, plus semantic
invariants a hash match alone would not prove."""

from __future__ import annotations

import pytest

from lime_etl_spark.plans.registry import get
from tests.oracle import assert_query_matches_oracle

NEW_SET = [
    "dq_benford",
    "dq_outlier_iqr",
    "q_mad_price",
    "ev_dau_mau",
    "ev_event_path3",
    "samp_kfold",
]


@pytest.mark.parametrize("name", NEW_SET)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


@pytest.mark.parametrize("name", NEW_SET)
def test_nonempty(spark, sf_dir, name):
    assert get(name).builder(spark, sf_dir).count() > 0


def test_benford_shares_partition_unity(spark, sf_dir):
    rows = get("dq_benford").builder(spark, sf_dir).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10)), digits
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-12


def test_iqr_fences_ordered_and_bounded(spark, sf_dir):
    for r in get("dq_outlier_iqr").builder(spark, sf_dir).collect():
        assert r["p25"] <= r["p75"]
        assert r["n_low"] + r["n_high"] <= r["n_orders"]


def test_mad_nonnegative_and_below_range(spark, sf_dir):
    for r in get("q_mad_price").builder(spark, sf_dir).collect():
        assert r["mad"] >= 0


def test_dau_mau_stickiness_bounds(spark, sf_dir):
    rows = get("ev_dau_mau").builder(spark, sf_dir).collect()
    for r in rows:
        assert 0 < r["dau"] <= r["mau"]
        assert 0.0 < r["stickiness"] <= 1.0
    # warm-up aside, trailing-window MAU should exceed any single DAU
    assert any(r["mau"] > r["dau"] for r in rows)


def test_event_paths_are_trigrams(spark, sf_dir):
    rows = get("ev_event_path3").builder(spark, sf_dir).collect()
    assert all(len(r["path"].split(">")) == 3 for r in rows)
    assert all(r["n_users"] <= r["n_paths"] for r in rows)


def test_kfold_every_fold_populated(spark, sf_dir):
    rows = get("samp_kfold").builder(spark, sf_dir).collect()
    from lime_etl_spark.operators.training import N_FOLDS

    assert {r["fold"] for r in rows} == set(range(N_FOLDS))
