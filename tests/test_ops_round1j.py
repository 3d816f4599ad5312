"""Batch-16: dimension conformance, normalized dedup, source interleave."""

from __future__ import annotations

import pytest

from lime_etl_spark.plans.registry import get
from tests.oracle import assert_query_matches_oracle

SET_J = ["etl_dim_conformance", "dedup_normalized_exact", "samp_source_interleave"]


@pytest.mark.parametrize("name", SET_J)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


@pytest.mark.parametrize("name", SET_J)
def test_nonempty(spark, sf_dir, name):
    assert get(name).builder(spark, sf_dir).count() > 0


def test_conformance_clean_on_generated_schema(spark, sf_dir):
    """The driver's star schema IS conformed — zero unconformed keys;
    the audit's value is that it would catch a divergence."""
    rows = {r["side"]: r for r in get("etl_dim_conformance").builder(spark, sf_dir).collect()}
    assert rows["customer_nations"]["n_unconformed"] == 0
    assert rows["supplier_nations"]["n_unconformed"] == 0
    assert rows["customer_nations"]["n_keys"] > 0


def test_normalized_dedup_catches_what_raw_md5_misses(spark, sf_dir):
    """Every planted re-capitalized+punctuated copy must land in a
    normalized dup group, and raw exact dedup must miss ALL of them."""
    from lime_etl_spark.operators.dedup import _excerpt_corpus  # noqa: F401 (import check)
    from lime_etl_spark.sources.readers import load_table

    n_planted = (
        load_table(spark, sf_dir, "documents").where("doc_id % 10 = 0").count()
    )
    groups = get("dedup_normalized_exact").builder(spark, sf_dir).collect()
    assert sum(r["n_copies"] - 1 for r in groups) >= n_planted
    # raw md5 on the same corpus finds none of the planted copies
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    reformatted = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(
            F.upper(F.substring("text", 1, 1)), F.expr("substring(text, 2)"), F.lit(".")
        ).alias("text"),
    )
    raw_groups = (
        docs.unionByName(reformatted)
        .groupBy(F.md5("text"))
        .count()
        .where("count > 1")
        .count()
    )
    assert raw_groups == 0


def test_interleave_spreads_sources_uniformly(spark, sf_dir):
    """Round-robin property: per-source mean positions are within one
    round of each other, and first positions are all < n_sources."""
    rows = get("samp_source_interleave").builder(spark, sf_dir).collect()
    n_src = len(rows)
    assert n_src >= 2
    assert all(r["first_pos"] < n_src for r in rows)
    means = [r["mean_pos"] for r in rows]
    # equal-sized sources → means differ by at most n_src
    if len({r["n_docs"] for r in rows}) == 1:
        assert max(means) - min(means) <= n_src


@pytest.mark.parametrize("name", ["ev_bounce_rate", "q_ship_lag_percentiles"])
def test_batch17_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_bounce_rate_bounds(spark, sf_dir):
    rows = get("ev_bounce_rate").builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_bounces"] <= r["n_sessions"]
        assert 0.0 <= r["bounce_rate"] <= 1.0


def test_ship_lag_ordered(spark, sf_dir):
    for r in get("q_ship_lag_percentiles").builder(spark, sf_dir).collect():
        assert (
            r["min_lag_days"]
            <= r["p50_lag_days"]
            <= r["p95_lag_days"]
            <= r["max_lag_days"]
        )


def test_returns_rate_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "q_returns_rate_by_brand")


def test_returns_rate_bounds(spark, sf_dir):
    rows = get("q_returns_rate_by_brand").builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_returned"] <= r["n_items"]
        assert 0.0 <= r["return_rate"] <= 1.0


def test_surrogate_keys_match_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "etl_surrogate_keys")


def test_surrogate_keys_collision_free(spark, sf_dir):
    r = get("etl_surrogate_keys").builder(spark, sf_dir).collect()[0]
    assert r["n_collisions"] == 0
    assert r["n_keys"] == r["n_distinct"] > 0
    assert 0 <= r["min_sk"] <= r["max_sk"] < 1 << 60
