"""Round-3 insights operators: streaks, inter-arrival, reconciliation,
degree profile, vocab overlap, range search, length buckets, session
depth — every ✓SQL op cross-checked against its DuckDB oracle, plus
semantic spot checks that the oracle alone can't express."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.plans.registry import all_queries
from tests.oracle import assert_query_matches_oracle

INSIGHT_QUERIES = [
    "ev_active_streaks",
    "ev_inter_arrival",
    "dq_order_reconcile",
    "graph_degree_distribution",
    "txt_vocab_overlap",
    "ann_range_search",
    "pack_length_buckets",
    "ev_session_depth_hist",
]


@pytest.mark.parametrize("name", INSIGHT_QUERIES)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_streaks_islands_split_on_gap(spark, tmp_path):
    """Three users: 3-day run, run broken by a gap, single day —
    the max-streak histogram must be exactly {1:1, 2:1, 3:1}."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, day):
        return (eid, base + dt.timedelta(days=day), uid, "view", 1.0, "{}")

    rows = [
        # user 1: days 0,1,2 → streak 3
        ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 2),
        # user 2: days 0,1 then 3 → max streak 2
        ev(4, 2, 0), ev(5, 2, 1), ev(6, 2, 3),
        # user 3: day 5 only → streak 1
        ev(7, 3, 5),
    ]
    docs = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        r.max_streak_days: r.n_users
        for r in all_queries()["ev_active_streaks"].builder(spark, d).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}


def test_session_depth_counts_bounce_bucket(spark, sf_dir):
    """depth==1 sessions in the histogram must equal the bounce count
    ev_bounce_rate reports summed over days (same sessionization)."""
    hist = {
        r.session_depth: r.n_sessions
        for r in all_queries()["ev_session_depth_hist"].builder(spark, sf_dir).collect()
    }
    bounce = (
        all_queries()["ev_bounce_rate"]
        .builder(spark, sf_dir)
        .agg(
            F.sum("n_bounces").alias("b"), F.sum("n_sessions").alias("s")
        )
        .collect()[0]
    )
    assert hist.get(1, 0) == bounce.b
    assert sum(hist.values()) == bounce.s


def test_reconcile_counts_childless_orders(spark, sf_dir):
    """n_childless summed over statuses == orders with no lineitem
    (independent left-anti count)."""
    from lime_etl_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    ).distinct()
    expected = orders.join(li, "o_orderkey", "left_anti").count()
    out = (
        all_queries()["dq_order_reconcile"]
        .builder(spark, sf_dir)
        .agg(F.sum("n_childless").alias("c"))
        .collect()[0]
    )
    assert out.c == expected


def test_length_buckets_conserve_docs(spark, sf_dir):
    """Every non-empty doc lands in exactly one bucket and padding is
    non-negative; fill ratio within (0, 1]."""
    from lime_etl_spark.sources.readers import load_table

    rows = all_queries()["pack_length_buckets"].builder(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_nonempty = docs.where(F.trim("text") != "").count()
    # no doc in the synthetic corpus exceeds the 4096 cap
    assert sum(r.n_docs for r in rows) == n_nonempty
    for r in rows:
        assert r.padding_tokens >= 0
        assert 0.0 < r.fill_ratio <= 1.0
        assert r.sum_tokens + r.padding_tokens == r.n_docs * r.bucket_cap


def test_range_search_agrees_with_bruteforce_topk(spark, sf_dir):
    """A query whose best top-k cosine clears τ must report
    n_in_range ≥ 1 with the same best cosine."""
    from lime_etl_spark.operators.insights import RANGE_TAU

    topk = (
        all_queries()["ann_bruteforce_topk"]
        .builder(spark, sf_dir)
        .groupBy("q_vec_id")
        .agg(F.max("cosine").alias("best"))
        .collect()
    )
    rng = {
        r.q_vec_id: r
        for r in all_queries()["ann_range_search"].builder(spark, sf_dir).collect()
    }
    for row in topk:
        r = rng[row.q_vec_id]
        if row.best >= RANGE_TAU:
            assert r.n_in_range >= 1
            assert r.best_cosine == row.best
        else:
            assert r.n_in_range == 0 or r.best_cosine >= RANGE_TAU


def test_vocab_overlap_bounds(spark, sf_dir):
    rows = all_queries()["txt_vocab_overlap"].builder(spark, sf_dir).collect()
    assert rows, "expected at least one source pair"
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.n_common <= min(r.n_words_a, r.n_words_b)
        assert 0.0 < r.jaccard <= 1.0


BATCH2 = [
    "ev_repeat_purchase_curve",
    "dq_candidate_keys",
    "txt_simpson_diversity",
    "ev_hourly_load_percentiles",
]


@pytest.mark.parametrize("name", BATCH2)
def test_batch2_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_candidate_keys_verdicts_on_synthetic(spark, sf_dir):
    """Single-column surrogate keys hold on every driver table; the
    composite (l_orderkey, l_linenumber) does NOT — the synthetic
    generator draws line numbers with replacement — and the profile
    is precisely the operator that surfaces that."""
    rows = {r.table_name: r for r in all_queries()["dq_candidate_keys"].builder(spark, sf_dir).collect()}
    assert len(rows) == 10
    for t, r in rows.items():
        if t == "lineitem":
            assert not r.is_unique and r.n_distinct < r.n_rows
        else:
            assert r.is_unique, (t, r.n_rows, r.n_distinct)


def test_simpson_bounds(spark, sf_dir):
    rows = all_queries()["txt_simpson_diversity"].builder(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r.simpson <= 1.0
        assert r.n_distinct_tokens <= r.n_tokens


BATCH3 = [
    "ev_purchase_velocity",
    "dq_null_profile",
    "cur_near_dup_rate_by_source",
]


@pytest.mark.parametrize("name", BATCH3)
def test_batch3_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_velocity_range_window_counts_simultaneous(spark, tmp_path):
    """Three purchases inside one hour → burst 3; a fourth 2h later
    starts its own window. RANGE semantics: ties share the frame."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, base, 7, "purchase", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=20), 7, "purchase", 1.0, "{}"),
        (3, base + dt.timedelta(minutes=40), 7, "purchase", 1.0, "{}"),
        (4, base + dt.timedelta(hours=3), 7, "purchase", 1.0, "{}"),
        (5, base, 8, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        r.max_burst_1h: r.n_users
        for r in all_queries()["ev_purchase_velocity"].builder(spark, d).collect()
    }
    assert out == {3: 1}


def test_null_profile_covers_every_column(spark, sf_dir):
    from lime_etl_spark.sources.readers import TABLES, load_table

    rows = all_queries()["dq_null_profile"].builder(spark, sf_dir).collect()
    got = {(r.table_name, r.column_name) for r in rows}
    want = {
        (t, c) for t in TABLES for c in load_table(spark, sf_dir, t).columns
    }
    assert got == want
    assert all(0 <= r.n_nulls <= r.n_rows for r in rows)
