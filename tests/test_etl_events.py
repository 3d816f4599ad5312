"""Sets B (ETL primitives) and D (events) vs DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.oracle import assert_query_matches_oracle

KEYS = [
    "etl_snapshot_diff",
    "etl_upsert_incremental",
    "etl_scd2_rebuild",
    "etl_dedup_latest",
    "dq_row_counts",
    "dq_referential_integrity",
    "dq_null_uniqueness",
    "etl_tombstone_delete",
    "dq_freshness",
    "ev_daily_kpis",
    "ev_sessionize",
    "ev_funnel",
    "ev_json_props",
    "ev_top_users_by_spend",
    "ev_cohort_retention",
    "ev_value_histogram",
    "ev_user_lifecycle",
    "dq_distribution_drift",
    "ev_rolling_kpis",
    "dq_accepted_values",
    "ev_anomaly_zscore",
    "etl_scd2_pit_join",
    "ev_power_users",
    "etl_cdc_merge",
    "ev_markov_transitions",
    "dq_checksum_parity",
    "etl_incremental_agg",
    "ev_funnel_windowed",
    "dq_double_fire",
]


@pytest.mark.parametrize("name", KEYS)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_snapshot_diff_classifies_all_types(spark, sf_dir):
    from lime_etl_spark.operators.etl import etl_snapshot_diff

    got = {
        r["change_type"]
        for r in etl_snapshot_diff(spark, sf_dir).select("change_type").distinct().collect()
    }
    assert got == {"added", "deleted", "changed"}


def test_sessionize_monotonic_sessions(spark, sf_dir):
    from lime_etl_spark.operators.events import ev_sessionize

    pdf = ev_sessionize(spark, sf_dir).toPandas()
    # session ids are dense per user starting at 1, sessions don't overlap
    for _, grp in pdf.groupby("user_id"):
        seqs = sorted(grp["session_seq"])
        assert seqs == list(range(1, len(seqs) + 1))
        g = grp.sort_values("session_seq")
        assert (g["end_us"].values[:-1] < g["start_us"].values[1:]).all()


def test_sketch_accuracy_within_documented_bounds(spark, sf_dir):
    """HLL++ distinct must land within its default 5% rsd; the
    10k-accuracy quantile summary within 1% on p95 — the measured
    cost of the documented 100 TB sketch paths."""
    from lime_etl_spark.plans.registry import all_queries

    rows = {r["metric"]: r for r in all_queries()["dq_sketch_accuracy"].builder(spark, sf_dir).collect()}
    assert set(rows) == {"distinct_users", "p95_order_value"}
    assert rows["distinct_users"]["rel_err"] <= 0.05
    assert rows["p95_order_value"]["rel_err"] <= 0.01
    for r in rows.values():
        assert r["exact_value"] > 0 and r["approx_value"] > 0


def test_zorder_exprs_interleave_bits(spark):
    """Morton interleave unit check: x bits land on even positions,
    y bits on odd — verified through the actual Spark expression."""
    from lime_etl_spark.operators.etl import _zorder_exprs

    z = _zorder_exprs()["spark"]
    rows = spark.createDataFrame(
        [(3, 0), (0, 3), (1, 1), (65535, 0), (0, 65535)], "xk long, yk long"
    ).selectExpr(f"xk", "yk", f"({z}) AS z").collect()
    got = {(r["xk"], r["yk"]): r["z"] for r in rows}
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(1, 1)] == 0b11
    assert got[(65535, 0)] == 0x55555555
    assert got[(0, 65535)] == 0xAAAAAAAA


def test_zorder_layout_decision_table(spark, sf_dir):
    """The table must reproduce the textbook layout trade-off:
    single-key sort prunes its own column near-perfectly and the other
    not at all; Z-order prunes BOTH well; natural order prunes
    neither."""
    from lime_etl_spark.plans.registry import get

    rows = {
        (r["layout"], r["probe_col"]): r
        for r in get("etl_zorder_layout").builder(spark, sf_dir).collect()
    }
    assert len(rows) == 6
    assert rows[("keysort", "partkey")]["avg_bucket_frac"] < 0.05
    assert rows[("keysort", "suppkey")]["avg_bucket_frac"] > 0.8
    assert rows[("natural", "partkey")]["avg_bucket_frac"] > 0.8
    assert rows[("natural", "suppkey")]["avg_bucket_frac"] > 0.8
    for col in ("partkey", "suppkey"):
        z = rows[("zorder", col)]["avg_bucket_frac"]
        assert z < 0.3, col
        assert z < rows[("natural", col)]["avg_bucket_frac"] / 3, col
    # exact-arithmetic invariant: frac == sum_span / (2^16 * n_buckets)
    for r in rows.values():
        assert r["avg_bucket_frac"] == r["sum_span"] / (65536 * r["n_buckets"])
