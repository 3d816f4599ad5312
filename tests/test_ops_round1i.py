"""Batch-11: admin-ledger time travel, schema snapshot, interval-join
property test (hypothesis)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.adapter.admin_store import SparkAdminStore
from lime_etl_spark.domain import JobContext, JobStatus, SimpleJobSpec, SparkBatchSpec
from lime_etl_spark.domain.clock import FakeClockAdapter
from lime_etl_spark.plans.registry import get
from lime_etl_spark.service.runner import run_batch


def _ok(ctx: JobContext):
    return JobStatus.success()


def test_snapshot_as_of_time_travel(spark, tmp_path):
    """Run the same batch at two fake times; the ledger as-of a point
    between the runs must show only the first run's rows, and as-of
    'now' both."""
    store = SparkAdminStore(spark, str(tmp_path / "admin"))
    t0 = datetime.datetime(2026, 1, 1, 3, 0, 0)
    t1 = datetime.datetime(2026, 1, 2, 3, 0, 0)

    def mk():
        return SparkBatchSpec(
            name="nightly", jobs=[SimpleJobSpec(name="job_x", run=_ok)]
        )

    run_batch(mk(), spark, store, clock=FakeClockAdapter(t0))
    run_batch(mk(), spark, store, clock=FakeClockAdapter(t1))

    between = t0 + datetime.timedelta(hours=12)
    early = store.snapshot_as_of("batches", between).collect()
    assert len(early) == 1 and not early[0]["running"]
    late = store.snapshot_as_of("batches", t1 + datetime.timedelta(hours=1)).collect()
    assert len(late) == 2

    jobs_early = store.snapshot_as_of("jobs", between).collect()
    assert {r["job_name"] for r in jobs_early} == {"job_x"}
    assert len(jobs_early) == 1
    # latest-wins within the window: final state, not the running row
    assert jobs_early[0]["state"] != "running"


def test_snapshot_as_of_rejects_unversioned_tables(spark, tmp_path):
    store = SparkAdminStore(spark, str(tmp_path / "admin2"))
    with pytest.raises(ValueError):
        store.snapshot_as_of("batch_log", datetime.datetime.now())


def test_schema_snapshot_covers_all_tables(spark, sf_dir):
    rows = get("dq_schema_snapshot").builder(spark, sf_dir).collect()
    from lime_etl_spark.sources.readers import TABLES

    by_table: dict[str, list] = {}
    for r in rows:
        by_table.setdefault(r["table_name"], []).append(r)
    assert set(by_table) == set(TABLES)
    for t, cols in by_table.items():
        ordinals = sorted(r["ordinal"] for r in cols)
        assert ordinals == list(range(len(cols))), t
    li = {r["column_name"]: r["dtype"] for r in by_table["lineitem"]}
    assert li["l_orderkey"] == "bigint" and li["l_shipdate"] == "timestamp"


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @settings(max_examples=10, deadline=None)
    @given(
        ivals=st.lists(
            st.tuples(st.integers(0, 5000), st.integers(0, 3000)),
            min_size=2,
            max_size=25,
        ),
        bucket=st.sampled_from([1, 7, 100, 1024, 10_000]),
    )
    def test_interval_join_property(spark, ivals, bucket):
        """For arbitrary intervals and bucket widths, the bucketed join
        equals the naive O(n²) overlap join exactly."""
        from lime_etl_spark.operators.events import interval_overlap_join

        rows = [(i, s, s + d) for i, (s, d) in enumerate(ivals)]
        df = spark.createDataFrame(rows, "id long, s long, e long")
        left = df.select(F.col("id").alias("a_id"), F.col("s").alias("a_s"), F.col("e").alias("a_e"))
        right = df.select(F.col("id").alias("b_id"), F.col("s").alias("b_s"), F.col("e").alias("b_e"))
        got = {
            (r["a_id"], r["b_id"])
            for r in interval_overlap_join(
                left, right, "a_s", "a_e", "b_s", "b_e",
                bucket_us=bucket,
                extra_pred=F.col("l.a_id") < F.col("r.b_id"),
            ).collect()
        }
        want = {
            (a[0], b[0])
            for a in rows for b in rows
            if a[0] < b[0] and a[1] <= b[2] and b[1] <= a[2]
        }
        assert got == want


def test_priority_mode_matches_oracle(spark, sf_dir):
    from tests.oracle import assert_query_matches_oracle

    assert_query_matches_oracle(spark, sf_dir, "q_priority_mode_by_year")


def test_weekday_profile_matches_oracle(spark, sf_dir):
    from tests.oracle import assert_query_matches_oracle

    assert_query_matches_oracle(spark, sf_dir, "ev_weekday_hour_profile")


def test_weekday_profile_shape(spark, sf_dir):
    rows = get("ev_weekday_hour_profile").builder(spark, sf_dir).collect()
    assert len(rows) <= 7 * 24
    names = {"Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"}
    assert {r["dow"] for r in rows} <= names
    assert all(0 <= r["hour"] <= 23 and r["n_users"] <= r["n_events"] for r in rows)


def test_shard_manifest_matches_oracle(spark, sf_dir):
    from tests.oracle import assert_query_matches_oracle

    assert_query_matches_oracle(spark, sf_dir, "pack_shard_manifest")


def test_shard_manifest_full_shards(spark, sf_dir):
    from lime_etl_spark.operators.training import SHARD_DOCS

    rows = get("pack_shard_manifest").builder(spark, sf_dir).collect()
    assert [r["shard_id"] for r in rows] == list(range(len(rows)))
    # every shard but the last is exactly full
    for r in rows[:-1]:
        assert r["n_docs"] == SHARD_DOCS
    assert 0 < rows[-1]["n_docs"] <= SHARD_DOCS


def test_write_training_shards_roundtrip(spark, sf_dir, tmp_path):
    """Materialized shards must agree with the manifest query and be
    re-readable with intact shard partitioning."""
    from lime_etl_spark.operators.training import write_training_shards
    from lime_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    manifest = {r["shard_id"]: r["n_docs"] for r in write_training_shards(docs, path).collect()}
    query = {
        r["shard_id"]: r["n_docs"]
        for r in get("pack_shard_manifest").builder(spark, sf_dir).collect()
    }
    assert manifest == query
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert "shard_id" in back.columns
    # determinism: a second write lands identical assignment
    path2 = str(tmp_path / "shards2")
    manifest2 = {r["shard_id"]: r["n_docs"] for r in write_training_shards(docs.repartition(7), path2).collect()}
    assert manifest2 == manifest


@pytest.mark.parametrize("name", ["q_pivot_returns_matrix", "q_unpivot_nation_metrics"])
def test_pivot_unpivot_match_oracle(spark, sf_dir, name):
    from tests.oracle import assert_query_matches_oracle

    assert_query_matches_oracle(spark, sf_dir, name)


def test_pivot_unpivot_are_single_pass(spark, sf_dir):
    """Explicit pivot values → one conditional-agg pass (no distinct
    collect job); unpivot → Expand, no extra scan of the rollup."""
    from tests.test_plan_quality import plan_of

    p = plan_of(spark, sf_dir, "q_pivot_returns_matrix")
    assert p.count("lineitem.parquet") == 1
    u = plan_of(spark, sf_dir, "q_unpivot_nation_metrics")
    assert u.count("orders.parquet") == 1
    assert "Expand" in u


def test_nested_export_matches_oracle(spark, sf_dir):
    from tests.oracle import assert_query_matches_oracle

    assert_query_matches_oracle(spark, sf_dir, "q_order_lines_nested")


def test_nested_export_arrays_sorted_and_sized(spark, sf_dir):
    rows = get("q_order_lines_nested").builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert len(r["line_summaries"]) == r["n_lines"]
        assert r["line_summaries"] == sorted(r["line_summaries"])
