"""TableRefreshJob / DataTestJob end-to-end through the batch runner."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.adapter.admin_store import SparkAdminStore
from lime_etl_spark.domain import SparkBatchSpec
from lime_etl_spark.service.runner import run_batch
from lime_etl_spark.service.table_jobs import (
    DataTestJob,
    TableRefreshJob,
    referential_check,
)
from lime_etl_spark.sources.readers import load_table


def test_full_then_incremental_refresh(spark, sf_dir, tmp_path):
    target = str(tmp_path / "orders_mart")
    store = SparkAdminStore(spark, str(tmp_path / "admin"))

    def first_load(s):
        return load_table(s, sf_dir, "orders").where(F.col("o_orderkey") % 2 == 0)

    full = TableRefreshJob(
        name="orders_full", source=first_load, target_path=target, keys=["o_orderkey"]
    )
    r1 = run_batch(SparkBatchSpec(name="mart_batch", jobs=[full]), spark, store)
    assert r1.broken_jobs == set()
    n_even = spark.read.parquet(target).count()
    assert n_even > 0

    # increment: the odd keys plus an UPDATE of one even key
    def increment(s):
        odd = load_table(s, sf_dir, "orders").where(F.col("o_orderkey") % 2 == 1)
        updated = (
            load_table(s, sf_dir, "orders")
            .where(F.col("o_orderkey") % 2 == 0)
            .limit(1)
            .withColumn("o_orderpriority", F.lit("UPDATED"))
        )
        return odd.unionByName(updated)

    inc = TableRefreshJob(
        name="orders_inc",
        source=increment,
        target_path=target,
        mode="incremental",
        keys=["o_orderkey"],
    )
    r2 = run_batch(SparkBatchSpec(name="mart_batch2", jobs=[inc]), spark, store)
    assert r2.broken_jobs == set()
    out = spark.read.parquet(target)
    assert out.count() == load_table(spark, sf_dir, "orders").count()
    assert out.where("o_orderpriority = 'UPDATED'").count() == 1
    # built-in tests persisted (row floor + key uniqueness)
    tested = store.latest_test_results("orders_inc")
    assert {t.test_name for t in tested} == {
        "orders_inc: at least 1 rows",
        "orders_inc: unique on ['o_orderkey']",
    }
    assert all(t.test_passed for t in tested)


def test_refresh_failure_detected_by_row_floor(spark, tmp_path):
    store = SparkAdminStore(spark, str(tmp_path / "admin"))
    empty = TableRefreshJob(
        name="empty_mart",
        source=lambda s: s.range(0).select(F.col("id").alias("k")),
        target_path=str(tmp_path / "empty_mart"),
        expect_min_rows=1,
    )
    result = run_batch(SparkBatchSpec(name="empty_batch", jobs=[empty]), spark, store)
    assert result.broken_jobs == {"empty_mart"}  # ran ok, data test failed


def test_data_test_job_referential(spark, sf_dir, tmp_path):
    store = SparkAdminStore(spark, str(tmp_path / "admin"))
    child = str(tmp_path / "li")
    parent = str(tmp_path / "ord")

    li = TableRefreshJob(
        name="li_mart",
        source=lambda s: load_table(s, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        target_path=child,
    )
    orders = TableRefreshJob(
        name="ord_mart",
        source=lambda s: load_table(s, sf_dir, "orders").select("o_orderkey"),
        target_path=parent,
    )
    ri = DataTestJob(
        name="ri_checks",
        checks=[
            referential_check(child, parent, "l_orderkey", "o_orderkey", "lineitem->orders fk")
        ],
        dependencies=["li_mart", "ord_mart"],
    )
    result = run_batch(
        SparkBatchSpec(name="ri_batch", jobs=[li, orders, ri]), spark, store
    )
    assert result.broken_jobs == set()
    persisted = store.latest_test_results("ri_checks")
    assert [t.test_name for t in persisted] == ["lineitem->orders fk"]
    assert persisted[0].test_passed


def test_refresh_observes_rows_written_without_extra_scan(spark, sf_dir, tmp_path):
    """The rows-written metric must come from the Observation riding
    the write action (last_metrics), matching the persisted count."""
    from lime_etl_spark.domain.specs import JobContext
    from lime_etl_spark.service.table_jobs import TableRefreshJob

    target = str(tmp_path / "nation_copy")
    job = TableRefreshJob(
        name="nation_refresh",
        source=lambda s: s.read.parquet(f"{sf_dir}/nation.parquet"),
        target_path=target,
    )

    class _Log:
        def info(self, msg):
            self.last = msg

    ctx = JobContext(spark=spark, logger=_Log(), resources={})
    status = job.run(ctx)
    assert status.is_success
    n = spark.read.parquet(target).count()
    assert job.last_metrics["rows_written"] == n
    assert str(n) in ctx.logger.last
