"""End-to-end batch-runner scenarios (mirrors reference
tests/e2e/test_runner.py: dependency skips/failures, retries,
refresh-interval skips, test failures, replacement jobs, validation
errors, admin bookkeeping)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.adapter.admin_store import SparkAdminStore
from lime_etl_spark.domain import (
    DependencyErrors,
    DuplicateJobNames,
    JobContext,
    JobStatus,
    Result,
    SimpleJobSpec,
    SimpleTestResult,
    SparkBatchSpec,
)
from lime_etl_spark.domain.statuses import JobState
from lime_etl_spark.service.admin_jobs import DeleteOldLogs
from lime_etl_spark.service.runner import run_batch, run_batches_in_parallel


@pytest.fixture()
def store(spark, tmp_path):
    return SparkAdminStore(spark, str(tmp_path / "admin"))


def _ok(ctx: JobContext):
    # a real (tiny) Spark action so jobs exercise the session
    ctx.spark.range(5).agg(F.sum("id")).collect()
    return JobStatus.success()


def _boom(ctx: JobContext):
    raise RuntimeError("kaboom")


def test_happy_path_with_dependencies(spark, store, tmp_path):
    out = str(tmp_path / "out")
    state = {}

    def extract(ctx):
        ctx.spark.range(10).write.mode("overwrite").parquet(f"{out}/raw")
        return JobStatus.success()

    def transform(ctx):
        df = ctx.spark.read.parquet(f"{out}/raw")
        state["n"] = df.count()
        return JobStatus.success()

    batch = SparkBatchSpec(
        name="etl_batch",
        jobs=[
            SimpleJobSpec(name="extract", run=extract),
            SimpleJobSpec(name="transform", run=transform, dependencies=["extract"]),
        ],
    )
    result = run_batch(batch, spark, store)
    assert result.broken_jobs == set()
    assert state["n"] == 10
    assert {r.job_name: r.status.state for r in result.job_results} == {
        "extract": JobState.SUCCEEDED,
        "transform": JobState.SUCCEEDED,
    }
    # bookkeeping persisted
    persisted = store.get_batch(batch.batch_id)
    assert persisted is not None and not persisted.running
    assert persisted.job_names == {"extract", "transform"}


def test_failed_dependency_skips_dependents(spark, store):
    # reference batch_runner.py:160 — ALL deps skipped/failed → job skipped
    batch = SparkBatchSpec(
        name="dep_batch",
        jobs=[
            SimpleJobSpec(name="breaks", run=_boom),
            SimpleJobSpec(name="needs_it", run=_ok, dependencies=["breaks"]),
            SimpleJobSpec(name="grandchild", run=_ok, dependencies=["needs_it"]),
        ],
    )
    result = run_batch(batch, spark, store)
    states = {r.job_name: r.status for r in result.job_results}
    assert states["breaks"].is_failed and "kaboom" in (states["breaks"].reason or "")
    assert states["needs_it"].is_skipped
    assert states["grandchild"].is_skipped


def test_partially_failed_dependencies_fail_dependent(spark, store):
    # reference batch_runner.py:346-367 — SOME deps failed (others ok) →
    # starting the job raises "dependencies failed to execute" → failed
    batch = SparkBatchSpec(
        name="mixed_dep_batch",
        jobs=[
            SimpleJobSpec(name="fine", run=_ok),
            SimpleJobSpec(name="breaks", run=_boom),
            SimpleJobSpec(name="needs_both", run=_ok, dependencies=["fine", "breaks"]),
        ],
    )
    result = run_batch(batch, spark, store)
    states = {r.job_name: r.status for r in result.job_results}
    assert states["fine"].is_success
    assert states["breaks"].is_failed
    assert states["needs_both"].is_failed
    assert "dependencies failed to execute" in (states["needs_both"].reason or "")


def test_retries_then_success(spark, store):
    attempts = {"n": 0}

    def flaky(ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return JobStatus.success()

    batch = SparkBatchSpec(
        name="retry_batch", jobs=[SimpleJobSpec(name="flaky_job", run=flaky, max_retries=2)]
    )
    result = run_batch(batch, spark, store)
    assert attempts["n"] == 3
    assert result.broken_jobs == set()


def test_retries_exhausted(spark, store):
    attempts = {"n": 0}

    def always_bad(ctx):
        attempts["n"] += 1
        raise RuntimeError("permanent")

    batch = SparkBatchSpec(
        name="retry_batch2", jobs=[SimpleJobSpec(name="bad_job", run=always_bad, max_retries=2)]
    )
    result = run_batch(batch, spark, store)
    assert attempts["n"] == 3
    assert result.broken_jobs == {"bad_job"}


def test_refresh_interval_skips_second_run(spark, store):
    runs = {"n": 0}

    def counted(ctx):
        runs["n"] += 1
        return JobStatus.success()

    def mk():
        return SparkBatchSpec(
            name="refresh_batch",
            jobs=[SimpleJobSpec(name="hourly_job", run=counted, min_seconds_between_refreshes=3600)],
        )

    r1 = run_batch(mk(), spark, store)
    r2 = run_batch(mk(), spark, store)
    assert runs["n"] == 1
    s2 = next(iter(r2.job_results)).status
    assert s2.is_skipped and "not time yet" in (s2.reason or "")


def test_test_failures_mark_job_broken(spark, store):
    def tests(ctx):
        return [
            SimpleTestResult(test_name="has enough rows", outcome=Result.failure("only 3")),
            SimpleTestResult(test_name="no null keys", outcome=Result.success()),
        ]

    batch = SparkBatchSpec(
        name="tested_batch", jobs=[SimpleJobSpec(name="tested_job", run=_ok, test=tests)]
    )
    result = run_batch(batch, spark, store)
    assert result.broken_jobs == {"tested_job"}
    jr = next(iter(result.job_results))
    assert jr.status.is_success and jr.tests_failed
    persisted = store.latest_test_results("tested_job")
    assert {t.test_name: t.test_passed for t in persisted} == {
        "has enough rows": False,
        "no null keys": True,
    }


def test_skip_tests_flag(spark, store):
    called = {"n": 0}

    def tests(ctx):
        called["n"] += 1
        return [SimpleTestResult(test_name="never run", outcome=Result.failure("x"))]

    batch = SparkBatchSpec(
        name="no_tests_batch",
        jobs=[SimpleJobSpec(name="quiet_job", run=_ok, test=tests)],
        skip_tests=True,
    )
    result = run_batch(batch, spark, store)
    assert called["n"] == 0
    assert result.broken_jobs == set()


def test_on_execution_error_replacement(spark, store):
    # reference batch_runner.py:294-305 — the handler fires when run()
    # RETURNS JobStatus.failed (an uncaught exception bypasses it)
    fallback = SimpleJobSpec(name="fallback_job", run=_ok)
    primary = SimpleJobSpec(
        name="primary_job",
        run=lambda ctx: JobStatus.failed("deliberate failure"),
        on_execution_error=lambda msg: fallback,
    )
    batch = SparkBatchSpec(name="handler_batch", jobs=[primary])
    result = run_batch(batch, spark, store)
    jr = next(iter(result.job_results))
    assert jr.job_name == "fallback_job"
    assert jr.status.is_success


def test_raising_job_bypasses_execution_error_handler(spark, store):
    # parity: reference records the exception as failed without invoking
    # on_execution_error (batch_runner.py:221-233 catches above run_job)
    fallback = SimpleJobSpec(name="fallback_job", run=_ok)
    primary = SimpleJobSpec(
        name="primary_job", run=_boom, on_execution_error=lambda msg: fallback
    )
    batch = SparkBatchSpec(name="handler_batch_raise", jobs=[primary])
    result = run_batch(batch, spark, store)
    jr = next(iter(result.job_results))
    assert jr.job_name == "primary_job"
    assert jr.status.is_failed and "kaboom" in (jr.status.reason or "")


def test_on_test_failure_replacement(spark, store):
    repaired = SimpleJobSpec(name="repaired_job", run=_ok)

    def tests(ctx):
        return [SimpleTestResult(test_name="strict check", outcome=Result.failure("bad"))]

    primary = SimpleJobSpec(
        name="fragile_job", run=_ok, test=tests, on_test_failure=lambda t: repaired
    )
    batch = SparkBatchSpec(name="handler_batch2", jobs=[primary])
    result = run_batch(batch, spark, store)
    jr = next(iter(result.job_results))
    assert jr.job_name == "repaired_job" and jr.status.is_success


def test_duplicate_job_names_rejected(spark, store):
    batch = SparkBatchSpec(
        name="dup_batch",
        jobs=[SimpleJobSpec(name="same_name", run=_ok), SimpleJobSpec(name="same_name", run=_ok)],
    )
    with pytest.raises(DuplicateJobNames):
        run_batch(batch, spark, store)


def test_out_of_order_and_missing_dependencies_rejected(spark, store):
    batch = SparkBatchSpec(
        name="order_batch",
        jobs=[
            SimpleJobSpec(name="first_job", run=_ok, dependencies=["second_job", "ghost_job"]),
            SimpleJobSpec(name="second_job", run=_ok),
        ],
    )
    with pytest.raises(DependencyErrors) as exc:
        run_batch(batch, spark, store)
    issues = {i.job_name: i for i in exc.value.issues}
    assert issues["first_job"].missing_dependencies == frozenset({"ghost_job"})
    assert issues["first_job"].jobs_out_of_order == frozenset({"second_job"})


def test_job_timeout_cancels_and_fails(spark, store):
    import time

    def sleepy(ctx):
        time.sleep(10)
        return JobStatus.success()

    batch = SparkBatchSpec(
        name="timeout_batch",
        jobs=[SimpleJobSpec(name="sleepy_job", run=sleepy, timeout_seconds=1)],
    )
    result = run_batch(batch, spark, store)
    jr = next(iter(result.job_results))
    assert jr.status.is_failed
    assert "timed out" in (jr.status.reason or "")


def test_delete_old_logs_job(spark, store, tmp_path):
    import datetime

    from lime_etl_spark.domain.value_objects import LogLevel

    old = datetime.datetime.now() - datetime.timedelta(days=9)
    store.log("batch_log", LogLevel.INFO, "old line", "b0", ts=old)
    store.flush_logs()

    batch = SparkBatchSpec(name="admin_batch", jobs=[DeleteOldLogs(store, days_logs_to_keep=3)])
    result = run_batch(batch, spark, store)
    assert result.broken_jobs == set()  # run ok AND its self-test passed
    jr = next(iter(result.job_results))
    assert {t.test_name for t in jr.test_results} == {"No log entries more than 3 days old"}
    assert all(t.test_passed for t in jr.test_results)


def test_run_batches_in_parallel(spark, tmp_path):
    batches = [
        SparkBatchSpec(name=f"par_batch_{i}", jobs=[SimpleJobSpec(name=f"job_{i}", run=_ok)])
        for i in range(3)
    ]
    results = run_batches_in_parallel(batches, spark, str(tmp_path / "stores"))
    assert len(results) == 3
    assert all(r.broken_jobs == set() for r in results)


def test_parallel_batches_group_timeout(spark, tmp_path):
    import time

    def slow(ctx):
        time.sleep(8)
        return JobStatus.success()

    batches = [
        SparkBatchSpec(name=f"slow_batch_{i}", jobs=[SimpleJobSpec(name=f"slow_{i}", run=slow)])
        for i in range(2)
    ]
    with pytest.raises(TimeoutError, match="timed out after 1"):
        run_batches_in_parallel(batches, spark, str(tmp_path / "stores"), timeout=1)


def test_run_batch_with_delta_reports_newly_fixed_and_broken(spark, store):
    """Two runs of the same batch name: a job that fails then succeeds
    is newly fixed; one that succeeds then fails is newly broken."""
    from lime_etl_spark.service.runner import run_batch_with_delta

    flaky_fails, stable_fails = {"on": True}, {"on": False}

    def flaky(ctx):
        if flaky_fails["on"]:
            raise RuntimeError("flaky kaboom")
        return JobStatus.success()

    def stable(ctx):
        if stable_fails["on"]:
            raise RuntimeError("stable kaboom")
        return JobStatus.success()

    def mk_batch():
        return SparkBatchSpec(
            name="delta_batch",
            jobs=[
                SimpleJobSpec(name="flaky", run=flaky),
                SimpleJobSpec(name="stable", run=stable),
            ],
        )

    first_status, first_delta = run_batch_with_delta(mk_batch(), spark, store)
    # no previous run: everything broken is "newly broken"
    assert first_status.broken_jobs == {"flaky"}
    assert first_delta.previous is None
    assert first_delta.newly_broken_jobs == {"flaky"}
    assert first_delta.newly_fixed_jobs == set()

    flaky_fails["on"], stable_fails["on"] = False, True
    second_status, delta = run_batch_with_delta(mk_batch(), spark, store)
    assert second_status.broken_jobs == {"stable"}
    assert delta.previous is not None and delta.previous.id == first_status.id
    assert delta.newly_fixed_jobs == {"flaky"}
    assert delta.newly_broken_jobs == {"stable"}
    assert delta.common_jobs == {"flaky", "stable"}
    # the delta is also in the batch log for operators reading the ledger
    log = store.read_log("batch_log")
    assert log.where(F.col("message").contains("newly fixed: ['flaky']")).count() == 1


def test_compact_admin_ledger_job(spark, store):
    """The VACUUM-style admin job folds ledger files and its test()
    proves losslessness."""
    import os

    from lime_etl_spark.service.admin_jobs import CompactAdminLedger

    for _ in range(4):
        run_batch(
            SparkBatchSpec(name="noise", jobs=[SimpleJobSpec(name="noop", run=_ok)]),
            spark,
            store,
        )

    def batch_files():
        path = os.path.join(store.root, "batches")
        return len([f for f in os.listdir(path) if f.endswith(".parquet")])

    assert batch_files() > 4
    result = run_batch(
        SparkBatchSpec(name="maintenance", jobs=[CompactAdminLedger(store)]),
        spark,
        store,
    )
    assert result.broken_jobs == set()
    (job,) = [r for r in result.job_results if r.job_name == "compact_admin_ledger"]
    assert [t.test_passed for t in job.test_results] == [True]
    # ledger state still folds to one file per pre-compaction table write...
    # plus the rows this maintenance batch itself appended afterwards
    assert batch_files() <= 4


def test_batch_timeout_skips_remaining_jobs(spark, store):
    """Once the batch deadline passes, later jobs are SKIPPED with the
    timeout reason (not run, not silently dropped); earlier results
    stand and the batch still completes."""
    import time

    def slow(ctx):
        time.sleep(1.2)
        return JobStatus.success()

    def never(ctx):  # pragma: no cover - must not run
        raise AssertionError("job after the deadline must not execute")

    batch = SparkBatchSpec(
        name="deadline_batch",
        timeout_seconds=1,
        jobs=[
            SimpleJobSpec(name="slow_ok", run=slow),
            SimpleJobSpec(name="after_deadline", run=never),
        ],
    )
    result = run_batch(batch, spark, store)
    by_name = {r.job_name: r for r in result.job_results}
    assert by_name["slow_ok"].status.state == JobState.SUCCEEDED
    assert by_name["after_deadline"].status.state == JobState.SKIPPED
    assert "Batch timeout" in (by_name["after_deadline"].status.reason or "")
    assert result.broken_jobs == set()


def test_fake_clock_drives_refresh_interval(spark, store):
    """The injectable clock (reference TimestampAdapter) makes
    refresh-interval gating testable without sleeping: not-yet-due
    within the window, due again after it passes."""
    from lime_etl_spark.domain.clock import FakeClockAdapter

    clock = FakeClockAdapter()
    runs = {"n": 0}

    def counted(ctx):
        runs["n"] += 1
        return JobStatus.success()

    def mk():
        return SparkBatchSpec(
            name="clocked_batch",
            jobs=[
                SimpleJobSpec(
                    name="interval_job", run=counted, min_seconds_between_refreshes=100
                )
            ],
        )

    r1 = run_batch(mk(), spark, store, clock=clock)
    assert runs["n"] == 1 and r1.broken_jobs == set()

    clock.advance(50)  # inside the refresh window -> skip
    r2 = run_batch(mk(), spark, store, clock=clock)
    assert runs["n"] == 1
    s2 = next(iter(r2.job_results)).status
    assert s2.is_skipped and "not time yet" in (s2.reason or "")

    clock.advance(100)  # past the window -> due again
    run_batch(mk(), spark, store, clock=clock)
    assert runs["n"] == 2


def test_fake_clock_drives_batch_deadline(spark, store):
    """Batch deadline against the injected clock: a job that 'takes'
    10 fake seconds exhausts a 5-second budget, so the next job is
    skipped with the timeout reason — no real time elapses."""
    from lime_etl_spark.domain.clock import FakeClockAdapter

    clock = FakeClockAdapter()

    def slow(ctx):
        clock.advance(10)
        return JobStatus.success()

    batch = SparkBatchSpec(
        name="deadline_batch",
        timeout_seconds=5,
        jobs=[
            SimpleJobSpec(name="slow_job", run=slow),
            SimpleJobSpec(name="late_job", run=_ok),
        ],
    )
    result = run_batch(batch, spark, store, clock=clock)
    by_name = {r.job_name: r for r in result.job_results}
    assert by_name["slow_job"].status.is_success
    late = by_name["late_job"].status
    assert late.is_skipped and "timeout" in (late.reason or "").lower()


def test_admin_batch_prebuilt(spark, store, tmp_path):
    """admin_batch (reference service/admin/admin_batch.py): the
    prebuilt 'admin' housekeeping batch runs DeleteOldLogs and the
    ledger compaction as ordinary gated jobs."""
    from lime_etl_spark.service.admin_jobs import AdminConfig, admin_batch

    # seed some admin history so the jobs have work to do
    seed = SparkBatchSpec(name="seed", jobs=[SimpleJobSpec(name="seed_job", run=_ok)])
    run_batch(seed, spark, store)

    cfg = AdminConfig(admin_dir=str(tmp_path / "admin"), min_seconds_between_runs=0)
    result = run_batch(admin_batch(store, cfg), spark, store)
    assert result.name == "admin"
    assert {r.job_name for r in result.job_results} == {
        "delete_old_logs",
        "compact_admin_ledger",
    }
    assert result.broken_jobs == set()


def test_retry_policy_backoff_via_clock(spark, store):
    """Exponential backoff between retries runs through the injected
    clock: two failures with base=10,factor=2 advance the FakeClock by
    10 + 20 = 30 s, then the third attempt succeeds — no real sleeps."""
    from lime_etl_spark.domain import RetryPolicy
    from lime_etl_spark.domain.clock import FakeClockAdapter

    clock = FakeClockAdapter()
    t0 = clock.now()
    attempts = {"n": 0}

    def flaky(ctx):
        attempts["n"] += 1
        if attempts["n"] <= 2:
            raise RuntimeError("transient")
        return JobStatus.success()

    batch = SparkBatchSpec(
        name="backoff_batch",
        jobs=[
            SimpleJobSpec(
                name="flaky_job",
                run=flaky,
                max_retries=3,
                retry_policy=RetryPolicy(base_seconds=10, factor=2.0),
            )
        ],
    )
    result = run_batch(batch, spark, store, clock=clock)
    assert attempts["n"] == 3
    assert result.broken_jobs == set()
    assert (clock.now() - t0).total_seconds() == 30.0


def test_retry_policy_defaults_and_cap():
    from lime_etl_spark.domain import RetryPolicy

    immediate = RetryPolicy()
    assert immediate.delay(0) == 0.0 and immediate.delay(5) == 0.0
    p = RetryPolicy(base_seconds=10, factor=3.0, max_seconds=50)
    assert [p.delay(a) for a in range(4)] == [10.0, 30.0, 50.0, 50.0]
    with pytest.raises(ValueError):
        RetryPolicy(base_seconds=-1)
    with pytest.raises(ValueError):
        RetryPolicy(base_seconds=1, factor=0.5)
