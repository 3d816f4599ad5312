"""The batch runner — lime-etl's execution semantics on Spark.

Parity target: reference lime_etl/service/batch_runner.py (593 LOC).
Behavior preserved:

- duplicate job names → DuplicateJobNames (reference :542)
- missing / out-of-order dependencies → DependencyErrors (:551)
- a job is skipped when ALL of its dependency results are
  skipped/failed (:160); when only some failed, starting the job
  raises and it is recorded as failed (:346-367)
- refresh-interval skip: if the job last succeeded more recently than
  min_seconds_between_refreshes, record a skip "not time yet" (:184)
- retries: re-run up to max_retries times on exception (:503)
- post-run tests unless batch.skip_tests or within
  min_seconds_between_tests of the last test run (:408-445)
- on_execution_error / on_test_failure may return a replacement job,
  which is run recursively (:294-321)
- every state transition is persisted to the admin store (running →
  final), and a BatchStatus row brackets the whole run (:74-119)

Spark-specific: per-job timeout is enforced by running the job body
in a worker thread and cancelling the job's Spark job group on
timeout — the Spark-native way to kill distributed work mid-flight.
Parallel batches share the session via FAIR-scheduler threads rather
than processes (one JVM, many concurrent DAGs).
"""

from __future__ import annotations

import datetime
import traceback
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import TimeoutError as FutureTimeoutError
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import SparkSession

from lime_etl_spark.adapter.admin_store import BatchLogger, JobLogger, SparkAdminStore
from lime_etl_spark.domain.batch_delta import BatchDelta
from lime_etl_spark.domain.clock import ClockAdapter, LocalClockAdapter
from lime_etl_spark.domain.exceptions import (
    DependencyErrors,
    DuplicateJobNames,
    JobDependencyIssue,
)
from lime_etl_spark.domain.specs import JobContext, SparkBatchSpec, SparkJobSpec
from lime_etl_spark.domain.statuses import (
    BatchStatus,
    JobResult,
    JobState,
    JobStatus,
    SimpleTestResult,
    TestResult,
)
from lime_etl_spark.domain.value_objects import ExecutionMillis, Result, UniqueId


def check_for_duplicate_job_names(jobs: Sequence[SparkJobSpec]) -> None:
    names = [j.job_name for j in jobs]
    dups = {n: names.count(n) for n in names if names.count(n) > 1}
    if dups:
        raise DuplicateJobNames(dups)


def check_dependencies(jobs: Sequence[SparkJobSpec]) -> None:
    all_names = {j.job_name for j in jobs}
    issues = []
    seen: set[str] = set()
    for job in jobs:
        missing = {d for d in job.dependencies if d not in all_names}
        out_of_order = {
            d for d in job.dependencies if d in all_names and d not in seen
        }
        seen.add(job.job_name)
        if missing or out_of_order - missing:
            issues.append(
                JobDependencyIssue(
                    job_name=job.job_name,
                    missing_dependencies=frozenset(missing),
                    jobs_out_of_order=frozenset(out_of_order - missing),
                )
            )
    if issues:
        raise DependencyErrors(frozenset(issues))


def run_batch(
    batch: SparkBatchSpec,
    spark: SparkSession,
    store: SparkAdminStore,
    log_to_console: bool = False,
    resources: Optional[dict] = None,
    clock: Optional[ClockAdapter] = None,
) -> BatchStatus:
    status, _ = run_batch_with_delta(
        batch, spark, store, log_to_console, resources, clock
    )
    return status


def run_batch_with_delta(
    batch: SparkBatchSpec,
    spark: SparkSession,
    store: SparkAdminStore,
    log_to_console: bool = False,
    resources: Optional[dict] = None,
    clock: Optional[ClockAdapter] = None,
) -> Tuple[BatchStatus, BatchDelta]:
    """run_batch plus the batch-over-batch health delta.

    The previous COMPLETED run of the same batch name is looked up
    before this run starts; afterwards the delta (newly broken /
    newly fixed jobs — reference batch_delta.py) is logged to the
    batch log and returned alongside the status, so callers can alert
    on regressions without re-reading the admin store.

    ``clock`` is the reference's TimestampAdapter seam: every
    time-based decision (refresh skip, test skip, batch deadline,
    execution_millis) reads it, so tests drive intervals without
    sleeping. Default is the wall clock.
    """
    clock = clock or LocalClockAdapter()
    start = clock.now()
    logger = BatchLogger(store, batch.batch_id, log_to_console)
    previous = store.get_previous_batch(batch.batch_name, exclude_id=batch.batch_id)
    store.save_batch(
        BatchStatus(
            id=batch.batch_id,
            name=batch.batch_name,
            job_results=frozenset(),
            execution_success_or_failure=None,
            execution_millis=None,
            running=True,
            ts=start,
        )
    )
    logger.info(f"Starting batch [{batch.batch_name}]...")
    try:
        result = _run_jobs(batch, spark, store, logger, start, resources or {}, clock)
    except Exception as e:
        logger.exception(e)
        result = BatchStatus(
            id=batch.batch_id,
            name=batch.batch_name,
            job_results=frozenset(),
            execution_success_or_failure=Result.failure(str(e)),
            execution_millis=clock.get_elapsed_time(start),
            running=False,
            ts=clock.now(),
        )
        store.save_batch(result)
        store.flush_logs()
        raise
    store.save_batch(result)
    delta = BatchDelta(current=result, previous=previous)
    logger.info(f"Batch [{batch.batch_name}] finished. Delta — {delta}")
    store.flush_logs()
    return result, delta


def _skip_decision(
    batch: SparkBatchSpec,
    job: SparkJobSpec,
    job_id: str,
    job_results: Sequence[JobResult],
    store: SparkAdminStore,
    logger: BatchLogger,
    start: datetime.datetime,
    clock: ClockAdapter,
) -> Optional[JobResult]:
    """The pre-execution gates, in reference order: batch deadline,
    all-deps-skipped/failed, refresh interval. Returns the skip result,
    or None when the job should actually run. Pure driver-side reads —
    safe to evaluate sequentially while other jobs execute."""
    # Batch-level timeout: the reference declares
    # BatchSpec.timeout_seconds (batch_spec.py:62) without consuming
    # it; here it is enforced as a deadline — jobs that would START
    # after the budget is spent are skipped (recorded, not silently
    # dropped). The in-flight job still gets its own per-job
    # timeout; killing it mid-batch would leave half-written state.
    if (
        batch.timeout_seconds is not None
        and (clock.now() - start).total_seconds() > batch.timeout_seconds
    ):
        logger.info(
            f"Batch timeout of {batch.timeout_seconds} seconds exceeded; "
            f"skipping [{job.job_name}]."
        )
        return JobResult(
            id=job_id,
            batch_id=batch.batch_id,
            job_name=job.job_name,
            status=JobStatus.skipped(
                f"Batch timeout of {batch.timeout_seconds} seconds exceeded."
            ),
            execution_millis=ExecutionMillis(0),
            ts=start,
        )

    dep_results = [r for r in job_results if r.job_name in job.dependencies]
    if job.dependencies and dep_results and all(
        r.status.state in (JobState.SKIPPED, JobState.FAILED) for r in dep_results
    ):
        logger.info(
            f"All the dependencies for [{job.job_name}] were skipped or failed so "
            f"the job has been skipped."
        )
        return JobResult(
            id=job_id,
            batch_id=batch.batch_id,
            job_name=job.job_name,
            status=JobStatus.skipped("Dependencies were skipped or failed."),
            execution_millis=ExecutionMillis(0),
            ts=start,
        )

    last_ok = store.get_last_successful_ts(job.job_name)
    if last_ok is not None:
        since = (clock.now() - last_ok).total_seconds()
        if since <= job.min_seconds_between_refreshes:
            logger.info(
                f"[{job.job_name}] was run successfully {since:.0f} seconds ago and "
                f"it is set to refresh every {job.min_seconds_between_refreshes} "
                f"seconds, so there is no need to refresh again."
            )
            return JobResult(
                id=job_id,
                batch_id=batch.batch_id,
                job_name=job.job_name,
                status=JobStatus.skipped(
                    f"The job ran {since:.0f} seconds ago, so it is not time yet."
                ),
                execution_millis=ExecutionMillis(0),
                ts=start,
            )
    return None


def _execute_job(
    batch: SparkBatchSpec,
    job: SparkJobSpec,
    job_id: str,
    spark: SparkSession,
    store: SparkAdminStore,
    logger: BatchLogger,
    job_results: Sequence[JobResult],
    start: datetime.datetime,
    resources: dict,
    clock: ClockAdapter,
) -> JobResult:
    job_logger = logger.create_job_logger(job.job_name)
    try:
        return _run_job(
            batch, job, job_id, spark, store, job_logger, job_results,
            resources, clock,
        )
    except Exception as e:
        logger.exception(e)
        millis = clock.get_elapsed_time(start)
        return JobResult(
            id=job_id,
            batch_id=batch.batch_id,
            job_name=job.job_name,
            status=JobStatus.failed(f"{e}\n{traceback.format_exc(10)}"),
            execution_millis=millis,
            ts=start,
        )


def _run_jobs(
    batch: SparkBatchSpec,
    spark: SparkSession,
    store: SparkAdminStore,
    logger: BatchLogger,
    start: datetime.datetime,
    resources: dict,
    clock: ClockAdapter,
) -> BatchStatus:
    jobs = batch.create_jobs()
    check_dependencies(jobs)
    check_for_duplicate_job_names(jobs)

    job_results: List[JobResult] = []
    for job in jobs:
        job_id = UniqueId.generate().value
        result = _skip_decision(
            batch, job, job_id, job_results, store, logger, start, clock
        )
        if result is None:
            store.save_job_result(
                JobResult(
                    id=job_id,
                    batch_id=batch.batch_id,
                    job_name=job.job_name,
                    status=JobStatus.running(),
                    execution_millis=ExecutionMillis(0),
                    ts=start,
                )
            )
            result = _execute_job(
                batch, job, job_id, spark, store, logger, job_results, start,
                resources, clock,
            )
        job_results.append(result)
        store.save_job_result(result)

    end = clock.now()
    return BatchStatus(
        id=batch.batch_id,
        name=batch.batch_name,
        job_results=frozenset(job_results),
        execution_success_or_failure=Result.success(),
        execution_millis=ExecutionMillis(int((end - start).total_seconds() * 1000)),
        running=False,
        ts=end,
    )


def _dependency_layers(jobs: Sequence[SparkJobSpec]) -> List[List[SparkJobSpec]]:
    """Topological layers: a job's layer is 1 + max(layer of its deps).
    Jobs inside one layer have no edges between them (dependencies are
    validated to point at earlier-listed jobs), so a layer can run
    concurrently without changing any skip/failure semantics."""
    level: dict[str, int] = {}
    layers: List[List[SparkJobSpec]] = []
    for job in jobs:
        lvl = 1 + max((level[d] for d in job.dependencies), default=-1)
        level[job.job_name] = lvl
        while len(layers) <= lvl:
            layers.append([])
        layers[lvl].append(job)
    return layers


def run_batch_parallel_jobs(
    batch: SparkBatchSpec,
    spark: SparkSession,
    store: SparkAdminStore,
    log_to_console: bool = False,
    resources: Optional[dict] = None,
    clock: Optional[ClockAdapter] = None,
    max_workers: int = 4,
) -> BatchStatus:
    """run_batch with independent jobs executing CONCURRENTLY.

    The reference runner is strictly sequential (batch_runner.py:160 —
    one `for job in jobs` loop); on Spark that leaves the cluster idle
    whenever a driver-heavy or small job runs. This variant computes
    the dependency layers of the DAG and runs each layer's jobs in
    worker threads sharing the one SparkSession — concurrent Spark
    jobs interleave their stages across executors (FAIR-friendly),
    which is the Spark-native version of "run independent ETL jobs at
    once".

    Semantics are preserved exactly: all pre-execution gates (batch
    deadline, all-deps-skipped/failed, refresh interval) are evaluated
    SEQUENTIALLY in declaration order between layers, and every admin-
    store write happens on the coordinating thread (worker threads
    only run the job bodies), so the ledger sees the same rows as the
    sequential runner — layer boundaries only add ordering, never
    remove it.
    """
    clock = clock or LocalClockAdapter()
    start = clock.now()
    logger = BatchLogger(store, batch.batch_id, log_to_console)
    store.save_batch(
        BatchStatus(
            id=batch.batch_id,
            name=batch.batch_name,
            job_results=frozenset(),
            execution_success_or_failure=None,
            execution_millis=None,
            running=True,
            ts=start,
        )
    )
    logger.info(f"Starting batch [{batch.batch_name}] (parallel jobs)...")
    try:
        jobs = batch.create_jobs()
        check_dependencies(jobs)
        check_for_duplicate_job_names(jobs)

        job_results: List[JobResult] = []
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            for layer in _dependency_layers(jobs):
                to_run: List[Tuple[SparkJobSpec, str]] = []
                skipped: List[JobResult] = []
                for job in layer:
                    job_id = UniqueId.generate().value
                    decision = _skip_decision(
                        batch, job, job_id, job_results, store, logger, start, clock
                    )
                    if decision is None:
                        store.save_job_result(
                            JobResult(
                                id=job_id,
                                batch_id=batch.batch_id,
                                job_name=job.job_name,
                                status=JobStatus.running(),
                                execution_millis=ExecutionMillis(0),
                                ts=start,
                            )
                        )
                        to_run.append((job, job_id))
                    else:
                        skipped.append(decision)
                futures = [
                    pool.submit(
                        _execute_job,
                        batch, job, job_id, spark, store, logger,
                        list(job_results), start, resources or {}, clock,
                    )
                    for job, job_id in to_run
                ]
                layer_results = skipped + [f.result() for f in futures]
                # deterministic ledger order regardless of finish order
                order = {j.job_name: i for i, j in enumerate(layer)}
                layer_results.sort(key=lambda r: order[r.job_name])
                for r in layer_results:
                    job_results.append(r)
                    store.save_job_result(r)

        end = clock.now()
        result = BatchStatus(
            id=batch.batch_id,
            name=batch.batch_name,
            job_results=frozenset(job_results),
            execution_success_or_failure=Result.success(),
            execution_millis=ExecutionMillis(int((end - start).total_seconds() * 1000)),
            running=False,
            ts=end,
        )
    except Exception as e:
        logger.exception(e)
        result = BatchStatus(
            id=batch.batch_id,
            name=batch.batch_name,
            job_results=frozenset(),
            execution_success_or_failure=Result.failure(str(e)),
            execution_millis=clock.get_elapsed_time(start),
            running=False,
            ts=clock.now(),
        )
        store.save_batch(result)
        store.flush_logs()
        raise
    store.save_batch(result)
    store.flush_logs()
    return result


def _run_job(
    batch: SparkBatchSpec,
    job: SparkJobSpec,
    job_id: str,
    spark: SparkSession,
    store: SparkAdminStore,
    logger: JobLogger,
    prior_results: Sequence[JobResult],
    resources: dict,
    clock: ClockAdapter,
) -> JobResult:
    """Dependency-failure check → run with retry → tests → handlers."""
    logger.info(f"Starting [{job.job_name}]...")
    start = clock.now()

    dep_failures = {
        r.job_name
        for r in prior_results
        if r.job_name in job.dependencies and r.status.state is JobState.FAILED
    }
    dep_test_failures = {
        r.job_name
        for r in prior_results
        if r.job_name in job.dependencies and r.tests_failed
    }
    if dep_failures:
        errs = ", ".join(sorted(dep_failures))
        if dep_test_failures:
            tf = ", ".join(sorted(dep_test_failures))
            raise Exception(
                f"The following dependencies failed to execute: {errs} and the "
                f"following jobs had test failures: {tf}"
            )
        raise Exception(f"The following dependencies failed to execute: {errs}")

    ctx = JobContext(spark=spark, logger=logger, resources=resources)
    status, millis = _run_with_retry(job, ctx, spark, logger, start, clock)

    test_results: frozenset = frozenset()
    if status.is_success:
        logger.info(f"[{job.job_name}] finished successfully.")
        if not batch.skip_tests and _tests_due(job, store, logger, clock):
            t0 = clock.now()
            simple = job.test(ctx)
            t_millis = int((clock.now() - t0).total_seconds() * 1000)
            if simple:
                passed = sum(1 for t in simple if t.test_passed)
                failed = sum(1 for t in simple if t.test_failed)
                logger.info(
                    f"{job.job_name} test results: tests_passed={passed}, tests_failed={failed}"
                )
                test_results = frozenset(
                    TestResult(
                        id=UniqueId.generate().value,
                        job_id=job_id,
                        test_name=t.test_name,
                        outcome=t.outcome,
                        execution_millis=ExecutionMillis(t_millis),
                        ts=start,
                    )
                    for t in simple
                )
            else:
                logger.info("The job test method returned no results.")
    elif status.is_failed:
        logger.info(f"An exception occurred while running [{job.job_name}]: {status.reason}.")
    elif status.is_skipped:
        logger.info(f"[{job.job_name}] was skipped.")

    result = JobResult(
        id=job_id,
        batch_id=batch.batch_id,
        job_name=job.job_name,
        status=status,
        execution_millis=millis,
        test_results=test_results,
        ts=start,
    )

    if status.is_failed:
        replacement = job.on_execution_error(status.reason or "")
        if replacement is not None:
            logger.info(f"Running replacement job for [{job.job_name}]...")
            return _run_job(
                batch, replacement, job_id, spark, store, logger, prior_results,
                resources, clock,
            )
    elif any(t.test_failed for t in test_results):
        simple_failed = [
            SimpleTestResult(test_name=t.test_name, outcome=t.outcome) for t in test_results
        ]
        replacement = job.on_test_failure(simple_failed)
        if replacement is not None:
            logger.info(f"Running test-failure replacement job for [{job.job_name}]...")
            return _run_job(
                batch, replacement, job_id, spark, store, logger, prior_results,
                resources, clock,
            )
    return result


def _tests_due(
    job: SparkJobSpec, store: SparkAdminStore, logger: JobLogger, clock: ClockAdapter
) -> bool:
    last = store.latest_test_results(job.job_name)
    if not last:
        logger.info(
            f"The tests for [{job.job_name}] have not been run before, so they will be run now."
        )
        return True
    last_ts = max(t.ts for t in last)
    since = int((clock.now() - last_ts).total_seconds())
    if since >= job.min_seconds_between_tests:
        logger.info(
            f"The tests for [{job.job_name}] were last run {since} seconds ago, and they "
            f"are set to run every {job.min_seconds_between_tests}, so they will be run now."
        )
        return True
    logger.info(
        f"The tests for [{job.job_name}] were run {since} seconds ago, and they are set "
        f"to run every {job.min_seconds_between_tests} so they are not ready to be run again."
    )
    return False


def _run_with_retry(
    job: SparkJobSpec,
    ctx: JobContext,
    spark: SparkSession,
    logger: JobLogger,
    start: datetime.datetime,
    clock: ClockAdapter,
) -> Tuple[JobStatus, ExecutionMillis]:
    retries = 0
    while True:
        try:
            status = _run_with_timeout(job, ctx, spark)
            millis = clock.get_elapsed_time(start)
            return status or JobStatus.success(), millis
        except Exception:
            if job.max_retries > retries:
                delay = job.retry_policy.delay(retries)
                if delay > 0:
                    logger.info(
                        f"Backing off {delay:g}s before retry {retries} of "
                        f"{job.max_retries}..."
                    )
                    clock.sleep(delay)
                logger.info(f"Running retry {retries} of {job.max_retries}...")
                retries += 1
                continue
            logger.info(f"[{job.job_name}] failed after {job.max_retries} retries.")
            raise


def _run_with_timeout(
    job: SparkJobSpec, ctx: JobContext, spark: SparkSession
) -> Optional[JobStatus]:
    if job.timeout_seconds is None:
        return job.run(ctx)
    group = f"lime-etl-{job.job_name}"

    def body() -> Optional[JobStatus]:
        spark.sparkContext.setJobGroup(group, f"job {job.job_name}", interruptOnCancel=True)
        return job.run(ctx)

    pool = ThreadPoolExecutor(max_workers=1)
    future = pool.submit(body)
    try:
        return future.result(timeout=job.timeout_seconds)
    except FutureTimeoutError:
        spark.sparkContext.cancelJobGroup(group)
        raise TimeoutError(
            f"[{job.job_name}] timed out after {job.timeout_seconds} seconds."
        )
    finally:
        # wait=False: the cancelled job group unblocks the worker thread on
        # its own; blocking here would serialize the timeout into the caller
        pool.shutdown(wait=False)


def run_batches_in_parallel(
    batches: Sequence[SparkBatchSpec],
    spark: SparkSession,
    store_root: str,
    max_workers: Optional[int] = None,
    timeout: Optional[int] = None,
    log_to_console: bool = False,
) -> List[BatchStatus]:
    """Concurrent batches in one Spark session (FAIR-scheduler threads —
    the single-JVM analog of the reference's multiprocessing pool).
    ``timeout`` bounds the whole group, like the reference's
    ``future.get(timeout)`` (batch_runner.py:46): on expiry a
    TimeoutError raises and stragglers' Spark jobs keep their own
    per-job timeouts."""
    spark.sparkContext.setLocalProperty("spark.scheduler.mode", "FAIR")

    def one(batch: SparkBatchSpec) -> BatchStatus:
        import os

        store = SparkAdminStore(spark, os.path.join(store_root, batch.batch_name))
        return run_batch(batch, spark, store, log_to_console)

    import time as _time

    with ThreadPoolExecutor(max_workers=max_workers or len(batches)) as pool:
        futures = [pool.submit(one, b) for b in batches]
        deadline = None if timeout is None else _time.monotonic() + timeout
        results = []
        try:
            for f in futures:
                remaining = None if deadline is None else max(0.0, deadline - _time.monotonic())
                results.append(f.result(timeout=remaining))
        except FutureTimeoutError:
            for f in futures:
                f.cancel()
            raise TimeoutError(
                f"run_batches_in_parallel timed out after {timeout} seconds."
            )
        return results


def batch_delta(store: SparkAdminStore, current: BatchStatus, previous_id: Optional[str]) -> BatchDelta:
    previous = store.get_batch(previous_id) if previous_id else None
    return BatchDelta(current=current, previous=previous)
