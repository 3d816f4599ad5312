"""run_batch_parallel_jobs: same semantics as the sequential runner,
concurrent execution of independent DAG layers."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.adapter.admin_store import SparkAdminStore
from lime_etl_spark.domain import (
    JobContext,
    JobStatus,
    SimpleJobSpec,
    SparkBatchSpec,
)
from lime_etl_spark.domain.statuses import JobState
from lime_etl_spark.service.runner import (
    _dependency_layers,
    run_batch,
    run_batch_parallel_jobs,
)


@pytest.fixture()
def store(spark, tmp_path):
    return SparkAdminStore(spark, str(tmp_path / "admin"))


def _ok(ctx: JobContext):
    ctx.spark.range(5).agg(F.sum("id")).collect()
    return JobStatus.success()


def _boom(ctx: JobContext):
    raise RuntimeError("kaboom")


def test_dependency_layers_structure():
    jobs = SparkBatchSpec(
        name="layers",
        jobs=[
            SimpleJobSpec(name="job_a", run=_ok),
            SimpleJobSpec(name="job_b", run=_ok),
            SimpleJobSpec(name="job_c", run=_ok, dependencies=["job_a"]),
            SimpleJobSpec(name="job_d", run=_ok, dependencies=["job_a", "job_b"]),
            SimpleJobSpec(name="job_e", run=_ok, dependencies=["job_c", "job_d"]),
        ],
    ).create_jobs()
    layers = [[j.job_name for j in layer] for layer in _dependency_layers(jobs)]
    assert layers == [["job_a", "job_b"], ["job_c", "job_d"], ["job_e"]]


def test_independent_jobs_overlap_in_time(spark, store):
    """Two dependency-free sleeps must actually run concurrently."""
    marks = {}
    lock = threading.Lock()

    def sleepy(name):
        def run(ctx):
            with lock:
                marks[f"{name}_start"] = time.monotonic()
            time.sleep(1.0)
            with lock:
                marks[f"{name}_end"] = time.monotonic()
            return JobStatus.success()

        return run

    batch = SparkBatchSpec(
        name="overlap",
        jobs=[
            SimpleJobSpec(name="sleep1", run=sleepy("s1")),
            SimpleJobSpec(name="sleep2", run=sleepy("s2")),
        ],
    )
    result = run_batch_parallel_jobs(batch, spark, store)
    assert result.broken_jobs == set()
    # overlap: each starts before the other finishes
    assert marks["s1_start"] < marks["s2_end"]
    assert marks["s2_start"] < marks["s1_end"]


def test_parallel_preserves_skip_semantics(spark, store):
    """A failed layer-1 job must fail dependents and skip jobs whose
    deps ALL failed — identical to the sequential runner."""
    batch = SparkBatchSpec(
        name="par_deps",
        jobs=[
            SimpleJobSpec(name="breaks", run=_boom, max_retries=0),
            SimpleJobSpec(name="fine", run=_ok),
            SimpleJobSpec(name="child_of_broken", run=_ok, dependencies=["breaks"]),
            SimpleJobSpec(name="child_of_fine", run=_ok, dependencies=["fine"]),
            SimpleJobSpec(
                name="child_of_both", run=_ok, dependencies=["breaks", "fine"]
            ),
        ],
    )
    result = run_batch_parallel_jobs(batch, spark, store)
    states = {r.job_name: r.status.state for r in result.job_results}
    assert states["breaks"] == JobState.FAILED
    assert states["fine"] == JobState.SUCCEEDED
    # sole dep failed → skip
    assert states["child_of_broken"] == JobState.SKIPPED
    assert states["child_of_fine"] == JobState.SUCCEEDED
    # mixed deps: starting the job raises (reference :346) → failed
    assert states["child_of_both"] == JobState.FAILED


def test_parallel_matches_sequential_ledger(spark, store, tmp_path):
    """Same batch through both runners → same job states and the same
    set of persisted admin rows."""
    def mk():
        return SparkBatchSpec(
            name="same",
            jobs=[
                SimpleJobSpec(name="job_a", run=_ok),
                SimpleJobSpec(name="job_b", run=_boom, max_retries=0),
                SimpleJobSpec(name="job_c", run=_ok, dependencies=["job_a"]),
                SimpleJobSpec(name="job_d", run=_ok, dependencies=["job_b"]),
            ],
        )

    seq_store = SparkAdminStore(spark, str(tmp_path / "seq"))
    par_store = SparkAdminStore(spark, str(tmp_path / "par"))
    seq = run_batch(mk(), spark, seq_store)
    par = run_batch_parallel_jobs(mk(), spark, par_store)
    seq_states = {r.job_name: r.status.state for r in seq.job_results}
    par_states = {r.job_name: r.status.state for r in par.job_results}
    assert seq_states == par_states
    assert seq.broken_jobs == par.broken_jobs


def test_parallel_refresh_skip(spark, store):
    """Second run within the refresh interval skips, exactly like the
    sequential runner."""
    def mk(name):
        return SparkBatchSpec(
            name="refresh_par",
            jobs=[SimpleJobSpec(name="jjj", run=_ok, min_seconds_between_refreshes=3600)],
        )

    first = run_batch_parallel_jobs(mk("jjj"), spark, store)
    assert {r.status.state for r in first.job_results} == {JobState.SUCCEEDED}
    second = run_batch_parallel_jobs(mk("jjj"), spark, store)
    assert {r.status.state for r in second.job_results} == {JobState.SKIPPED}
