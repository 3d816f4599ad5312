"""Integration tests for SparkAdminStore (mirrors reference
tests/integration/adapter/*: repository round-trips, last-successful
lookup, log retention)."""

from __future__ import annotations

import datetime

import pytest

from lime_etl_spark.adapter.admin_store import SparkAdminStore
from lime_etl_spark.domain import (
    BatchStatus,
    ExecutionMillis,
    JobResult,
    JobStatus,
    Result,
    UniqueId,
)
from lime_etl_spark.domain.statuses import TestResult
from lime_etl_spark.domain.value_objects import LogLevel

NOW = datetime.datetime.now()


@pytest.fixture()
def store(spark, tmp_path):
    return SparkAdminStore(spark, str(tmp_path / "admin"))


def test_batch_round_trip_latest_wins(spark, store):
    bid = UniqueId.generate().value
    store.save_batch(
        BatchStatus(
            id=bid, name="batch_x", job_results=frozenset(),
            execution_success_or_failure=None, execution_millis=None,
            running=True, ts=NOW,
        )
    )
    got = store.get_batch(bid)
    assert got is not None and got.running

    store.save_batch(
        BatchStatus(
            id=bid, name="batch_x", job_results=frozenset(),
            execution_success_or_failure=Result.failure("boom"),
            execution_millis=ExecutionMillis(123), running=False, ts=NOW,
        )
    )
    got = store.get_batch(bid)
    assert got is not None
    assert not got.running
    assert got.execution_success_or_failure == Result.failure("boom")
    assert got.execution_millis == ExecutionMillis(123)
    assert store.get_batch("f" * 32) is None


def test_job_results_and_last_successful_ts(store):
    bid = UniqueId.generate().value
    jid1, jid2 = UniqueId.generate().value, UniqueId.generate().value
    t1 = NOW - datetime.timedelta(hours=2)
    t2 = NOW - datetime.timedelta(hours=1)
    store.save_job_result(
        JobResult(id=jid1, batch_id=bid, job_name="job_a",
                  status=JobStatus.success(), execution_millis=ExecutionMillis(5), ts=t1)
    )
    store.save_job_result(
        JobResult(id=jid2, batch_id=bid, job_name="job_a",
                  status=JobStatus.failed("nope"), execution_millis=ExecutionMillis(5), ts=t2)
    )
    # last SUCCESSFUL is t1, not the later failure
    assert store.get_last_successful_ts("job_a") == t1
    assert store.get_last_successful_ts("never_ran") is None

    results = store.get_job_results(bid)
    assert {r.id for r in results} == {jid1, jid2}


def test_test_results_round_trip(store):
    bid, jid = UniqueId.generate().value, UniqueId.generate().value
    tr = TestResult(
        id=UniqueId.generate().value, job_id=jid, test_name="rowcount check",
        outcome=Result.failure("expected 10, got 9"),
        execution_millis=ExecutionMillis(3), ts=NOW,
    )
    store.save_job_result(
        JobResult(id=jid, batch_id=bid, job_name="job_t", status=JobStatus.success(),
                  execution_millis=ExecutionMillis(9), test_results=frozenset([tr]), ts=NOW)
    )
    latest = store.latest_test_results("job_t")
    assert len(latest) == 1
    assert latest[0].test_name == "rowcount check"
    assert latest[0].test_failed
    assert store.latest_test_results("job_without_tests") == []


def test_log_append_and_partition_retention(store):
    old = NOW - datetime.timedelta(days=10)
    store.log("batch_log", LogLevel.INFO, "ancient entry", "b1", ts=old)
    store.log("batch_log", LogLevel.INFO, "fresh entry", "b1", ts=NOW)
    store.log("job_log", LogLevel.ERROR, "job boom", "b1", "job_a", ts=old)
    store.flush_logs()

    assert store.earliest_log_ts("batch_log") == old

    store.delete_old_logs(days_to_keep=3)

    remaining = store.read_log("batch_log").collect()
    assert [r["message"] for r in remaining] == ["fresh entry"]
    assert store.read_log("job_log").count() == 0
    earliest = store.earliest_log_ts("batch_log")
    assert earliest is not None and earliest >= NOW - datetime.timedelta(days=3)


def test_compact_preserves_rows_and_folds_files(spark, store):
    import datetime
    import os

    from lime_etl_spark.domain.statuses import BatchStatus, JobResult, JobStatus
    from lime_etl_spark.domain.value_objects import ExecutionMillis, Result, UniqueId

    t0 = datetime.datetime(2026, 2, 1, 9, 0)
    batch_ids = []
    for i in range(6):
        bid = UniqueId.generate().value
        batch_ids.append(bid)
        store.save_batch(
            BatchStatus(
                id=bid,
                name="nightly",
                job_results=frozenset(),
                execution_success_or_failure=Result.success(),
                execution_millis=ExecutionMillis(i),
                running=False,
                ts=t0 + datetime.timedelta(minutes=i),
            )
        )
        store.save_job_result(
            JobResult(
                id=UniqueId.generate().value,
                batch_id=bid,
                job_name=f"job_{i}",
                status=JobStatus.success(),
                execution_millis=ExecutionMillis(i),
                ts=t0,
            )
        )
        store.log("batch_log", LogLevel.INFO, f"line {i}", bid, ts=t0)
    store.flush_logs()

    def parquet_files(table):
        path = os.path.join(store.root, table)
        return sum(
            1 for _, _, files in os.walk(path) for f in files if f.endswith(".parquet")
        )

    assert parquet_files("batches") == 6
    before_jobs = {r.job_name for b in batch_ids for r in store.get_job_results(b)}

    stats = store.compact()
    assert parquet_files("batches") == 1 and stats["batches"] == (6, 1)
    assert parquet_files("jobs") == 1
    assert parquet_files("batch_log") == 1

    # lossless: same latest-wins state and log rows after compaction
    after_jobs = {r.job_name for b in batch_ids for r in store.get_job_results(b)}
    assert after_jobs == before_jobs == {f"job_{i}" for i in range(6)}
    assert store.read_log("batch_log").count() == 6
    assert store.get_batch(batch_ids[-1]).execution_millis.value == 5


def test_get_previous_batch_skips_running_and_self(spark, store):
    import datetime

    from lime_etl_spark.domain.statuses import BatchStatus
    from lime_etl_spark.domain.value_objects import ExecutionMillis, Result, UniqueId

    t0 = datetime.datetime(2026, 2, 1, 9, 0)

    def save(bid, running, minute):
        store.save_batch(
            BatchStatus(
                id=bid,
                name="nightly",
                job_results=frozenset(),
                execution_success_or_failure=None if running else Result.success(),
                execution_millis=None if running else ExecutionMillis(1),
                running=running,
                ts=t0 + datetime.timedelta(minutes=minute),
            )
        )

    assert store.get_previous_batch("nightly") is None
    first = UniqueId.generate().value
    save(first, running=True, minute=0)
    save(first, running=False, minute=1)
    current = UniqueId.generate().value
    save(current, running=True, minute=2)

    prev = store.get_previous_batch("nightly", exclude_id=current)
    assert prev is not None and prev.id == first and not prev.running
    assert store.get_previous_batch("other_name") is None


def test_job_health_stats(spark, store):
    """Dashboard rollup over the event-sourced jobs ledger: latest
    state per job_id, failure rates, duration percentiles."""
    import datetime

    from lime_etl_spark.adapter.admin_store import job_health_stats
    from lime_etl_spark.domain.statuses import JobResult, JobStatus
    from lime_etl_spark.domain.value_objects import ExecutionMillis, UniqueId

    t0 = datetime.datetime(2026, 5, 1, 8, 0)

    def save(name, status, millis):
        jid = UniqueId.generate().value
        # event-sourced: RUNNING first, then the terminal state
        store.save_job_result(JobResult(
            id=jid, batch_id="b1", job_name=name,
            status=JobStatus.running(), execution_millis=ExecutionMillis(0), ts=t0))
        store.save_job_result(JobResult(
            id=jid, batch_id="b1", job_name=name,
            status=status, execution_millis=ExecutionMillis(millis), ts=t0))

    for ms in (100, 200, 300, 400):
        save("steady", JobStatus.success(), ms)
    save("flaky", JobStatus.success(), 50)
    save("flaky", JobStatus.failed("x"), 999)

    stats = {r["job_name"]: r for r in job_health_stats(store).collect()}
    assert stats["steady"]["n_runs"] == 4 and stats["steady"]["n_failed"] == 0
    assert stats["steady"]["p50_millis"] == 250.0  # interpolated over 100..400
    assert stats["flaky"]["n_runs"] == 2 and stats["flaky"]["n_failed"] == 1
    assert stats["flaky"]["failure_rate"] == 0.5
    # failed run's millis excluded from the success percentiles
    assert stats["flaky"]["p50_millis"] == 50.0


# --- cross-process append safety (r7 verdict #6) -----------------------------


def _mp_worker(args) -> int:
    """Child-process body: append batch versions + job results to the
    SHARED admin root. Runs WITHOUT Spark — the store's write path is
    driver-side pyarrow by design, which is exactly what makes the
    multi-process question real (two coordinators could share a root)."""
    root, worker_ix, n_versions = args
    import datetime as dt

    from lime_etl_spark.adapter.admin_store import SparkAdminStore
    from lime_etl_spark.domain.statuses import BatchStatus, JobResult, JobStatus
    from lime_etl_spark.domain.value_objects import ExecutionMillis, Result

    store = SparkAdminStore(spark=None, root=root)
    ts = dt.datetime(2024, 3, 1, 12, 0, 0)
    for i in range(n_versions):
        for bid in (f"batch-w{worker_ix}", "batch-contested"):
            store.save_batch(
                BatchStatus(
                    id=bid, name=bid, job_results=frozenset(),
                    execution_success_or_failure=Result.success(),
                    execution_millis=ExecutionMillis(worker_ix * 1000 + i),
                    running=False, ts=ts,
                )
            )
        store.save_job_result(
            JobResult(
                id=f"job-w{worker_ix}-{i}", batch_id=f"batch-w{worker_ix}",
                job_name=f"job_w{worker_ix}", status=JobStatus.success(),
                execution_millis=ExecutionMillis(i), ts=ts,
            )
        )
    return worker_ix


def _mp_frozen_clock_minter(args) -> list:
    """Mint n seqs with time.time_ns FROZEN to one shared nanosecond —
    the forced collision the wall-clock-ns scheme could not survive."""
    frozen_ns, n = args
    from lime_etl_spark.adapter import admin_store as ams

    ams.time.time_ns = lambda: frozen_ns  # every read collides
    return [(ams.os.getpid(), ams._mint_seq()) for _ in range(n)]


def test_seq_total_order_under_forced_same_ns_collisions():
    """r8 verdict #8: seq must be a strict TOTAL order across writers
    even when every clock read lands on the SAME nanosecond. Four real
    processes mint with a frozen clock: all seqs globally distinct
    (pid low bits differ), strictly increasing within each process
    (high-water bump), and the pid is recoverable from the low bits."""
    import multiprocessing as mp

    from lime_etl_spark.adapter.admin_store import _SEQ_PID_MASK

    frozen_ns, n_each = 1_700_000_000_000_000_000, 50
    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        out = pool.map(_mp_frozen_clock_minter, [(frozen_ns, n_each)] * 4)
    all_seqs = [seq for worker in out for _, seq in worker]
    assert len(set(all_seqs)) == 4 * n_each, "same-ns collision produced equal seqs"
    for worker in out:
        pid = worker[0][0]
        seqs = [seq for _, seq in worker]
        assert seqs == sorted(seqs) and len(set(seqs)) == n_each
        assert all(seq & _SEQ_PID_MASK == (pid & _SEQ_PID_MASK) for seq in seqs)


def test_concurrent_multiprocess_appends_merge_safely(spark, tmp_path):
    """Two+ PROCESSES appending the same admin root concurrently (r7
    verdict #6): the reference got transactionality from SQLAlchemy;
    this store's event-sourced design must provide the equivalent by
    construction — every append is a NEW uuid-named parquet part file
    (no rewrite, so no torn read), and reads are latest-wins on seq.
    Proves: no append lost, no file corrupt, per-entity reads
    consistent, and compaction after the concurrent phase preserves
    every read."""
    import glob as globmod
    import multiprocessing as mp

    root = str(tmp_path / "admin_mp")
    n_workers, n_versions = 4, 12
    ctx = mp.get_context("spawn")  # a REAL separate process, not a fork of the JVM-attached parent
    with ctx.Pool(n_workers) as pool:
        done = pool.map(_mp_worker, [(root, w, n_versions) for w in range(n_workers)])
    assert sorted(done) == list(range(n_workers))

    store = SparkAdminStore(spark, root)
    # no append lost: one part file per save_batch call, all readable
    batch_files = globmod.glob(f"{root}/batches/*.parquet")
    assert len(batch_files) == n_workers * n_versions * 2
    import pyarrow.parquet as pq_mod

    rows = pq_mod.read_table(f"{root}/batches").to_pylist()
    assert len(rows) == n_workers * n_versions * 2  # nothing torn or dropped

    # per-entity latest-wins: each worker's own batch resolves to ITS
    # final version; the contested batch resolves to the globally
    # max-seq version, whichever process wrote it
    for w in range(n_workers):
        got = store.get_batch(f"batch-w{w}")
        assert got is not None and got.execution_millis.value == w * 1000 + (n_versions - 1)
    contested = [r for r in rows if r["batch_id"] == "batch-contested"]
    winner_seq = max(r["seq"] for r in contested)
    got = store.get_batch("batch-contested")
    winning_rows = [r for r in contested if r["seq"] == winner_seq]
    assert len(winning_rows) == 1, "time_ns seq tie across processes"
    assert got.execution_millis.value == winning_rows[0]["execution_millis"]

    # job results from every process are all present
    for w in range(n_workers):
        res = store.get_job_results(f"batch-w{w}")
        assert len(res) == n_versions

    # compaction after the concurrent phase must preserve every read
    store.compact()
    for w in range(n_workers):
        assert store.get_batch(f"batch-w{w}").execution_millis.value == w * 1000 + (n_versions - 1)
        assert len(store.get_job_results(f"batch-w{w}")) == n_versions
    assert store.get_batch("batch-contested").execution_millis.value == winning_rows[0]["execution_millis"]
