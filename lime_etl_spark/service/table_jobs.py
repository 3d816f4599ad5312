"""Prebuilt job types: the refresh-a-table-then-test-it pattern that
lime-etl jobs exist for, packaged as ready-made SparkJobSpecs.

The reference leaves ``run``/``test`` abstract and every user writes
the same refresh job (reference tests/e2e/test_runner.py MessageJob:
write rows, then test they arrived). Here that pattern is first-class:

- ``TableRefreshJob``: full (overwrite) or incremental (keyed upsert,
  operators/etl.py) refresh of a parquet target from any
  DataFrame-producing callable, with built-in data tests (row floor,
  key uniqueness) — the `test()` half of the reference contract wired
  to real distributed checks.
- ``DataTestJob``: a test-only job for cross-table assertions
  (referential integrity, row-count deltas) that runs after its
  dependencies refresh.

Scale notes: full refresh writes partitioned parquet straight through
the DataFrameWriter (no driver materialization). Incremental refresh
rewrites via tmp+rename, which is atomic locally; on an object-store
lake the same call sites swap to a table format's transactional
MERGE — the operator semantics (latest-wins on keys) are unchanged.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_etl_spark.domain.specs import JobContext, SparkJobSpec
from lime_etl_spark.domain.statuses import JobStatus, SimpleTestResult
from lime_etl_spark.domain.value_objects import Result
from lime_etl_spark.operators.etl import upsert


class TableRefreshJob(SparkJobSpec):
    def __init__(
        self,
        *,
        name: str,
        source: Callable[[SparkSession], DataFrame],
        target_path: str,
        mode: str = "full",  # full | incremental
        keys: Optional[Sequence[str]] = None,
        partition_by: Optional[Sequence[str]] = None,
        expect_min_rows: int = 1,
        dependencies: Sequence[str] = (),
        max_retries: int = 0,
        timeout_seconds: Optional[int] = None,
        min_seconds_between_refreshes: int = 0,
    ):
        if mode not in ("full", "incremental"):
            raise ValueError(f"mode must be full|incremental, got {mode!r}")
        if mode == "incremental" and not keys:
            raise ValueError("incremental mode requires keys")
        self._name = name
        self._source = source
        self._target = target_path
        self._mode = mode
        self._keys = list(keys or [])
        self._partition_by = list(partition_by or [])
        self._expect_min_rows = expect_min_rows
        self._dependencies = tuple(dependencies)
        self._max_retries = max_retries
        self._timeout = timeout_seconds
        self._min_refresh = min_seconds_between_refreshes
        self._validate()

    @property
    def job_name(self) -> str:
        return self._name

    @property
    def dependencies(self):
        return self._dependencies

    @property
    def max_retries(self) -> int:
        return self._max_retries

    @property
    def timeout_seconds(self) -> Optional[int]:
        return self._timeout

    @property
    def min_seconds_between_refreshes(self) -> int:
        return self._min_refresh

    def run(self, ctx: JobContext) -> Optional[JobStatus]:
        from pyspark.sql import Observation

        df = self._source(ctx.spark)
        # Observation rides the write action itself: the rows-written
        # metric is collected by the SAME job that writes — at 100 TB a
        # separate count() would be a second full pass over the output.
        obs = Observation(f"{self._name}_refresh")
        if self._mode == "full" or not os.path.exists(self._target):
            out = df.observe(obs, F.count(F.lit(1)).alias("rows_written"))
            writer = out.write.mode("overwrite")
            if self._partition_by:
                writer = writer.partitionBy(*self._partition_by)
            writer.parquet(self._target)
            self.last_metrics = dict(obs.get)
            ctx.logger.info(
                f"[{self._name}] full refresh -> {self._target} "
                f"({self.last_metrics['rows_written']} rows)"
            )
        else:
            base = ctx.spark.read.parquet(self._target)
            merged = upsert(base, df.dropDuplicates(self._keys), self._keys)
            out = merged.observe(obs, F.count(F.lit(1)).alias("rows_written"))
            tmp = self._target + ".tmp"
            writer = out.write.mode("overwrite")
            if self._partition_by:
                writer = writer.partitionBy(*self._partition_by)
            writer.parquet(tmp)
            import shutil

            shutil.rmtree(self._target)
            os.rename(tmp, self._target)
            self.last_metrics = dict(obs.get)
            ctx.logger.info(
                f"[{self._name}] incremental upsert on {self._keys} "
                f"({self.last_metrics['rows_written']} rows)"
            )
        return JobStatus.success()

    def test(self, ctx: JobContext) -> List[SimpleTestResult]:
        out = ctx.spark.read.parquet(self._target)
        results = []
        n = out.count()
        results.append(
            SimpleTestResult(
                test_name=f"{self._name}: at least {self._expect_min_rows} rows",
                outcome=Result.success()
                if n >= self._expect_min_rows
                else Result.failure(f"only {n} rows"),
            )
        )
        if self._keys:
            dups = (
                out.groupBy(*self._keys)
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") > 1)
                .count()
            )
            results.append(
                SimpleTestResult(
                    test_name=f"{self._name}: unique on {self._keys}",
                    outcome=Result.success()
                    if dups == 0
                    else Result.failure(f"{dups} duplicated keys"),
                )
            )
        return results


class DataTestJob(SparkJobSpec):
    """Run-only-tests job: ``run`` is a no-op; ``checks`` are callables
    ``(SparkSession) -> SimpleTestResult`` evaluated after dependencies."""

    def __init__(
        self,
        *,
        name: str,
        checks: Sequence[Callable[[SparkSession], SimpleTestResult]],
        dependencies: Sequence[str] = (),
    ):
        self._name = name
        self._checks = list(checks)
        self._dependencies = tuple(dependencies)
        self._validate()

    @property
    def job_name(self) -> str:
        return self._name

    @property
    def dependencies(self):
        return self._dependencies

    def run(self, ctx: JobContext) -> Optional[JobStatus]:
        return JobStatus.success()

    def test(self, ctx: JobContext) -> List[SimpleTestResult]:
        return [check(ctx.spark) for check in self._checks]


def referential_check(
    child_path: str, parent_path: str, fk: str, pk: str, name: str
) -> Callable[[SparkSession], SimpleTestResult]:
    """Orphan-FK check as a DataTestJob check (left-anti join)."""

    def run(spark: SparkSession) -> SimpleTestResult:
        child = spark.read.parquet(child_path)
        parent = spark.read.parquet(parent_path)
        orphans = child.join(
            parent, child[fk] == parent[pk], how="left_anti"
        ).count()
        return SimpleTestResult(
            test_name=name,
            outcome=Result.success()
            if orphans == 0
            else Result.failure(f"{orphans} orphan rows"),
        )

    return run
