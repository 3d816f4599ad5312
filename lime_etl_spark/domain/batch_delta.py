"""Batch-over-batch health delta (reference lime_etl/domain/batch_delta.py).

Set algebra over broken jobs: newly broken = current − previous,
newly fixed = previous − current; with no previous run both collapse
to the current broken set (reference batch_delta.py:21-32).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Set

from lime_etl_spark.domain.statuses import BatchStatus


@dataclass(frozen=True)
class BatchDelta:
    current: BatchStatus
    previous: Optional[BatchStatus]

    @property
    def common_jobs(self) -> Set[str]:
        if self.previous is None:
            return set()
        return self.previous.job_names & self.current.job_names

    @property
    def newly_broken_jobs(self) -> Set[str]:
        if self.previous is None:
            return set(self.current.broken_jobs)
        return self.current.broken_jobs - self.previous.broken_jobs

    @property
    def newly_fixed_jobs(self) -> Set[str]:
        if self.previous is None:
            return set()
        return self.previous.broken_jobs - self.current.broken_jobs

    def __str__(self) -> str:
        return (
            f"broken: {sorted(self.current.broken_jobs)}; "
            f"newly broken: {sorted(self.newly_broken_jobs)}; "
            f"newly fixed: {sorted(self.newly_fixed_jobs)}"
        )
