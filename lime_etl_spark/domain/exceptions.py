"""Orchestration exceptions (reference lime_etl/domain/exceptions.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, FrozenSet


class LimeSparkError(Exception):
    pass


class InvalidBatch(LimeSparkError):
    pass


class BatchNotFound(LimeSparkError):
    pass


class DuplicateJobNames(LimeSparkError):
    def __init__(self, duplicates: Dict[str, int]):
        self.duplicates = duplicates
        dup = ", ".join(f"{name} (x{ct})" for name, ct in sorted(duplicates.items()))
        super().__init__(f"Duplicate job names in batch: {dup}")


@dataclass(frozen=True)
class JobDependencyIssue:
    """Per-job dependency problems (reference job_dependency_errors.py)."""

    job_name: str
    missing_dependencies: FrozenSet[str] = field(default_factory=frozenset)
    jobs_out_of_order: FrozenSet[str] = field(default_factory=frozenset)


class DependencyErrors(LimeSparkError):
    def __init__(self, issues: FrozenSet[JobDependencyIssue]):
        self.issues = issues
        parts = []
        for issue in sorted(issues, key=lambda i: i.job_name):
            if issue.missing_dependencies:
                parts.append(
                    f"[{issue.job_name}] missing dependencies: "
                    + ", ".join(sorted(issue.missing_dependencies))
                )
            if issue.jobs_out_of_order:
                parts.append(
                    f"[{issue.job_name}] depends on jobs that run after it: "
                    + ", ".join(sorted(issue.jobs_out_of_order))
                )
        super().__init__("; ".join(parts))


class JobTimedOut(LimeSparkError):
    pass
