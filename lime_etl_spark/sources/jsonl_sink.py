"""Custom Python DataSource WRITER: transactional JSON-lines sink.

The reader side of the Python DataSource API (sources/synthetic.py)
covers "read a system that isn't lake files"; this is the write half —
the Spark-native analog of the reference pushing job output into an
arbitrary user system (lime-etl jobs write wherever their
unit-of-work points). The shape here is the two-phase protocol every
custom sink must follow:

- ``write(iterator)`` runs per PARTITION on executors: stream rows
  out to a task-unique temp file (task id + attempt in the name, so
  speculative/retried attempts never collide) and return a
  ``WriterCommitMessage`` describing what was staged.
- ``commit(messages)`` runs ONCE on the driver only after every
  partition succeeded: atomically rename the staged files into place
  and write a ``_SUCCESS`` manifest with per-file row counts.
  ``abort()`` discards staged files — a half-failed job leaves no
  visible output (the same rename-commit discipline Spark's own
  FileOutputCommitter v1 uses).

Scale: each executor streams its partition to its own file (no
driver funnel, no collect); commit is driver-side metadata-only
(#files renames). JSONL because it's the lowest-common-denominator
feed format for downstream systems that can't read parquet; for lake
output you'd never use this — parquet writers with real statistics
exist. Rows are written with ``json.dumps(..., default=str)`` — this
sink targets string-/numeric-typed feeds.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, staged_path: str, rows: int) -> None:
        self.staged_path = staged_path
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires .option('path', ...)")
        self.overwrite = overwrite

    def write(self, iterator) -> JsonlCommitMessage:  # executor-side
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else uuid.uuid4().int % 10**9
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"part-{part:05d}-{attempt}.jsonl")
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlCommitMessage(staged, n)

    def commit(self, messages) -> None:  # driver-side, all tasks succeeded
        manifest = {}
        for m in messages:
            final = os.path.join(self.path, os.path.basename(m.staged_path))
            os.replace(m.staged_path, final)  # atomic on one filesystem
            manifest[os.path.basename(final)] = m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as f:
            json.dump({"files": manifest, "total_rows": sum(manifest.values())}, f)
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging) and not os.listdir(staging):
            os.rmdir(staging)

    def abort(self, messages) -> None:  # any task failed — leave nothing visible
        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


class JsonlSinkStreamWriter(DataSourceStreamWriter):
    """Streaming half of the sink: the same stage-then-rename protocol
    per MICRO-BATCH. Files commit under ``batch-{id}-part-*.jsonl``
    names, so a replayed micro-batch (restart between sink commit and
    checkpoint advance — the at-least-once window) OVERWRITES its own
    batch's files instead of duplicating rows: per-batch idempotence,
    which together with the engine's exactly-once offset tracking
    gives end-to-end exactly-once modulo rename atomicity. A
    ``_streaming_manifest.jsonl`` line per commit records (batch id,
    files, rows) — the downstream feed's consumption ledger."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires .option('path', ...)")

    def write(self, iterator) -> JsonlCommitMessage:  # executor-side
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else uuid.uuid4().int % 10**9
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"stream-{part:05d}-{attempt}.jsonl")
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlCommitMessage(staged, n)

    def commit(self, messages, batchId: int) -> None:  # driver-side
        manifest = {}
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"batch-{batchId}-part-{i:05d}.jsonl")
            os.replace(m.staged_path, final)
            manifest[os.path.basename(final)] = m.rows
        with open(
            os.path.join(self.path, "_streaming_manifest.jsonl"), "a", encoding="utf-8"
        ) as f:
            f.write(
                json.dumps(
                    {
                        "batch_id": batchId,
                        "files": manifest,
                        "rows": sum(manifest.values()),
                    }
                )
                + "\n"
            )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonlsink").option("path", d).save()`` for
    batch, ``df.writeStream.format("jsonlsink")`` for streaming.

    Local-filesystem staging/rename; on a real cluster the same
    protocol targets the sink system's transaction primitive (e.g.
    stage to a temp table, commit = atomic swap).
    """

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlSinkStreamWriter:
        return JsonlSinkStreamWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
