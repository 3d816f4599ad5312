"""Custom Python DataSource: deterministic synthetic events.

Spark 4's Python DataSource API is the native extension point for
reading systems that aren't lake files — the Spark analog of the
reference's user-database sources behind its unit-of-work
(lime_etl/domain/job_spec.py jobs read arbitrary engines). This one
generates the ``events`` star-schema table on the fly:

- **partitioned**: ``partitions()`` splits the row range, so the scan
  parallelizes like any file scan — each task generates its slice.
- **Arrow-batched**: ``read`` yields ``pyarrow.RecordBatch`` built from
  vectorized numpy, not per-row Python tuples — the same Arrow lane
  Pandas UDFs use, so generation throughput is batch-, not row-bound.
- **deterministic**: seeded per partition; two reads of the same
  options are byte-identical, which makes it usable in tests and
  benchmarks (a data fixture with no files to ship).

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthevents")
          .option("rows", 100_000).option("partitions", 32).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros


class SyntheticEventsDataSource(DataSource):
    """`format("synthevents")` — options: rows, partitions, seed,
    n_users, start_us (event-time origin, micros)."""

    @classmethod
    def name(cls) -> str:
        return "synthevents"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 10_000))
        self.parts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 7))
        self.n_users = int(options.get("n_users", 1_000))
        self.start_us = int(options.get("start_us", _EPOCH_2024_US))

    def partitions(self):  # type: ignore[override]
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):  # type: ignore[override]
        import numpy as np
        import pyarrow as pa

        i = int(partition.value)
        base, rem = divmod(self.rows, self.parts)
        n = base + (1 if i < rem else 0)
        offset = i * base + min(i, rem)
        if n == 0:
            return
        rng = np.random.RandomState(self.seed * 1_000_003 + i)

        event_id = np.arange(offset, offset + n, dtype=np.int64)
        # event time: one event per second across the id range, with
        # sub-second jitter — monotone-ish like a real ingest
        ts_us = (
            self.start_us
            + event_id * 1_000_000
            + rng.randint(0, 1_000_000, size=n).astype(np.int64)
        )
        user_id = rng.randint(0, self.n_users, size=n).astype(np.int64)
        type_idx = rng.choice(len(EVENT_TYPES), size=n, p=(0.5, 0.25, 0.1, 0.05, 0.1))
        value = np.round(rng.exponential(scale=40.0, size=n), 2)
        types = np.array(EVENT_TYPES)[type_idx]
        props = np.full(n, '{"src":"synth","p":%d}' % i, dtype=object)

        yield pa.RecordBatch.from_arrays(
            [
                pa.array(event_id, type=pa.int64()),
                pa.array(ts_us, type=pa.timestamp("us")),
                pa.array(user_id, type=pa.int64()),
                pa.array(types, type=pa.string()),
                pa.array(value, type=pa.float64()),
                pa.array(props, type=pa.string()),
            ],
            names=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the synthevents format."""
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the synthevents source (SimpleDataSourceStreamReader).

    Offsets are row indices (``{"row": n}``), so the stream is exactly
    replayable: ``readBetweenOffsets`` regenerates any committed batch
    byte-identically for recovery, which is the contract a streaming
    source must honor for end-to-end exactly-once. Each micro-batch
    emits ``rows_per_batch`` rows continuing the deterministic
    sequence. The simple reader yields driver-side tuples — right for
    tests and protocol demos; a partition-parallel
    ``DataSourceStreamReader`` is the scale path.
    """

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 7))
        self.n_users = int(options.get("n_users", 1_000))
        self.start_us = int(options.get("start_us", _EPOCH_2024_US))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _gen(self, lo: int, hi: int):
        # returns a LIST: the harness prefetch cache copy.copy()s the
        # iterator for replay, which a generator cannot survive
        import datetime

        import numpy as np

        n = hi - lo
        if n <= 0:
            return []
        rng = np.random.RandomState(self.seed * 1_000_003 + lo)
        event_id = np.arange(lo, hi, dtype=np.int64)
        ts_us = (
            self.start_us
            + event_id * 1_000_000
            + rng.randint(0, 1_000_000, size=n).astype(np.int64)
        )
        user_id = rng.randint(0, self.n_users, size=n)
        type_idx = rng.choice(len(EVENT_TYPES), size=n, p=(0.5, 0.25, 0.1, 0.05, 0.1))
        value = np.round(rng.exponential(scale=40.0, size=n), 2)
        return [
            (
                int(event_id[j]),
                datetime.datetime.utcfromtimestamp(ts_us[j] / 1e6),
                int(user_id[j]),
                EVENT_TYPES[type_idx[j]],
                float(value[j]),
                '{"src":"synthstream"}',
            )
            for j in range(n)
        ]

    def read(self, start: dict):
        lo = int(start["row"])
        hi = lo + self.rows_per_batch
        return iter(self._gen(lo, hi)), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._gen(int(start["row"]), int(end["row"]))

