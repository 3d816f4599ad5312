"""Custom stateful streaming: per-key running aggregates with
``applyInPandasWithState``.

This is the escape hatch for stream semantics Spark's built-in
windows can't express (running lifetime totals, custom session logic,
online feature state). State lives in Spark's state store per key —
checkpointed, partitioned by the grouping key, recovered on restart —
so the operator scales exactly like a streaming groupBy: one shuffle
on the key, state sharded across executors.

Scale notes: keep per-key state O(1) (here: two counters). Unbounded
per-key state (e.g. a list of events) is the streaming OOM. Use
timeouts (``GroupStateTimeout``) to expire idle keys when the key
space is unbounded.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)


def _update_totals(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Lifetime per-user event count + value sum, updated every
    micro-batch (emits one row per user per batch the user appears in)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class RunningTotalsProcessor(StatefulProcessor):
    """``transformWithStateInPandas`` processor — Spark 4's successor
    to applyInPandasWithState, same per-user lifetime totals.

    Why it's the forward path: state is a typed, named handle
    (``getValueState`` with a schema, optional TTL) instead of one
    opaque tuple; processors can hold several state variables, list/
    map state, and register timers. Scale properties are unchanged —
    state partitioned by key in the state store, one shuffle, O(1)
    per-key payload here.
    """

    def init(self, handle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events long, total_value double"
        )

    def handleInputRows(self, key, rows, timerValues):
        prior = self._totals.get()
        n, total = prior if prior is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """RunningTotalsProcessor wired through transformWithStateInPandas
    (update mode, no event-time timers). Emits the same rows as
    :func:`running_user_totals` — the pytest asserts both converge to
    the batch aggregate.

    Deployment notes: the operator requires the RocksDB state store
    provider (``spark.sql.streaming.stateStore.providerClass``) and a
    working ``google.protobuf`` on the driver (the TWS state-server
    protocol); the pytest gates on the latter like the JDBC/Kafka
    connector tests."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
