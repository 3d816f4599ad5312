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
    BooleanType,
    DoubleType,
    LongType,
    StringType,
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


# ---------------------------------------------------------------------------
# streaming CUSUM changepoint alarm (r8) — the online sibling of
# ev_changepoint_cusum
# ---------------------------------------------------------------------------

CUSUM_ALARM_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("n_obs", LongType(), False),
        StructField("s_pos_cents", LongType(), False),
        StructField("s_neg_cents", LongType(), False),
        StructField("alarmed", BooleanType(), False),
        StructField("alarm_n_obs", LongType(), True),
    ]
)

_CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("n_obs", LongType(), False),
        StructField("s_pos", LongType(), False),
        StructField("s_neg", LongType(), False),
        StructField("alarm_n", LongType(), False),  # 0 = not alarmed
    ]
)


def cusum_alarm_stream(
    stream: DataFrame, ref_cents: int, alarm_cents: int
) -> DataFrame:
    """Online two-sided CUSUM (Page 1954) per event type over a value
    stream, in INTEGER CENTS: S⁺ = max(0, S⁺ + (x − ref)),
    S⁻ = min(0, S⁻ + (x − ref)); the alarm latches at the first
    micro-batch observation where |S| crosses ``alarm_cents`` and the
    crossing index is remembered (once alarmed, always alarmed — the
    monitor's page-out is idempotent). The streaming sibling of the
    batch ev_changepoint_cusum: that one localizes a PAST level shift
    exactly; this one watches the live stream with O(1) state per key
    (four counters in the state store, sharded by event_type).

    Rows within a micro-batch are walked in (ts, event_id) order so a
    single-batch run is exactly the batch walk; across micro-batches
    the order is arrival order, which IS the online semantic.
    """

    def update(
        key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, sp, sn, alarm_n = state.get if state.exists else (0, 0, 0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        cents = (
            (batch["value"].fillna(0.0).astype("float64") * 100)
            .round()
            .astype("int64")
        )
        for c in cents:
            n += 1
            sp = max(0, sp + (int(c) - ref_cents))
            sn = min(0, sn + (int(c) - ref_cents))
            if alarm_n == 0 and (sp > alarm_cents or -sn > alarm_cents):
                alarm_n = n
        state.update((n, sp, sn, alarm_n))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_obs": [n],
                "s_pos_cents": [sp],
                "s_neg_cents": [sn],
                "alarmed": [alarm_n > 0],
                "alarm_n_obs": [alarm_n if alarm_n > 0 else None],
            }
        )

    return (
        stream.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=CUSUM_ALARM_SCHEMA,
            stateStructType=_CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
