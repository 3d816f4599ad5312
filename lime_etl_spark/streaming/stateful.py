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

import numpy as np
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


def _cusum_advance(
    d: np.ndarray, n: int, sp: int, sn: int, alarm_n: int, alarm_cents: int
) -> Tuple[int, int, int, int]:
    """Advance one key's two-sided CUSUM state over a batch of int64
    deviations, vectorized: with c_t = seed + Σ_{j≤t} d_j, the one-
    sided recursion S⁺_t = max(0, S⁺_{t-1} + d_t) has the exact prefix
    form S⁺_t = max(0, c_t − min(0, min_{j<t} c_j)) (and S⁻ mirrored
    with a running max) — bit-identical to the sequential walk, pinned
    against it in pytest. Alarm latches at the first crossing index."""
    if not d.size:
        return n, sp, sn, alarm_n
    c_p = sp + np.cumsum(d)
    prev_min = np.minimum(
        0, np.minimum.accumulate(np.concatenate(([np.iinfo(np.int64).max], c_p[:-1])))
    )
    sp_path = np.maximum(0, c_p - prev_min)
    c_n = sn + np.cumsum(d)
    prev_max = np.maximum(
        0, np.maximum.accumulate(np.concatenate(([np.iinfo(np.int64).min], c_n[:-1])))
    )
    sn_path = np.minimum(0, c_n - prev_max)
    if alarm_n == 0:
        hit = (sp_path > alarm_cents) | (-sn_path > alarm_cents)
        if hit.any():
            alarm_n = n + int(np.argmax(hit)) + 1
    return n + int(d.size), int(sp_path[-1]), int(sn_path[-1]), alarm_n


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

    Cents convention (documented, deliberate): cents = the IEEE-double
    product value×100 rounded half-to-even — the same int(round(v*100))
    a monitoring agent computes, pinned by the pytest replay; the batch
    money AGGREGATES use exact decimal, but this monitor quantizes each
    observation independently so there is no sum to keep exact. A NULL
    value counts as a zero-cent observation (a full drift of −ref per
    null, also deliberate): the monitor treats a missing reading as
    "no revenue", so a burst of nulls pulls S⁻ down and pages, rather
    than being silently invisible to the alarm.

    The per-batch walk is the vectorized prefix form of Page's
    recursion, not a Python loop: with c_t = seed + Σ_{j≤t} d_j,
    S⁺_t = max(0, c_t − min(0, min_{j<t} c_j)) and S⁻ mirrored with a
    running max — exact int64, identical to the sequential recursion.
    """

    def update(
        key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, sp, sn, alarm_n = state.get if state.exists else (0, 0, 0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        d = (
            (batch["value"].fillna(0.0).astype("float64") * 100)
            .round()
            .astype("int64")
            .to_numpy()
            - ref_cents
        )
        n, sp, sn, alarm_n = _cusum_advance(d, n, sp, sn, alarm_n, alarm_cents)
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


# ---------------------------------------------------------------------------
# streaming SPRT gate — the online twin of the batch ev_sprt_gate
# ---------------------------------------------------------------------------

SPRT_GATE_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("n_obs", LongType(), False),
        StructField("llr_e6", LongType(), False),
        StructField("decision", StringType(), False),
        StructField("n_at_decision", LongType(), True),
    ]
)

_SPRT_STATE_SCHEMA = StructType(
    [
        StructField("n_obs", LongType(), False),
        StructField("llr_e6", LongType(), False),
        StructField("decision_n", LongType(), False),  # 0 = still open
        StructField("decision_llr", LongType(), False),
    ]
)


def sprt_gate_stream(
    stream: DataFrame,
    cut: float,
    inc_pos_e6: int,
    inc_neg_e6: int,
    upper_e6: int,
    lower_e6: int,
) -> DataFrame:
    """Online Wald SPRT per event type over a value stream — the
    streaming twin of the batch ev_sprt_gate with the SAME integer
    discipline: the two per-observation LLR increments and the Wald
    boundaries arrive as pre-floored 1e-6-grid int64 literals (the
    caller computes them ONCE, exactly as the batch op inlines them),
    so the cumulative path and the crossing test are pure int64 in the
    state store. The decision latches at the first boundary crossing
    (accept_h1 at ≥ upper, accept_h0 at ≤ lower) and the gate keeps
    reporting the latched decision — a monitor's page-out is
    idempotent, like cusum_alarm_stream.

    Per-batch work is the vectorized cumsum prefix (the SPRT path has
    no clamp, so it is literally one np.cumsum + one np.argmax — no
    per-row Python). Rows within a micro-batch are walked in
    (ts, event_id) order; across micro-batches arrival order IS the
    online semantic. O(1) state per key: four counters."""

    def update(
        key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, llr, dec_n, dec_llr = state.get if state.exists else (0, 0, 0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        if len(batch):
            vals = batch["value"].astype("float64").to_numpy()
            d = np.where(vals > cut, inc_pos_e6, inc_neg_e6).astype(np.int64)
            path = llr + np.cumsum(d)
            if dec_n == 0:
                hit = (path >= upper_e6) | (path <= lower_e6)
                if hit.any():
                    ix = int(np.argmax(hit))
                    dec_n = n + ix + 1
                    dec_llr = int(path[ix])
            n += int(d.size)
            llr = int(path[-1])
        state.update((n, llr, dec_n, dec_llr))
        decision = (
            "continue"
            if dec_n == 0
            else ("accept_h1" if dec_llr >= upper_e6 else "accept_h0")
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_obs": [n],
                "llr_e6": [llr],
                "decision": [decision],
                "n_at_decision": [dec_n if dec_n > 0 else None],
            }
        )

    return (
        stream.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=SPRT_GATE_SCHEMA,
            stateStructType=_SPRT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
