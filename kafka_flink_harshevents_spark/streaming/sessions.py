"""O9 — stateful session consolidation (the reference's one true
stateful operator; SURVEY.md §2.10).

Semantics ported from ``kafkaConsumer.js:278-347`` (Redis pointer with
``EX 300`` + Mongo doc update-in-place):

- ``action="touch"``: active session → extend ``end_timestamp`` and
  refresh the 300 s TTL (kafkaConsumer.js:304-312); none → open a session
  with ``start = end = ts`` (kafkaConsumer.js:322-335).
- ``action="clear"``: the Redis pointer is deleted and the doc keeps its
  last ``end_timestamp`` (kafkaConsumer.js:340-347) — here the session is
  finalized and emitted.
- TTL expiry (Redis ``EX``): session ends by inactivity — here a
  processing-time timeout fires and emits the final row.
- unknown actions are ignored (F8, kafkaConsumer.js:349).

State lives in Spark's StateStore keyed by ``device_uuid`` (RocksDB
provider at scale) instead of an external Redis — the state shuffle on
``device_uuid`` is the only wide operation in the pipeline. The batch
twin with identical output is
``operators.sessions.sessionize_batch`` (lag/gap/cumsum), which the
DuckDB oracle can run.

Operational note: with ``ProcessingTimeTimeout`` the micro-batch engine
continuously schedules timer-evaluation batches even when the source is
idle (that is how TTLs fire without new data). Consequently
``StreamingQuery.processAllAvailable()`` never settles on queries built
from this operator — callers should poll ``lastProgress`` instead (see
tests/test_streaming.py::_drain).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

try:  # Spark ≥ 4.0 transformWithState surface (SURVEY §2.10/§7.5)
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    # The transformWithState Python worker speaks a protobuf-framed state
    # protocol; without google.protobuf the driver worker crashes at
    # startup, so "auto" must fall back to applyInPandasWithState.
    import importlib.util

    _HAS_TWS = importlib.util.find_spec("google.protobuf") is not None
except ImportError:  # pragma: no cover — older Spark
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False

from kafka_flink_harshevents_spark import schemas
from kafka_flink_harshevents_spark.operators.sessions import SESSION_TTL_SECONDS

_OUT_COLS = [f.name for f in schemas.SESSION_ROW.fields]
_STATE_SCHEMA = "start_timestamp LONG, end_timestamp LONG, n_touches LONG"


def _final_row(device: str, start: int, end: int, n: int) -> dict[str, Any]:
    return {
        "event_type": "device_status_session",
        "status_type": "cable-unplugged",
        "device_uuid": device,
        "start_timestamp": start,
        "end_timestamp": end,
        # the reference also bumps the doc's `timestamp` to the last touch
        # (kafkaConsumer.js:304-307)
        "timestamp": end,
        "n_touches": n,
    }


def _make_session_fn(ttl_ms: int):
    def fn(
        key: tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        device = key[0]
        out: list[dict[str, Any]] = []

        if state.hasTimedOut:
            if state.exists:
                start, end, n = state.get
                state.remove()
                out.append(_final_row(device, start, end, n))
            yield pd.DataFrame(out, columns=_OUT_COLS)
            return

        events = pd.concat(list(pdf_iter), ignore_index=True)
        events = events.sort_values("timestamp", kind="stable")

        start, end, n = state.get if state.exists else (None, None, 0)
        for action, ts in zip(events["action"], events["timestamp"]):
            if action == "touch":
                ts = int(ts)
                if start is None:
                    start = end = ts
                    n = 1
                else:
                    end = max(end, ts)
                    n += 1
            elif action == "clear" and start is not None:
                out.append(_final_row(device, start, end, n))
                start, end, n = None, None, 0
            # unknown action: log-and-ignore in the reference (F8)

        if start is not None:
            state.update((int(start), int(end), int(n)))
            state.setTimeoutDuration(ttl_ms)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(out, columns=_OUT_COLS)

    return fn


class _SessionProcessor(StatefulProcessor):
    """O9 on Spark 4's ``transformWithStateInPandas``: a ``ValueState``
    plus EXPLICIT processing-time timers replace the legacy GroupState
    timeout — same touch/extend/clear/TTL machine as ``_make_session_fn``
    (kafkaConsumer.js:278-347), but on the API that also offers
    multiple named states, initial state, and schema evolution.

    Timer discipline: every state update re-arms a single TTL timer
    (delete-then-register), mirroring Redis ``SET ... EX`` refreshing the
    expiry on each touch (kafkaConsumer.js:304-312)."""

    def __init__(self, ttl_ms: int) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._handle = handle
        self._session = handle.getValueState("session", _STATE_SCHEMA)

    def _rearm_timer(self, now_ms: int) -> None:
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        self._handle.registerTimer(now_ms + self._ttl_ms)

    def _disarm_timers(self) -> None:
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: "TimerValues",
    ) -> Iterator[pd.DataFrame]:
        device = key[0]
        out: list[dict[str, Any]] = []
        events = pd.concat(list(rows), ignore_index=True)
        events = events.sort_values("timestamp", kind="stable")

        cur = self._session.get() if self._session.exists() else None
        start, end, n = (int(cur[0]), int(cur[1]), int(cur[2])) if cur else (None, None, 0)
        for action, ts in zip(events["action"], events["timestamp"]):
            if action == "touch":
                ts = int(ts)
                if start is None:
                    start = end = ts
                    n = 1
                else:
                    end = max(end, ts)
                    n += 1
            elif action == "clear" and start is not None:
                out.append(_final_row(device, start, end, n))
                start, end, n = None, None, 0
            # unknown action: log-and-ignore in the reference (F8)

        if start is not None:
            self._session.update((int(start), int(end), int(n)))
            self._rearm_timer(timerValues.getCurrentProcessingTimeInMs())
        else:
            if cur is not None:
                self._session.clear()
            self._disarm_timers()
        yield pd.DataFrame(out, columns=_OUT_COLS)

    def handleExpiredTimer(
        self,
        key: Any,
        timerValues: "TimerValues",
        expiredTimerInfo: "ExpiredTimerInfo",
    ) -> Iterator[pd.DataFrame]:
        out: list[dict[str, Any]] = []
        if self._session.exists():
            s = self._session.get()
            self._session.clear()
            out.append(_final_row(key[0], int(s[0]), int(s[1]), int(s[2])))
        yield pd.DataFrame(out, columns=_OUT_COLS)

    def close(self) -> None:
        pass


_PROGRESS_COLS = [f.name for f in schemas.SESSION_PROGRESS_ROW.fields]


def _progress_row(
    device: str, start: int, end: int, n: int, is_open: bool
) -> dict[str, Any]:
    return {**_final_row(device, start, end, n), "is_open": is_open}


def _make_progress_fn(ttl_ms: int):
    """Update-mode twin of ``_make_session_fn``: after each micro-batch
    that touches a device, emit the CURRENT session doc (start, growing
    end, n_touches, is_open=true) — the observable equivalent of the
    reference consumer's update-in-place Mongo doc
    (kafkaConsumer.js:304-318). clear/TTL emit the final doc with
    is_open=false, identical values to the append-mode operator."""

    def fn(
        key: tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        device = key[0]
        out: list[dict[str, Any]] = []

        if state.hasTimedOut:
            if state.exists:
                start, end, n = state.get
                state.remove()
                out.append(_progress_row(device, start, end, n, False))
            yield pd.DataFrame(out, columns=_PROGRESS_COLS)
            return

        events = pd.concat(list(pdf_iter), ignore_index=True)
        events = events.sort_values("timestamp", kind="stable")

        start, end, n = state.get if state.exists else (None, None, 0)
        touched = False
        for action, ts in zip(events["action"], events["timestamp"]):
            if action == "touch":
                ts = int(ts)
                if start is None:
                    start = end = ts
                    n = 1
                else:
                    end = max(end, ts)
                    n += 1
                touched = True
            elif action == "clear" and start is not None:
                out.append(_progress_row(device, start, end, n, False))
                start, end, n = None, None, 0
                touched = False

        if start is not None:
            state.update((int(start), int(end), int(n)))
            state.setTimeoutDuration(ttl_ms)
            if touched:
                out.append(_progress_row(device, start, end, n, True))
        elif state.exists:
            state.remove()
        yield pd.DataFrame(out, columns=_PROGRESS_COLS)

    return fn


def status_session_progress(
    status_events: DataFrame,
    ttl_seconds: int = SESSION_TTL_SECONDS,
) -> DataFrame:
    """K4-parity in-progress session view: one emission per micro-batch
    per touched device showing the growing session, plus a closing
    emission (is_open=false) on clear/TTL. Run in ``update`` output
    mode; the append-mode ``consolidate_status_sessions`` (final rows
    only) is unchanged and remains the exactly-once history."""
    touches = status_events.filter(
        F.col("status_type") == "cable-unplugged"
    ).select("device_uuid", "action", "timestamp")
    return touches.groupBy("device_uuid").applyInPandasWithState(
        _make_progress_fn(ttl_seconds * 1000),
        outputStructType=schemas.SESSION_PROGRESS_ROW,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def consolidate_status_sessions(
    status_events: DataFrame,
    ttl_seconds: int = SESSION_TTL_SECONDS,
    api: str = "auto",
) -> DataFrame:
    """Streaming session consolidation keyed by ``device_uuid``.

    Input: validated device-status events (``route_device_status``
    shape). Output: one finalized session row per session, emitted on
    ``clear`` or on TTL expiry. Only ``cable-unplugged`` is consolidated
    (F7, kafkaConsumer.js:273-276).

    ``api`` selects the stateful backend: ``"transformWithState"`` (the
    Spark 4 StatefulProcessor above — the default when available),
    ``"applyInPandasWithState"`` (the portable fallback), or ``"auto"``.
    Both produce identical output; the same tests run against each.
    """
    touches = status_events.filter(
        F.col("status_type") == "cable-unplugged"
    ).select("device_uuid", "action", "timestamp")
    use_tws = _HAS_TWS if api == "auto" else (api == "transformWithState")
    if use_tws:
        return touches.groupBy("device_uuid").transformWithStateInPandas(
            _SessionProcessor(ttl_seconds * 1000),
            outputStructType=schemas.SESSION_ROW,
            outputMode="append",
            timeMode="processingTime",
        )
    return touches.groupBy("device_uuid").applyInPandasWithState(
        _make_session_fn(ttl_seconds * 1000),
        outputStructType=schemas.SESSION_ROW,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
