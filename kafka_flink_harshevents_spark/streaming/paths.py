"""Streaming session-path mining — the online twin of the batch
``ev_session_paths`` catalog entry: per user, accumulate the ordered
event-type path of the CURRENT session in keyed state; a gap larger
than the inactivity threshold (or a processing-time TTL for users that
go silent) closes the session and emits one row with its path — the
live feed a user-flow / Sankey dashboard consumes, without rescanning
history.

Parity contract (tested): for per-key event-time-ordered delivery, the
closed sessions' (path, n_events, start, end) match the batch
sessionize + path derivation row-for-row — same gap, same
``(tms, event_id)`` ordering inside a micro-batch (stable sort), same
8-step truncation. A CROSS-batch out-of-order event cannot be spliced
into an already-built path string, so it is dropped and COUNTED
(``n_late_dropped`` on the session's closing row) — the same
late-data accounting convention as ``locf_resample_stream``.

Scale shape: one shuffle on user_id; state per key is one (start,
last, count, capped path string) tuple — bounded by ``max_steps``,
never by stream length; closed sessions leave state immediately and
the TTL reaps idle users, so state ∝ concurrently active users. The
downstream per-path count is a plain streaming aggregation over the
emitted rows.

Operational note: ``ProcessingTimeTimeout`` keeps the engine
scheduling timer batches while idle, so ``processAllAvailable()``
never settles — poll ``lastProgress`` instead (the
``streaming/sessions.py`` caveat; see tests' ``_drain``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PATH_GAP_MS = 7_200_000  # the batch ev_session_paths gap
PATH_MAX_STEPS = 8

_OUT_SCHEMA = (
    "user_id long, path string, n_events long, start_ms long, "
    "end_ms long, closed_by string, n_late_dropped long"
)
_STATE_SCHEMA = (
    "start_ms long, last_ms long, n long, path string, n_late long"
)
_OUT_COLS = [
    "user_id", "path", "n_events", "start_ms", "end_ms", "closed_by",
    "n_late_dropped",
]


def _closed(user, path, n, start, last, why, late):
    return {
        "user_id": int(user),
        "path": path,
        "n_events": int(n),
        "start_ms": int(start),
        "end_ms": int(last),
        "closed_by": why,
        "n_late_dropped": int(late),
    }


def _make_paths_fn(gap_ms: int, max_steps: int, ttl_ms: int):
    def fn(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        out: list[dict] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n, path, late = state.get
                state.remove()
                out.append(
                    _closed(user, path, n, start, last, "timeout", late)
                )
            yield pd.DataFrame(out, columns=_OUT_COLS)
            return

        ev = pd.concat(list(pdf_iter), ignore_index=True)
        # stable sort pins ties to (tms, event_id) — the batch total order
        ev = ev.sort_values(["tms", "event_id"], kind="stable")

        start, last, n, path, late = (
            state.get if state.exists else (None, None, 0, "", 0)
        )
        for r in ev.itertuples(index=False):
            tms, et = int(r.tms), str(r.event_type)
            if start is None:
                start = last = tms
                n, path = 1, et
            elif tms < last:
                late += 1  # cross-batch stragglers: counted, not spliced
            elif tms - last > gap_ms:
                out.append(_closed(user, path, n, start, last, "gap", late))
                start = last = tms
                n, path, late = 1, et, 0
            else:
                last = tms
                n += 1
                if n <= max_steps:
                    path = f"{path}>{et}"
        if start is not None:
            state.update((int(start), int(last), int(n), path, int(late)))
            state.setTimeoutDuration(ttl_ms)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(out, columns=_OUT_COLS)

    return fn


def session_paths_stream(
    events: DataFrame,
    gap_ms: int = PATH_GAP_MS,
    max_steps: int = PATH_MAX_STEPS,
    ttl_ms: int = 60_000,
) -> DataFrame:
    """Streaming DF with ``user_id``, ``event_id``, ``event_type``,
    ``tms`` (epoch ms) → append stream of closed-session path rows."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_paths_fn(gap_ms, max_steps, ttl_ms),
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
