"""Streaming SCD2 maintenance — incremental history-table construction
from a CDC stream, the continuous twin of the batch `ev_scd2_intervals`
entry (queries/events.py).

A MERGE-based lakehouse sink closes the current version and opens a new
one on every change; this operator does exactly that as stateful
streaming: state per (user_id, event_type) is the OPEN version
(valid_from, ordering key, value, version number), and each arriving
change EMITS the version it closes — so the output log is append-only
(closed intervals are immutable once the next change arrives, the same
reason `trending_counts_stream` can append closed hours) and the open
version is always the state itself.

Ordering contract: rows within a micro-batch are applied in the batch
twin's total order (zero-padded (ts, event_id) — ties cannot reorder);
ACROSS batches the stream maintains forward-only history: a row older
than the open version cannot retroactively splice into intervals whose
successors were already emitted, so it is dropped, and the drop is
COUNTED in state (`n_late_dropped` rides every subsequent emission) —
the accounting contract ADVICE r3 established for LOCF. Replaying a
time-ordered log therefore reproduces the batch entry's closed rows
exactly (`test_streaming_scd2_matches_batch`), late rows are an
explicit, observable divergence, and the reorder-tolerant form is the
batch twin.

Scale shape: one shuffle on (user_id, event_type); state is ONE row per
live key regardless of history length (the history lives in the sink,
not the store).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from decimal import ROUND_HALF_UP, Decimal


def _round_half_up(x: float) -> float:
    """Round like Spark's ``F.round(col, 2)`` on doubles (BigDecimal of
    the shortest decimal repr, then HALF_UP) — Python's built-in
    ``round`` is half-EVEN and diverges on .xx5 midpoints (2.125 →
    2.12 vs Spark's 2.13), which would break the documented exact
    batch parity."""
    return float(Decimal(repr(x)).quantize(Decimal("0.01"), ROUND_HALF_UP))


_OUT_SCHEMA = (
    "user_id long, event_type string, version long,"
    " valid_from_ms long, valid_to_ms long, value double,"
    " n_late_dropped long"
)
_STATE_SCHEMA = (
    "open_from long, open_event_id long, open_value double,"
    " version long, n_late_dropped long"
)


def _scd2_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    open_from, open_eid, open_val, version, late = (
        state.get if state.exists else (None, None, None, 0, 0)
    )
    out: list[tuple] = []
    rows = []
    for pdf in pdfs:
        rows.extend(
            zip(pdf["tms"], pdf["event_id"], pdf["value"])
        )
    rows.sort(key=lambda r: (int(r[0]), int(r[1])))
    for tms, eid, val in rows:
        tms, eid = int(tms), int(eid)
        if open_from is not None and (tms, eid) <= (open_from, open_eid):
            late += 1
            continue
        if open_from is not None:
            out.append(
                (
                    int(key[0]),
                    str(key[1]),
                    version,
                    open_from,
                    tms,
                    _round_half_up(float(open_val)),
                    late,
                )
            )
        version += 1
        open_from, open_eid, open_val = tms, eid, float(val)
    state.update((open_from, open_eid, open_val, version, late))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "event_type", "version", "valid_from_ms",
                "valid_to_ms", "value", "n_late_dropped",
            ],
        )


def scd2_stream(events: DataFrame) -> DataFrame:
    """``(user_id, event_type, event_id, value, ts)`` stream → append
    stream of CLOSED version intervals (the open version per key lives
    in state). NULL-timestamp rows are dropped JVM-side (poison-pill
    hygiene, the `kmv_distinct_stream` convention)."""
    prepared = events.select(
        "user_id",
        "event_type",
        "event_id",
        F.col("value").cast("double").alias("value"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("tms"),
    ).filter(F.col("tms").isNotNull())
    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        _scd2_update,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
