"""Streaming gap-fill resample (LOCF) — the continuous twin of the
batch ``ev_locf_resample`` entry (hypertable ``time_bucket_gapfill`` +
``locf`` shape).

A monitoring pipeline doesn't re-run the batch gap-fill; it carries the
last observation forward AS data arrives: per user, state is the last
emitted hour and its value, and every incoming event (a) revises the
current hour's row when a later-in-hour observation lands, or (b)
advances the grid, emitting one carried row per silent hour between the
last emitted hour and the event's hour. Emission is ``update`` mode
keyed by (user, hour) — sinks keep the latest revision per grid cell,
the same convention as the heavy-hitter / KMV snapshots.

Ordering contract: within a micro-batch rows are processed in event-time
order; an event that produces no grid revision — OLDER than the user's
last emitted hour, or in the current hour but older than the revision
already emitted — is counted in ``n_late_dropped`` (state) and emits
nothing: the stream has already published that part of the grid (the
watermark assumption every streaming gap-fill makes; the batch query,
which sees all data at once, has no such cut). The counter therefore
accounts for EVERY dropped observation: each ingested event either
emits an observed grid revision or increments n_late_dropped. The batch-parity test feeds
time-ordered waves, where stream and batch grids agree row-for-row.

Scale shape: one shuffle on user_id into the state store; state is a
single (hour, value, ts, late-counter) row per user; per-batch work is
batch-sized plus the emitted gap rows (∝ silent hours covered, the
output's own size — nothing is quadratic).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOUR_MS = 3_600_000

_OUT_SCHEMA = (
    "user_id long, hour_ms long, value_locf double, observed long,"
    " src_ts_ms long"
)
_STATE_SCHEMA = (
    "last_hr_ms long, last_val double, last_ts_ms long, n_late_dropped long"
)


def _locf_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_hr, last_val, last_ts, n_late = state.get
    else:
        last_hr, last_val, last_ts, n_late = None, None, None, 0
    rows: list[tuple[int, int, float, int, int]] = []
    # kind="stable": the default quicksort is NOT stable, so tied
    # timestamps would process in arbitrary order — a checkpoint replay
    # could then emit a DIFFERENT revision for the tied hour (caught by
    # the hypothesis state-machine property test). Stable sort pins
    # ties to arrival order.
    events = pd.concat(list(pdfs), ignore_index=True).sort_values(
        "ts_ms", kind="stable"
    )
    for r in events.itertuples(index=False):
        ts, val = int(r.ts_ms), float(r.value)
        hr = (ts // HOUR_MS) * HOUR_MS
        if last_hr is None:
            rows.append((int(key[0]), hr, val, 1, ts))
            last_hr, last_val, last_ts = hr, val, ts
        elif hr == last_hr:
            if ts >= last_ts:
                last_val, last_ts = val, ts
                rows.append((int(key[0]), hr, val, 1, ts))
            else:
                # in-hour-but-older than the last emitted revision: the
                # grid cell keeps the max-ts pick (batch max_by twin),
                # and the drop is COUNTED — n_late_dropped accounts for
                # every event that produced no grid revision, not only
                # those older than the last emitted hour.
                n_late += 1
        elif hr > last_hr:
            g = last_hr + HOUR_MS
            while g < hr:
                rows.append((int(key[0]), g, last_val, 0, last_ts))
                g += HOUR_MS
            rows.append((int(key[0]), hr, val, 1, ts))
            last_hr, last_val, last_ts = hr, val, ts
        else:
            n_late += 1
    state.update((last_hr, last_val, last_ts, n_late))
    if rows:
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id", "hour_ms", "value_locf", "observed", "src_ts_ms"
            ],
        )


def locf_resample_stream(events: DataFrame) -> DataFrame:
    """``(user_id, ts, value)`` stream → update stream of hourly grid
    cells ``(user_id, hour_ms, value_locf, observed, src_ts_ms)``; take
    the revision with the greatest ``src_ts_ms`` per (user_id, hour_ms)
    for the materialized grid (the batch query's max_by(value, ts)
    pick, made explicit for unordered sinks)."""
    keyed = events.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("value").cast("double").alias("value"),
        # An unparseable ts casts to NULL (NaN in the Arrow batch) and
        # would poison-pill the micro-batch (int(NaN) raises, checkpoint
        # retry replays it forever); a NULL value would be carried as NaN
        # into every later gap row. Drop both HERE, JVM-side.
    ).filter(F.col("ts_ms").isNotNull() & F.col("value").isNotNull())
    return keyed.groupBy("user_id").applyInPandasWithState(
        _locf_update,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
