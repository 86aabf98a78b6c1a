"""Streaming rolling-window anomaly detection.

The streaming twin of ``queries.analytics.ev_anomaly_zscore``: per-key
ring buffer of the last N values (the reference's last-N sample-buffer
pattern, mqtt_publish.js:80-83, turned into a detector), each incoming
event scored against the buffer of its predecessors — so a row's score
never depends on itself, exactly like the batch query's
``ROWS 20 PRECEDING .. 1 PRECEDING`` frame.

Scale shape: state is a bounded array (RING_N doubles) per key, keyed on
the stream's natural high-cardinality key — constant memory per device,
one shuffle, identical to the session operator's distribution.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RING_N = 20
MIN_PREV = 10
Z_THRESHOLD = 3.0

_OUT_SCHEMA = "event_id long, user_id long, value double, zscore double"
_STATE_SCHEMA = "vals array<double>"


def anomaly_scores_stream(events: DataFrame) -> DataFrame:
    """``(event_id, user_id, ts_ms, value)`` stream → anomalous rows
    ``(event_id, user_id, value, zscore)``.

    Within a micro-batch, rows are processed in (ts_ms, event_id) order,
    so a single-batch replay of a time-ordered log reproduces the batch
    query bit-for-bit (asserted in tests). Sample standard deviation
    over the buffer matches ``stddev_samp``.
    """

    def score(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        buf: list[float] = list(state.get[0]) if state.exists else []
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_ms", "event_id"])
            for r in pdf.itertuples(index=False):
                n = len(buf)
                if n >= MIN_PREV:
                    mu = sum(buf) / n
                    sd = math.sqrt(
                        sum((x - mu) ** 2 for x in buf) / (n - 1)
                    )
                    if sd > 1e-9:
                        zv = (float(r.value) - mu) / sd
                        if abs(zv) > Z_THRESHOLD:
                            out.append(
                                (int(r.event_id), int(key[0]), float(r.value), round(zv, 2))
                            )
                buf.append(float(r.value))
                if len(buf) > RING_N:
                    buf.pop(0)
        state.update((buf,))
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "value", "zscore"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        score,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
