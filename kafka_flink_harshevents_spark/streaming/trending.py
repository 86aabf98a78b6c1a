"""Streaming trending top-N — the continuous twin of the batch
``ev_trending`` catalog query (the dashboard staple the reference's
chart sink approximates with per-type counters, kafkaConsumer.js:229-233).

Two stages, split exactly where Spark's streaming model wants them:

- ``trending_counts_stream``: event-time tumbling-hour counts per
  (window, event_type) under a watermark — the STATEFUL part, a
  windowed aggregation whose state is one counter row per (hour, type)
  and whose append emission fires once the watermark passes the hour.
  This is the stream's only shuffle, keyed on (window, type), with
  map-side partial counts — the same two-phase shape as the batch
  aggregate.
- ``trending_rank``: the top-N rank over the EMITTED count log — a
  plain batch transformation (the identical Window the batch query
  uses, partitioned by the closed hour). Ranking belongs outside the
  stream: a closed window's counts are final (watermark semantics), so
  its top-N never changes, and chaining a rank Window after a streaming
  aggregation inside one query is exactly the multi-stateful shape
  append mode restricts. A deployment runs it in the sink's
  ``foreachBatch`` or over the sink table, as here.

Stream/batch parity: replaying a time-ordered log through stage 1 and
ranking the emissions reproduces ``ev_trending`` row-for-row (tested
with sentinel flush waves, same discipline as the CEP twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trending_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming ``(event_type, ts)`` → append stream of closed-hour
    counts ``(hour_ts string, event_type, n)``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            "event_type",
            "n",
        )
    )


def trending_rank(count_log: DataFrame, top_n: int) -> DataFrame:
    """Top-N per closed hour over the emitted count log — identical
    ranking (count desc, type asc tie-break) to the batch query."""
    w = Window.partitionBy("hour_ts").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        count_log.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_n)
        .select("hour_ts", "event_type", "n", "rk")
    )


# ---------------------------------------------------------------------------
# Continuous decayed counters — the streaming twin of the batch
# `ev_decayed_counts` entry (exponential forgetting, calendar-hour decay).

from collections.abc import Iterator  # noqa: E402

import pandas as pd  # noqa: E402
from pyspark.sql.streaming.state import (  # noqa: E402
    GroupState,
    GroupStateTimeout,
)

# Hour buckets older than this from the group's max contribute 0 after
# the micro-quantization (2^-21 · 10^6 < 0.5), so state prunes to a
# BOUNDED trailing window of hour counters per key — the whole point of
# the hour-bucket decay convention the batch twin shares.
DECAY_KEEP_HOURS = 20

_DC_OUT_SCHEMA = (
    "event_type string, n long, max_h long,"
    " hours array<long>, counts array<long>, emit_seq long"
)
_DC_STATE_SCHEMA = (
    "n long, hours array<long>, counts array<long>, emit_seq long"
)


def _decay_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, hours, counts, seq = (
        state.get if state.exists else (0, [], [], 0)
    )
    acc = dict(zip(hours, counts))
    for pdf in pdfs:
        for h in pdf["h"]:
            h = int(h)
            acc[h] = acc.get(h, 0) + 1
            n += 1
    if acc:
        cutoff = max(acc) - DECAY_KEEP_HOURS
        acc = {h: c for h, c in acc.items() if h >= cutoff}
    hours = sorted(acc)
    counts = [acc[h] for h in hours]
    seq += 1
    state.update((n, hours, counts, seq))
    yield pd.DataFrame(
        [(str(key[0]), n, hours[-1] if hours else None, hours, counts, seq)],
        columns=["event_type", "n", "max_h", "hours", "counts", "emit_seq"],
    )


def decayed_counts_stream(events: DataFrame) -> DataFrame:
    """``(event_type, ts)`` stream → update stream of per-type decayed-
    counter snapshots: total count, the trailing hour-bucket counters
    (the sketch's sufficient statistic — hours older than
    DECAY_KEEP_HOURS from the group's max floor to 0 micro-units and
    are pruned), and an ``emit_seq`` so sinks keep the latest row.

    The decayed VALUE is deliberately not emitted here: the batch twin
    anchors decay at the CORPUS max hour, which one key's state cannot
    know. `decayed_counts_rollup` — a plain batch post-stage over the
    latest snapshots, like `trending_rank` — applies the global anchor
    and reproduces `ev_decayed_counts` bit-for-bit (pruned hours are
    safe: the global max only ever INCREASES an age, and ages past the
    keep window already weigh 0 micro-units).

    Scale shape: the stateless stage is a pure JVM projection to
    (type, hour) — a streaming aggregation cannot precede
    `applyInPandasWithState` in one query, so per-hour reduction
    happens inside the state function (a dict fold over the Arrow
    batch); state per key is ≤ DECAY_KEEP_HOURS+1 counters.
    """
    partials = events.select(
        "event_type",
        F.floor(
            F.unix_millis(F.col("ts").cast("timestamp"))
            / F.lit(3_600_000.0)
        ).alias("h"),
    ).filter(F.col("h").isNotNull())
    return partials.groupBy("event_type").applyInPandasWithState(
        _decay_update,
        _DC_OUT_SCHEMA,
        _DC_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def decayed_counts_rollup(snapshots: DataFrame) -> DataFrame:
    """Latest snapshot per type → the batch `ev_decayed_counts` rows:
    global anchor = max hour across types, decayed value = the same
    exact dyadic micro-unit fold the batch entry sums per row."""
    latest = (
        snapshots.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.desc("emit_seq")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    ref = latest.agg(F.max("max_h").alias("ref_h"))
    pairs = latest.crossJoin(F.broadcast(ref)).select(
        "event_type",
        "n",
        F.explode(F.arrays_zip("hours", "counts")).alias("z"),
        "ref_h",
    )
    w_micro = F.floor(
        F.pow(
            F.lit(2.0),
            (F.col("z.hours") - F.col("ref_h")).cast("double"),
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    )
    return pairs.groupBy("event_type", "n").agg(
        F.sum(w_micro * F.col("z.counts")).cast("long").alias("decayed_micro")
    ).select("event_type", "n", "decayed_micro")
