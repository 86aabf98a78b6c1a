"""Streaming Count-Min sketch — continuous frequency estimation over an
unbounded key domain, the third bounded-state sketch stream next to KMV
(`streaming/kmv.py`, cardinality) and Misra–Gries
(`streaming/heavyhitters.py`, top items).

Where Misra–Gries answers "which items are hot", Count-Min (Cormode &
Muthukrishnan 2005) answers "how often did THIS item occur" for any item,
with the one-sided guarantee est ≥ true. The reference consumer's Redis
per-type counters (kafkaConsumer.js:229-233) are exact because the key
domain is a 5-value enum; over user ids / URLs / tokens the exact map is
unbounded, and CM is the constant-memory replacement.

Distribution shape — CELL = KEY: the stateless stage projects every
event to its CM_DEPTH (row, bucket) cell coordinates (the identical
salted-md5 arithmetic as the batch `ev_count_min` entry, JVM-side), and
the stateful stage keys on (d, bucket) — so state is ONE long per
touched cell (≤ CM_DEPTH·CM_WIDTH rows total), updates parallelize
across 1024 groups instead of funneling through CM_DEPTH, and the
shuffle per micro-batch moves event-count rows exactly once. Because
the sketch is a deterministic pure function of the ingested multiset,
the latest snapshots equal the batch-built sketch cell-for-cell after
ANY wave split — pinned by `test_streaming_count_min_matches_batch`.

Emission: update mode, one row per touched cell per micro-batch with a
per-cell ``emit_seq``; sinks keep the latest row per (d, bucket). A
point query reads the item's CM_DEPTH cells and takes the min — same
arithmetic as the batch entry's probe join.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kafka_flink_harshevents_spark.queries.events import cm_cell_array

_OUT_SCHEMA = "d long, bucket long, cnt long, emit_seq long"
_STATE_SCHEMA = "cnt long, emit_seq long"


def _cell_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cnt, seq = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        cnt += len(pdf)
    seq += 1
    state.update((cnt, seq))
    yield pd.DataFrame(
        [(int(key[0]), int(key[1]), cnt, seq)],
        columns=["d", "bucket", "cnt", "emit_seq"],
    )


def count_min_stream(events: DataFrame, item_col: str = "user_id") -> DataFrame:
    """``events`` stream → update stream of Count-Min cell snapshots
    ``(d, bucket, cnt, emit_seq)``. NULL items are dropped JVM-side
    (the batch sketch never hashes a NULL; a None bucket key would
    poison-pill the micro-batch through checkpoint replays)."""
    item = F.col(item_col).cast("string")
    cells = (
        events.select(F.explode(cm_cell_array(item)).alias("c"))
        .select("c.d", "c.bucket")
        .filter(F.col("bucket").isNotNull())
    )
    return cells.groupBy("d", "bucket").applyInPandasWithState(
        _cell_update,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def count_min_snapshot(cell_log: DataFrame) -> DataFrame:
    """Latest count per cell from the emitted update log — the batch
    post-stage a sink applies (same convention as `dedup_verdicts` /
    `decayed_counts_rollup`)."""
    return (
        cell_log.groupBy("d", "bucket")
        .agg(F.max_by("cnt", "emit_seq").alias("cnt"))
        .select("d", "bucket", "cnt")
    )
