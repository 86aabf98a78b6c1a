"""Durable table sinks — the engine's replacement for the reference's
MongoDB collection (K3/K4, SURVEY.md §2.2).

At 100 TB a document store written row-at-a-time is the bottleneck; the
engine lands events in date-partitioned parquet instead:

- **partition layout** ``event_date=YYYY-MM-DD/`` → partition pruning
  makes time-range queries touch only matching directories;
- **in-partition ordering** by ``device_uuid`` (repartition on the
  partition column + sort within partitions) → one output file per
  (date, task) with device locality, so per-device scans are contiguous
  and min/max stats are tight;
- **idempotence**: an ``event_hash`` column (xxhash64 of the business
  key) gives replays a natural dedup key — ``dropDuplicates`` before
  write inside a batch, MERGE-on-hash when a transactional table format
  is available (the container has none, so parquet append + hash is the
  portable core).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_hash(events: DataFrame, key_cols: tuple[str, ...]) -> DataFrame:
    """Deterministic business-key hash for replay dedup (the reference's
    at-least-once delivery creates duplicate Mongo docs on replay —
    SURVEY.md §2.10 T5; this is the engine-side fix)."""
    return events.withColumn("event_hash", F.xxhash64(*[F.col(c) for c in key_cols]))


def dedup_events_stream(
    events: DataFrame,
    ts_col: str = "timestamp",
    delay: str = "10 minutes",
    key_cols: tuple[str, ...] = (
        "device_uuid",
        "violation_type",
        "timestamp",
        "details",
    ),
) -> DataFrame:
    """Streaming replay dedup (T5): Kafka's at-least-once delivery makes
    the reference write duplicate Mongo docs on replay (SURVEY §2.10);
    this is the engine-side streaming fix. Keys on the same business-key
    hash as the batch sink and uses ``dropDuplicatesWithinWatermark`` so
    dedup state EXPIRES with the watermark — state is bounded by the
    replay window (``delay``), not the stream's lifetime, which is what
    makes it safe at 100 TB/day. ``ts_col`` is epoch seconds (wire unit).
    """
    hashed = with_event_hash(
        events.withColumn("__ets", F.timestamp_seconds(F.col(ts_col))), key_cols
    )
    return (
        hashed.withWatermark("__ets", delay)
        .dropDuplicatesWithinWatermark(["event_hash"])
        .drop("__ets")
    )


def write_events_partitioned(
    events: DataFrame,
    path: str,
    ts_col: str = "timestamp",
    dedup_key_cols: tuple[str, ...] = (
        "device_uuid",
        "violation_type",
        "timestamp",
        "details",
    ),
) -> None:
    """Append events as date-partitioned parquet with device locality.

    ``ts_col`` is epoch seconds (the wire unit — SURVEY.md §1.2); the
    derived ``event_date`` exists only for the directory layout.

    The dedup key includes the ``details`` struct: timestamps are epoch
    SECONDS, so two genuinely distinct same-type violations for one
    device within the same second differ only in their details
    (accel_y/speed_kph/delta_speed) — hashing the struct keeps them both
    while still collapsing true replays (``xxhash64`` hashes struct
    fields recursively)."""
    hashed = with_event_hash(events, dedup_key_cols).dropDuplicates(["event_hash"])
    dated = hashed.withColumn(
        "event_date", F.date_format(F.timestamp_seconds(F.col(ts_col)), "yyyy-MM-dd")
    )
    (
        dated.repartition("event_date")
        .sortWithinPartitions("device_uuid", ts_col)
        .write.mode("append")
        .partitionBy("event_date")
        .parquet(path)
    )
