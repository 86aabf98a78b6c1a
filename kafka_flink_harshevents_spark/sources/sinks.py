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

from pyspark.errors import AnalysisException
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


def upsert_foreach_batch(
    out_dir: str,
    key_cols: tuple[str, ...],
    order_col: str,
    n_buckets: int = 16,
):
    """MERGE-style keyed upsert without a transactional table format —
    the K4 update-by-id sink (kafkaConsumer.js:304-318) as a
    ``foreachBatch`` function over bucket-partitioned parquet:

    1. rows hash-bucket on the business key (``_bucket = hash % n``);
    2. each micro-batch reads ONLY the buckets it touches, unions the
       incoming rows, and keeps the latest version per key
       (``row_number`` over ``order_col`` descending);
    3. dynamic partition overwrite rewrites exactly those bucket
       directories — untouched buckets are never read or written.

    At 100 TB the rewrite unit is |bucket| ≈ table/n_buckets, so
    ``n_buckets`` is the knob trading write amplification against file
    count — the same trade Delta/Iceberg make with file groups; with a
    transactional format available, swap the body for a real MERGE and
    keep the calling contract.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        b = batch_df.withColumn(
            "_bucket", F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets))
        )
        touched = [r["_bucket"] for r in b.select("_bucket").distinct().collect()]
        try:
            existing = spark.read.parquet(out_dir).filter(
                F.col("_bucket").isin(touched)
            )
            merged = existing.unionByName(b)
        except AnalysisException as exc:
            # ONLY the missing-path case means "first batch". Any real
            # read failure (storage hiccup, corrupt footer, permissions)
            # must fail the batch so checkpoint recovery retries it —
            # swallowing it would overwrite touched buckets with just the
            # micro-batch's rows: silent data loss.
            if "PATH_NOT_FOUND" not in str(exc):
                raise
            merged = b
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            latest.write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    return apply
