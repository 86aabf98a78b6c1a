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
