"""Stream-stream joins (SURVEY §2.7 taken to streaming).

The reference keeps its two event streams separate and correlates them
only implicitly (the consumer's latency log spans both topics,
kafkaConsumer.js:201-211). A real deployment asks the join question
directly — "which violations happened while the dashcam was on
battery?" — which in Spark is an event-time interval join with
watermarks on BOTH sides so join state is bounded and expired by the
engine, not by an external TTL.

Scale shape: the join shuffles both streams once on ``device_uuid``
(the same key Kafka already partitions by), and state per key is
bounded by watermark + interval — this survives any stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def violations_during_status(
    violations: DataFrame,
    status: DataFrame,
    window_seconds: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time interval join: each violation matched to the
    device-status touch that precedes it by < ``window_seconds`` on the
    same device. Inner join; both sides watermarked so the engine can
    drop expired state (late rows beyond the watermark are discarded,
    matching the reference's best-effort correlation).

    Inputs are the validated route_* shapes (epoch-second ``timestamp``).
    Output: the violation columns plus the matched status action/time.
    """
    v = violations.select(
        F.col("device_uuid"),
        F.col("violation_type"),
        F.col("timestamp").alias("v_epoch"),
        F.timestamp_seconds(F.col("timestamp")).alias("v_ts"),
    ).withWatermark("v_ts", watermark)
    s = status.select(
        F.col("device_uuid").alias("s_device"),
        F.col("action"),
        F.col("timestamp").alias("s_epoch"),
        F.timestamp_seconds(F.col("timestamp")).alias("s_ts"),
    ).withWatermark("s_ts", watermark)
    cond = (
        (F.col("device_uuid") == F.col("s_device"))
        & (F.col("v_ts") >= F.col("s_ts"))
        & (F.col("v_ts") < F.col("s_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return v.join(s, cond).select(
        "device_uuid",
        "violation_type",
        F.col("v_epoch").alias("violation_timestamp"),
        F.col("action").alias("status_action"),
        F.col("s_epoch").alias("status_timestamp"),
        (F.col("v_epoch") - F.col("s_epoch")).alias("seconds_after_status"),
    )
