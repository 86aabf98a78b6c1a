"""The reference's streaming "query": telemetry → violation / status events.

Re-expresses ``TelematicsViolationDeriverJob.java:93-183`` (one hand-fused
Flink ``ProcessFunction``) as declarative DataFrame transforms. Catalyst
fuses the filter/project/explode chain back into a single whole-stage
codegen'd map task — the same zero-shuffle shape as the reference, but
vectorized. Both functions accept batch or streaming DataFrames.

Operator coverage (SURVEY.md §2):
- O1 explode violations array  (Java :146-182)
- F2 battery gate              (Java :124-125)
- F4 violation-type allowlist  (Java :98-102,151-154)
- P2/P3 event construction     (Java :156-181 / :127-138)
- P4 timestamp coalesce        (Java :165-166)
- F10 threshold derivation     (mqtt_publish.js:193-229)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The deriver's allowlist (TelematicsViolationDeriverJob.java:98-102).
ALLOWED_VIOLATION_TYPES = ("harsh_brake", "harsh_accel")

# Generator thresholds (mqtt_publish.js:193-208): accel_y <= -2.7 is a
# harsh brake, >= 2.7 a harsh acceleration.
HARSH_ACCEL_Y_THRESHOLD = 2.7


def violations_from_telemetry(telemetry: DataFrame) -> DataFrame:
    """One output event per allowed violation element (O1+F4+P2+P4).

    ``explode`` (not ``explode_outer``) exactly matches the reference's
    iterator loop: records with missing/empty ``violations`` emit nothing
    (``TelematicsViolationDeriverJob.java:144-146``). Event timestamp is
    the element's own ``timestamp`` when > 0, else the payload's
    (``:165-166``). ``details`` carries exactly
    ``{accel_y, speed_kph, delta_speed}``, null when absent (``:172-176``;
    Jackson's omit-absent behavior is reproduced at serialization time
    with ``to_json(..., ignoreNullFields=true)``).
    """
    exploded = telemetry.select(
        "device_uuid",
        "vehicle_id",
        "account_id",
        "timestamp",
        "location",
        "mqtt_sent_at_ms",
        F.explode("violations").alias("v"),
    )
    allowed = exploded.filter(F.col("v.type").isin(*ALLOWED_VIOLATION_TYPES))
    return allowed.select(
        F.lit("violation").alias("event_type"),
        F.col("v.type").alias("violation_type"),
        F.col("device_uuid"),
        F.col("vehicle_id"),
        F.col("account_id"),
        F.coalesce(
            F.when(F.col("v.timestamp") > 0, F.col("v.timestamp")),
            F.col("timestamp"),
        ).alias("timestamp"),
        F.col("location"),
        F.struct(
            F.col("v.accel_y").alias("accel_y"),
            F.col("v.speed_kph").alias("speed_kph"),
            F.col("v.delta_speed").alias("delta_speed"),
        ).alias("details"),
        F.col("mqtt_sent_at_ms"),
    )


def device_status_from_telemetry(telemetry: DataFrame) -> DataFrame:
    """Cable-unplugged "touch" per battery-powered message (F2+P3).

    Gate (``TelematicsViolationDeriverJob.java:124-125``): non-null
    ``device_uuid``, ``timestamp > 0``, case-insensitive
    ``dashcam_power_source == "battery"``. The job emits only
    ``action="touch"`` (``:130``); ``clear`` arrives from other producers.

    Wire-format note: the reference's status events carry NO
    ``mqtt_sent_at_ms`` (Java job :127-139, README.md:657-669) — so a
    reference-style consumer never emits device-status latency records.
    Keeping it out of the projection preserves that observable behavior.
    """
    gated = telemetry.filter(
        F.col("device_uuid").isNotNull()
        & (F.col("timestamp") > 0)
        & (F.lower(F.col("dashcam_power_source")) == "battery")
    )
    return gated.select(
        F.lit("device_status").alias("event_type"),
        F.lit("cable-unplugged").alias("status_type"),
        F.lit("touch").alias("action"),
        F.col("device_uuid"),
        F.col("timestamp"),
        F.col("vehicle_id"),
        F.col("account_id"),
        F.col("location"),
    )


def detect_violations_from_imu(
    telemetry: DataFrame,
    threshold: float = HARSH_ACCEL_Y_THRESHOLD,
) -> DataFrame:
    """Derive violations from raw IMU instead of trusting the payload's
    ``violations`` array — the generator's domain rule (F10,
    ``mqtt_publish.js:193-208``) promoted to an engine operator.

    Pure column expressions; rows under threshold are filtered out before
    event construction so the scan's predicate pushes down.
    """
    a = F.col("accel_y")
    classified = telemetry.withColumn(
        "detected_type",
        F.when(a <= -threshold, F.lit("harsh_brake")).when(
            a >= threshold, F.lit("harsh_accel")
        ),
    ).filter(F.col("detected_type").isNotNull())
    return classified.select(
        F.lit("violation").alias("event_type"),
        F.col("detected_type").alias("violation_type"),
        F.col("device_uuid"),
        F.col("vehicle_id"),
        F.col("account_id"),
        F.col("timestamp"),
        F.col("location"),
        F.struct(
            F.col("accel_y").alias("accel_y"),
            F.col("speed_kph").alias("speed_kph"),
            F.lit(None).cast("double").alias("delta_speed"),
        ).alias("details"),
        F.col("mqtt_sent_at_ms"),
    )
