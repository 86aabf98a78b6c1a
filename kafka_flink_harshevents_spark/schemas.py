"""Explicit StructTypes for every dataset the reference handles.

Derived from the reference's documented payloads (FIXTURES.md):
input schema ``reference/README.md:439-475``, violation element forms
``README.md:578-623`` + ``mqtt_publish.js:194-228``, outputs
``README.md:630-669``, storage ``kafkaConsumer.js:112-152``, latency
record ``kafkaConsumer.js:203-210``.

Conventions (SURVEY.md §1.2):
- epoch-seconds fields stay ``LongType`` (never auto-converted);
  ``*_ms`` fields are epoch-milliseconds ``LongType``;
- every field nullable — the reference is schema-on-read with
  ``has()``-guarded access (``TelematicsViolationDeriverJob.java:208-214``),
  which Spark's PERMISSIVE ``from_json`` + nullable columns reproduces.
"""

from __future__ import annotations

from pyspark.sql import types as T

# GeoJSON Point, coordinates [longitude, latitude]
# (reference/README.md:466-470, mqtt_publish.js:271-274).
LOCATION = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.DoubleType())),
    ]
)

# Union of the generator form (mqtt_publish.js:194-228) and the documented
# richer form (README.md:578-623); the deriver only projects
# {timestamp, type, accel_y, speed_kph, delta_speed}, the rest must parse.
VIOLATION_ELEMENT = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("accel_y", T.DoubleType()),
        T.StructField("speed_kph", T.DoubleType()),
        T.StructField("delta_speed", T.DoubleType()),
        T.StructField("event_ts", T.LongType()),
        T.StructField("axis", T.StringType()),
        T.StructField("accel_mps2", T.DoubleType()),
        T.StructField("decel_mps2", T.DoubleType()),
        T.StructField("threshold_mps2", T.DoubleType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak_accel_mps2", T.DoubleType()),
        T.StructField("peak_decel_mps2", T.DoubleType()),
        T.StructField("severity", T.StringType()),
        T.StructField("algo_version", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

# telemetry.raw — primary input, one row per message (README.md:439-475).
TELEMETRY = T.StructType(
    [
        T.StructField("device_uuid", T.StringType()),
        T.StructField("mqtt_sent_at_ms", T.LongType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("fix_quality", T.StringType()),
        T.StructField("temp_C", T.DoubleType()),
        T.StructField("accel_x", T.DoubleType()),
        T.StructField("accel_y", T.DoubleType()),
        T.StructField("accel_z", T.DoubleType()),
        T.StructField("gyro_x", T.DoubleType()),
        T.StructField("gyro_y", T.DoubleType()),
        T.StructField("gyro_z", T.DoubleType()),
        T.StructField("cpu_temp", T.IntegerType()),
        T.StructField("soc_temp", T.IntegerType()),
        T.StructField("main_board_temp", T.DoubleType()),
        T.StructField("sim_iccid", T.StringType()),
        T.StructField("sim_imsi", T.StringType()),
        T.StructField("signal_strength_percent", T.IntegerType()),
        T.StructField("imu_is_stopped", T.BooleanType()),
        T.StructField("dashcam_power_source", T.StringType()),
        T.StructField("battery_capacity", T.IntegerType()),
        T.StructField("lat_dir", T.StringType()),
        T.StructField("lon_dir", T.StringType()),
        # documented bool (README.md:463) but emitted as int 1
        # (mqtt_publish.js:265): parse as string — Spark's JSON reader
        # accepts any scalar token into StringType, so both `true` and `1`
        # survive; interpret with functions.scalars.lenient_bool.
        T.StructField("location_changed", T.StringType()),
        T.StructField("speed_kph", T.DoubleType()),
        T.StructField("speed_mph", T.DoubleType()),
        T.StructField("ontrip", T.BooleanType()),
        T.StructField("location", LOCATION),
        T.StructField("vehicle_id", T.StringType()),
        T.StructField("account_id", T.StringType()),
        T.StructField("violations", T.ArrayType(VIOLATION_ELEMENT)),
    ]
)

# violations.events — one row per allowed violation
# (TelematicsViolationDeriverJob.java:156-181, README.md:630-655).
VIOLATION_DETAILS = T.StructType(
    [
        T.StructField("accel_y", T.DoubleType()),
        T.StructField("speed_kph", T.DoubleType()),
        T.StructField("delta_speed", T.DoubleType()),
    ]
)

VIOLATION_EVENT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("violation_type", T.StringType()),
        T.StructField("device_uuid", T.StringType()),
        T.StructField("vehicle_id", T.StringType()),
        T.StructField("account_id", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("location", LOCATION),
        T.StructField("details", VIOLATION_DETAILS),
        T.StructField("mqtt_sent_at_ms", T.LongType()),
    ]
)

# device-status.events — one row per battery-powered message
# (TelematicsViolationDeriverJob.java:124-141, README.md:657-669).
# mqtt_sent_at_ms stays in the PARSE schema (JS property access tolerates
# absent fields → null) but is never in the produced wire event, so
# latency tracking skips status events exactly like the reference.
DEVICE_STATUS_EVENT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("status_type", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("device_uuid", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("vehicle_id", T.StringType()),
        T.StructField("account_id", T.StringType()),
        T.StructField("location", LOCATION),
        T.StructField("mqtt_sent_at_ms", T.LongType()),
    ]
)

# latency log record (kafkaConsumer.js:203-210, latencies.json).
LATENCY_RECORD = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("device_uuid", T.StringType()),
        T.StructField("mqtt_sent_at_ms", T.LongType()),
        T.StructField("kafka_received_at_ms", T.LongType()),
        T.StructField("latency_ms", T.LongType()),
        T.StructField("timestamp", T.StringType()),
    ]
)

# consolidated cable-unplugged session row (kafkaConsumer.js:112-152;
# sessions get start/end timestamps, violations the §3 fields).
SESSION_ROW = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("status_type", T.StringType()),
        T.StructField("device_uuid", T.StringType()),
        T.StructField("start_timestamp", T.LongType()),
        T.StructField("end_timestamp", T.LongType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("n_touches", T.LongType()),
    ]
)

# in-progress session view (K4 parity): the reference consumer extends
# the SAME Mongo doc on every touch (kafkaConsumer.js:304-318), so an
# observer sees the session grow. ``is_open`` distinguishes the growing
# doc from the finalized one.
SESSION_PROGRESS_ROW = T.StructType(
    list(SESSION_ROW.fields) + [T.StructField("is_open", T.BooleanType())]
)
