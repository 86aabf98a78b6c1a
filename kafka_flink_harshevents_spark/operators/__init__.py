from kafka_flink_harshevents_spark.operators.violations import (  # noqa: F401
    detect_violations_from_imu,
    device_status_from_telemetry,
    violations_from_telemetry,
)
