from kafka_flink_harshevents_spark.functions.json_lenient import (  # noqa: F401
    parse_telemetry,
    unwrap_double_encoded,
)
from kafka_flink_harshevents_spark.functions.scalars import (  # noqa: F401
    default_device_uuid,
    iso8601_ms,
    kph_to_mph,
    lenient_bool,
)
