"""PySpark-native analytics engine with the query and data-processing
capabilities of ``Kaushika-Omnidya/kafka-flink-harshevents``.

Every operator is a shared batch/streaming ``DataFrame -> DataFrame``
function (SURVEY.md §7 design stance): bind to ``spark.read`` for the
DuckDB-oracle correctness checks and to ``spark.readStream`` for the live
Kafka pipeline. Architecture is Spark-first — declarative DataFrame/SQL
plans optimized by Catalyst, keyed state via Structured Streaming, Pandas
UDFs only where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from kafka_flink_harshevents_spark.functions.json_lenient import (  # noqa: E402,F401
    parse_telemetry,
    unwrap_double_encoded,
)
from kafka_flink_harshevents_spark.operators.joins import asof_join  # noqa: E402,F401
from kafka_flink_harshevents_spark.operators.sessions import (  # noqa: E402,F401
    sessionize_batch,
)
from kafka_flink_harshevents_spark.operators.violations import (  # noqa: E402,F401
    detect_violations_from_imu,
    device_status_from_telemetry,
    violations_from_telemetry,
)
from kafka_flink_harshevents_spark.session import get_spark  # noqa: E402,F401

__all__ = [
    "get_spark",
    "parse_telemetry",
    "unwrap_double_encoded",
    "violations_from_telemetry",
    "device_status_from_telemetry",
    "detect_violations_from_imu",
    "sessionize_batch",
    "asof_join",
    "__version__",
]
