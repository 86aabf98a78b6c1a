"""The reference's end-to-end dataflow, assembled.

Reference topology (``README.md:7-15`` of the reference):

    telemetry.raw ──Flink job──► violations.events ─┐
                   └───────────► device-status.events ┴─► consumer →
                                       Mongo docs / Redis counters+TTL

Engine topology (same semantics, Spark-first):

    derive_stage:   parsed telemetry → (violations wire, status wire)
    consumer_stage: unioned event stream → {violations, status, latency,
                    counters} DataFrames; sessions via the O9 operator

Every stage is a pure ``DataFrame → DataFrame`` function, so the same
code binds to ``spark.read`` (batch oracle) and ``spark.readStream``
(production). ``run_streaming_pipeline`` is the Kafka binding: two
derive queries + consumer queries, each with its own checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.operators.violations import (
    device_status_from_telemetry,
    violations_from_telemetry,
)
from kafka_flink_harshevents_spark.sources.kafka import (
    DEVICE_STATUS_TOPIC,
    TELEMETRY_TOPIC,
    VIOLATIONS_TOPIC,
    read_telemetry_stream,
    records_for_kafka,
    write_events_stream,
)
from kafka_flink_harshevents_spark.streaming.consumer import (
    latency_records,
    route_device_status,
    route_violations,
    violation_type_counts,
)


def derive_stage(telemetry: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Flink-job equivalent (TelematicsViolationDeriverJob.java:93-183):
    parsed telemetry → (violations wire frames, device-status wire
    frames). Both branches are narrow — no shuffle anywhere before the
    Kafka hop, matching the reference's shuffle-free design (§4.2)."""
    violations = records_for_kafka(violations_from_telemetry(telemetry))
    status = records_for_kafka(device_status_from_telemetry(telemetry))
    return violations, status


def as_event_stream(wire: DataFrame, topic: str, received_at_ms=None) -> DataFrame:
    """Wrap wire frames as the consumer-side source shape
    (topic, value, kafka_received_at_ms) — what read_event_streams
    yields from a real broker; used to compose stages without one."""
    ts = F.lit(received_at_ms) if received_at_ms is not None else F.unix_millis(
        F.current_timestamp()
    )
    return wire.select(
        F.lit(topic).alias("topic"),
        F.col("value"),
        ts.cast("long").alias("kafka_received_at_ms"),
    )


def consumer_stage(events: DataFrame) -> dict[str, DataFrame]:
    """kafkaConsumer.js equivalent: route → validate → derive latency →
    count. Session consolidation is separate (streaming.sessions.O9 for
    streams, operators.sessions.sessionize_batch for batch oracles)
    because it is the only stateful member."""
    violations = route_violations(events)
    status = route_device_status(events)
    return {
        "violations": violations,
        "status": status,
        "latency": latency_records(violations),
        "counters": violation_type_counts(violations),
    }


def run_streaming_pipeline(
    spark: SparkSession,
    bootstrap: str,
    checkpoint_root: str,
    max_offsets_per_trigger: int | None = None,
):
    """Production Kafka binding: start the derive queries (telemetry →
    two event topics). Returns the running StreamingQuery handles.
    Consumer-side queries attach to the event topics the same way
    (read_event_streams → consumer_stage → sinks of choice)."""
    telemetry = read_telemetry_stream(
        spark,
        bootstrap,
        TELEMETRY_TOPIC,
        max_offsets_per_trigger=max_offsets_per_trigger,
    )
    v_wire = records_for_kafka(violations_from_telemetry(telemetry))
    s_wire = records_for_kafka(device_status_from_telemetry(telemetry))
    queries = []
    for wire, topic in ((v_wire, VIOLATIONS_TOPIC), (s_wire, DEVICE_STATUS_TOPIC)):
        q = (
            wire.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
            .option("checkpointLocation", f"{checkpoint_root}/{topic}")
            .start()
        )
        queries.append(q)
    return queries


__all__ = [
    "derive_stage",
    "as_event_stream",
    "consumer_stage",
    "run_streaming_pipeline",
    "write_events_stream",
]
