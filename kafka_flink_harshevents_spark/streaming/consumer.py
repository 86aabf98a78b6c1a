"""Consumer-stage operators (the reference's ``kafkaConsumer.js``,
re-expressed declaratively; SURVEY.md §2.4-2.6).

Works identically on batch and streaming DataFrames shaped like the
unioned event source (columns ``topic``, ``value``,
``kafka_received_at_ms``) — batch runs are the oracle for the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark import schemas
from kafka_flink_harshevents_spark.functions.json_lenient import parse_telemetry
from kafka_flink_harshevents_spark.sources.kafka import (
    DEVICE_STATUS_TOPIC,
    VIOLATIONS_TOPIC,
)


def _truthy_str(name: str) -> F.Column:
    """JS-falsy string check: ``!x`` drops null AND '' (kafkaConsumer.js
    validation is plain truthiness, not a null test)."""
    return F.col(name).isNotNull() & (F.length(name) > 0)


def _truthy_long(name: str) -> F.Column:
    """JS-falsy number check: ``!x`` drops null AND 0 — the deriver can
    legitimately emit timestamp 0 when the payload lacks one (Java job
    ``vts > 0 ? vts : ts`` with ts defaulting to 0), and the reference
    consumer silently drops those."""
    return F.col(name).isNotNull() & (F.col(name) != 0)


def route_violations(events: DataFrame) -> DataFrame:
    """O3 + P11 + F5: route by topic (kafkaConsumer.js:388-392), lenient
    parse, then drop rows with falsy device_uuid/violation_type/timestamp
    — the consumer's silent-drop truthiness validation
    (kafkaConsumer.js:195-198): empty strings and timestamp 0 are dropped
    exactly like nulls."""
    routed = events.filter(F.col("topic") == VIOLATIONS_TOPIC)
    parsed = parse_telemetry(routed, value_col="value", schema=schemas.VIOLATION_EVENT)
    return parsed.filter(
        _truthy_str("device_uuid")
        & _truthy_str("violation_type")
        & _truthy_long("timestamp")
    )


def route_device_status(events: DataFrame) -> DataFrame:
    """O3 + P11 + F6: the device-status twin (kafkaConsumer.js:254-257) —
    same JS-truthiness semantics on status_type/action."""
    routed = events.filter(F.col("topic") == DEVICE_STATUS_TOPIC)
    parsed = parse_telemetry(
        routed, value_col="value", schema=schemas.DEVICE_STATUS_EVENT
    )
    return parsed.filter(
        _truthy_str("device_uuid")
        & _truthy_str("status_type")
        & _truthy_str("action")
        & _truthy_long("timestamp")
    )


def latency_records(events: DataFrame) -> DataFrame:
    """P5 + F9 (kafkaConsumer.js:201-211): only rows carrying
    ``mqtt_sent_at_ms`` are tracked; latency is receive − send with **no
    clamping** — negative (clock skew) and replay-inflated values are
    recorded as-is, matching the reference (SURVEY.md §2.10 T4)."""
    with_ts = events.filter(F.col("mqtt_sent_at_ms").isNotNull())
    return with_ts.select(
        "topic",
        "device_uuid",
        "mqtt_sent_at_ms",
        "kafka_received_at_ms",
        (F.col("kafka_received_at_ms") - F.col("mqtt_sent_at_ms")).alias("latency_ms"),
        F.date_format(
            F.timestamp_millis(F.col("kafka_received_at_ms")),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
        ).alias("timestamp"),
    )


def violation_type_counts(violations: DataFrame) -> DataFrame:
    """A1 (kafkaConsumer.js:229-233): the Redis INCR per stored violation
    as a grouped count. Streaming: run in ``update`` output mode with no
    watermark — an eternally-accumulating counter, exactly the Redis
    semantics. Partial (map-side) aggregation makes the shuffle carry one
    row per type per task, so it holds at any scale."""
    return violations.groupBy("violation_type").agg(F.count(F.lit(1)).alias("n"))
