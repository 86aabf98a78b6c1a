"""Full consumer-stage topology over file streams — the no-broker twin
of the reference's kafkaConsumer.js process: latency JSONL flush (5 s
loop → 1 s here), counter snapshots (30 s report → 1 s here), and O9
session consolidation, all running as concurrent StreamingQueries off
one event stream (kafkaConsumer.js:51,100-102,278-347)."""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.plans.pipeline import run_consumer_stage
from kafka_flink_harshevents_spark.sources.kafka import (
    DEVICE_STATUS_TOPIC,
    VIOLATIONS_TOPIC,
)


def _write_events(src, rows):
    import os

    fname = f"{src}/{uuid.uuid4().hex}.jsonl"
    with open(fname + ".tmp", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows) + "\n")
    os.rename(fname + ".tmp", fname)


def _violation(device, ts, sent_ms, received_ms):
    return {
        "topic": VIOLATIONS_TOPIC,
        "value": json.dumps(
            {
                "event_type": "violation",
                "violation_type": "harsh_brake",
                "device_uuid": device,
                "timestamp": ts,
                "mqtt_sent_at_ms": sent_ms,
            }
        ),
        "kafka_received_at_ms": received_ms,
    }


def _status(device, action, ts, received_ms):
    return {
        "topic": DEVICE_STATUS_TOPIC,
        "value": json.dumps(
            {
                "event_type": "device_status",
                "status_type": "cable-unplugged",
                "action": action,
                "device_uuid": device,
                "timestamp": ts,
            }
        ),
        "kafka_received_at_ms": received_ms,
    }


def _wait(pred, timeout=90, msg="condition"):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return
        time.sleep(0.5)
    raise TimeoutError(f"timed out waiting for {msg}")


def test_consumer_stage_topology(spark, tmp_path):
    src = tmp_path / "events"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    _write_events(
        str(src),
        [
            _violation("d-1", 100, 100_000, 100_040),
            _violation("d-2", 101, 101_000, 101_025),
            _status("d-1", "touch", 200, 200_010),
        ],
    )
    events = spark.readStream.schema(
        "topic STRING, value STRING, kafka_received_at_ms LONG"
    ).json(str(src))
    queries = run_consumer_stage(
        spark,
        events,
        str(out),
        str(ckpt),
        latency_trigger_seconds=1,
        counter_trigger_seconds=1,
        session_ttl_seconds=300,
    )
    try:
        assert set(queries) == {"latency", "counters", "sessions"}

        def latencies():
            try:
                return [
                    json.loads(line)
                    for p in (out / "latencies").glob("*.json")
                    for line in open(p)
                    if line.strip()
                ]
            except FileNotFoundError:
                return []

        def counters():
            try:
                return {
                    r["violation_type"]: r["n"]
                    for p in (out / "counters_current").glob("*.json")
                    for r in map(json.loads, open(p))
                }
            except FileNotFoundError:
                return {}

        _wait(lambda: len(latencies()) == 2, msg="latency JSONL flush")
        lat = {r["device_uuid"]: r["latency_ms"] for r in latencies()}
        assert lat == {"d-1": 40, "d-2": 25}
        _wait(lambda: counters().get("harsh_brake") == 2, msg="counter snapshot")

        # second batch: counts ACCUMULATE (Redis INCR semantics) and the
        # session finalizes on clear
        _write_events(
            str(src),
            [
                _violation("d-3", 102, 102_000, 102_030),
                _status("d-1", "clear", 260, 260_010),
            ],
        )
        _wait(lambda: counters().get("harsh_brake") == 3, msg="counter accumulation")
        _wait(lambda: len(latencies()) == 3, msg="second latency flush")

        def sessions():
            try:
                return [
                    json.loads(line)
                    for p in (out / "sessions").glob("*.json")
                    for line in open(p)
                    if line.strip()
                ]
            except FileNotFoundError:
                return []

        _wait(lambda: len(sessions()) == 1, msg="finalized session")
        s = sessions()[0]
        assert (s["device_uuid"], s["start_timestamp"], s["end_timestamp"]) == (
            "d-1",
            200,
            200,
        )
        assert s["n_touches"] == 1
    finally:
        for q in queries.values():
            q.stop()


def test_stream_stream_interval_join(spark, tmp_path):
    """Event-time interval join across the two event streams: a
    violation matches the preceding touch on the same device within the
    window; outside the window or on another device it doesn't."""
    import json as _json

    from kafka_flink_harshevents_spark.streaming.joins import (
        violations_during_status,
    )

    vsrc = tmp_path / "v"
    ssrc = tmp_path / "s"
    vsrc.mkdir()
    ssrc.mkdir()

    def write(d, name, rows):
        with open(d / name, "w") as f:
            f.write("\n".join(_json.dumps(r) for r in rows) + "\n")

    write(
        ssrc,
        "s.jsonl",
        [
            {"device_uuid": "d-1", "action": "touch", "timestamp": 1000},
            {"device_uuid": "d-2", "action": "touch", "timestamp": 5000},
        ],
    )
    write(
        vsrc,
        "v.jsonl",
        [
            {"device_uuid": "d-1", "violation_type": "harsh_brake", "timestamp": 1100},  # in window
            {"device_uuid": "d-1", "violation_type": "harsh_accel", "timestamp": 2000},  # out of window
            {"device_uuid": "d-2", "violation_type": "harsh_brake", "timestamp": 1100},  # wrong device window
        ],
    )
    v = spark.readStream.schema(
        "device_uuid STRING, violation_type STRING, timestamp LONG"
    ).json(str(vsrc))
    s = spark.readStream.schema(
        "device_uuid STRING, action STRING, timestamp LONG"
    ).json(str(ssrc))
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        violations_during_status(v, s, window_seconds=300)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = [r.asDict() for r in spark.table(name).collect()]
        assert len(rows) == 1
        r = rows[0]
        assert (r["device_uuid"], r["violation_type"], r["seconds_after_status"]) == (
            "d-1",
            "harsh_brake",
            100,
        )
    finally:
        q.stop()


def test_streaming_cep_followed_by(spark, tmp_path):
    """Streaming CEP (interval self-join → first-match min-agg, two
    chained stateful operators in append mode): each click matched to its
    FIRST same-user purchase within 30 min; ties to the batch
    ev_pattern_match schema. Far-future sentinel waves advance the
    watermark so the join then the aggregation flush their state."""
    import json as _json

    from kafka_flink_harshevents_spark.streaming.joins import followed_by_stream

    src = tmp_path / "cep"
    src.mkdir()

    def ev(eid, user, etype, epoch):
        return {
            "event_id": eid,
            "user_id": user,
            "event_type": etype,
            "ts": epoch * 1000,
        }

    main = [
        ev(1, 1, "click", 100),
        ev(2, 1, "purchase", 200),   # second purchase for u1
        ev(3, 1, "purchase", 150),   # first purchase for u1 -> the match
        ev(4, 1, "click", 1000),
        ev(5, 1, "purchase", 4000),  # 3000 s after click 4: outside 1800 s
        ev(6, 2, "purchase", 100),   # purchase before u2's click: no match
        ev(7, 2, "click", 200),
        ev(8, 3, "click", 300),
        ev(9, 3, "purchase", 301),   # 1 s gap: match
    ]
    far = 100 * 24 * 3600

    def write(name, rows):
        with open(src / name, "w") as f:
            f.write("\n".join(_json.dumps(r) for r in rows) + "\n")

    stream = (
        spark.readStream.schema(
            "event_id LONG, user_id LONG, event_type STRING, ts LONG"
        )
        .json(str(src))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.timestamp_millis(F.col("ts")).alias("ts"),
        )
    )
    name = f"cep_{uuid.uuid4().hex[:8]}"
    q = (
        followed_by_stream(stream, within_seconds=1800)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        write("wave1.jsonl", main)
        q.processAllAvailable()
        # each wave's sentinels push the watermark 100+ days further so
        # first the join state, then the agg state, finalizes
        write("wave2.jsonl", [ev(100, 99, "click", far), ev(101, 98, "purchase", far + 10 * 24 * 3600)])
        q.processAllAvailable()
        write("wave3.jsonl", [ev(102, 97, "click", 3 * far), ev(103, 96, "purchase", 3 * far + 10 * 24 * 3600)])
        q.processAllAvailable()
        got = {
            (r["user_id"], r["click_event_id"]): (r["click_ms"], r["purchase_ms"], r["gap_ms"])
            for r in spark.table(name).collect()
            if r["user_id"] < 90  # exclude sentinel users
        }
        assert got == {
            (1, 1): (100_000, 150_000, 50_000),
            (3, 8): (300_000, 301_000, 1_000),
        }
    finally:
        q.stop()


def test_cep_stream_batch_parity(spark):
    """The streaming CEP operator run in BATCH mode (watermarks are
    no-ops on batch DataFrames) must produce exactly the batch catalog
    query's matches — including same-millisecond click/purchase pairs,
    where both sides break the tie by the shared (tms, event_id) total
    order: a purchase at the click's exact timestamp matches (gap 0)
    iff its event_id sorts after the click's."""
    from kafka_flink_harshevents_spark.queries._util import load
    from kafka_flink_harshevents_spark.queries.analytics import ev_pattern_match
    from kafka_flink_harshevents_spark.streaming.joins import followed_by_stream

    sf = "/root/testdata/sf0.001"
    events = load(spark, sf, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    stream_form = {
        tuple(r) for r in followed_by_stream(events, within_seconds=1800).collect()
    }
    batch_form = {tuple(r) for r in ev_pattern_match(spark, sf).collect()}
    assert stream_form == batch_form
    assert len(batch_form) > 0

    # Targeted same-timestamp ties, both orientations:
    # u1: purchase shares the click's ts, event_id AFTER  -> match, gap 0
    # u2: purchase shares the click's ts, event_id BEFORE -> no match
    from kafka_flink_harshevents_spark.queries.analytics import pattern_match_frame

    tie = spark.createDataFrame(
        [
            ("e10", 1, "click", 1_000_000),
            ("e20", 1, "purchase", 1_000_000),
            ("e30", 2, "purchase", 2_000_000),
            ("e40", 2, "click", 2_000_000),
        ],
        "event_id string, user_id long, event_type string, tms long",
    )
    tie_ts = tie.withColumn("ts", F.timestamp_millis(F.col("tms")))
    stream_tie = {
        tuple(r)
        for r in followed_by_stream(tie_ts, within_seconds=1800).collect()
    }
    batch_tie = {
        (r["user_id"], r["click_event_id"], r["click_ms"], r["purchase_ms"], r["gap_ms"])
        for r in pattern_match_frame(tie).collect()
    }
    assert stream_tie == batch_tie == {(1, "e10", 1_000_000, 1_000_000, 0)}
