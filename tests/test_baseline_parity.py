"""Reference performance-baseline parity (SURVEY.md §5.2 item 5): the
engine's latency analytics (S4 + A2/A3 operators) recompute BASELINE.md's
published steady-state statistics from the reference's own
``latencies.json`` bit-for-bit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

REF_LATENCIES = "/root/reference/latencies.json"


@pytest.mark.skipif(
    not os.path.exists(REF_LATENCIES), reason="reference checkout not present"
)
@pytest.mark.slow
def test_baseline_latency_stats(spark):
    from kafka_flink_harshevents_spark.sources.files import read_latency_log

    lat = read_latency_log(spark, REF_LATENCIES)
    assert lat.count() == 479  # BASELINE.md: total records

    # steady-state regime per BASELINE.md: 0 <= latency_ms < 1000
    steady = lat.filter((F.col("latency_ms") >= 0) & (F.col("latency_ms") < 1000))

    # the reference's percentile definition: sorted[floor(n*q)]
    # (mqtt_publish.js:84-97) — rank with a deterministic tie-break
    w = Window.orderBy("latency_ms", "kafka_received_at_ms", "mqtt_sent_at_ms")
    ranked = steady.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    row = ranked.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("latency_ms").alias("min"),
        F.max("latency_ms").alias("max"),
        F.round(F.avg("latency_ms"), 1).alias("mean"),
        F.max(F.when(F.col("rn") == F.floor(F.col("n") * 0.5) + 1, F.col("latency_ms"))).alias("p50"),
        F.max(F.when(F.col("rn") == F.floor(F.col("n") * 0.95) + 1, F.col("latency_ms"))).alias("p95"),
        F.max(F.when(F.col("rn") == F.floor(F.col("n") * 0.99) + 1, F.col("latency_ms"))).alias("p99"),
    ).first()

    # BASELINE.md's table, exactly
    assert row["cnt"] == 222
    assert row["min"] == 4
    assert row["p50"] == 8
    assert row["mean"] == 10.5
    assert row["p95"] == 19
    assert row["p99"] == 30
    assert row["max"] == 37

    # replay + clock-skew regimes are preserved un-clamped (T4)
    assert lat.filter(F.col("latency_ms") < 0).count() == 2
    assert lat.filter(F.col("latency_ms") >= 1000).count() == 255
    # BASELINE.md cites the 390,785 ms replay record specifically
    assert lat.filter(F.col("latency_ms") == 390_785).count() == 1
