"""Full-topology throughput entry: the reference's entire dataflow
(generate → derive → wire hop → consumer route/validate/count) as one
catalog query, with input volume proportional to the scale factor.

The reference's only published throughput is 1 msg/s sustained
(BASELINE.md); this entry gives BENCH a directly comparable number for
the same pipeline running vectorized (~500k msgs at sf0.1).

No SQL oracle: the synthetic generator's hash-derived randomness is not
reproducible in DuckDB — the driver records the rows-only check, and the
pipeline's correctness is covered end-to-end by tests/test_pipeline.py
against the batch oracle formulation.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from kafka_flink_harshevents_spark.plans.pipeline import (
    as_event_stream,
    consumer_stage,
    derive_stage,
)
from kafka_flink_harshevents_spark.sources.kafka import (
    DEVICE_STATUS_TOPIC,
    VIOLATIONS_TOPIC,
)
from kafka_flink_harshevents_spark.sources.synthetic import synthetic_telemetry

ROWS_PER_SF = 5_000_000  # 50k msgs at sf0.01, 500k at sf0.1


def pipeline_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full reference topology as one entry: synthetic telemetry →
    violation/status derivation → wire-format roundtrip → consumer
    routing/counters; raw counter values depend on the generator's
    xxhash64 stream (engine-specific), so the driver records rows-only
    here and `pipeline_derive_gate` carries the hashable contract.
    """
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    n = max(int(ROWS_PER_SF * sf), 1000)
    tel = synthetic_telemetry(spark, n, n_devices=97, seed=1234)
    v_wire, s_wire = derive_stage(tel)
    events = as_event_stream(v_wire, VIOLATIONS_TOPIC, 1_000).unionByName(
        as_event_stream(s_wire, DEVICE_STATUS_TOPIC, 1_000)
    )
    return consumer_stage(events)["counters"]


def pipeline_derive_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable CONTRACT gate for the full topology: the raw
    counter values depend on the generator's xxhash64 stream (engine-
    specific, hence `pipeline_derive`'s rows-only check), but the
    topology's invariants do not — every emitted violation type is in
    the reference allowlist, every counter is positive, and at least
    one violation of each allowlisted type appears at catalog volumes.
    The oracle states the constant row, so the driver machine-checks
    the pipeline contract each round instead of counting rows only."""
    from pyspark.sql import functions as F

    from kafka_flink_harshevents_spark.operators.violations import (
        ALLOWED_VIOLATION_TYPES,
    )

    # contract checking needs coverage, not throughput: run the same
    # topology at a tenth of the throughput entry's volume (still ≥5k
    # msgs at the driver's correctness SF — both types appear by ~100)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    n = max(int(ROWS_PER_SF * sf / 10), 1000)
    tel = synthetic_telemetry(spark, n, n_devices=97, seed=1234)
    v_wire, s_wire = derive_stage(tel)
    events = as_event_stream(v_wire, VIOLATIONS_TOPIC, 1_000).unionByName(
        as_event_stream(s_wire, DEVICE_STATUS_TOPIC, 1_000)
    )
    counters = consumer_stage(events)["counters"]
    allowed = sorted(ALLOWED_VIOLATION_TYPES)
    return counters.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.bool_and(F.col("violation_type").isin(*allowed)).alias(
            "all_types_allowed"
        ),
        F.bool_and(F.col("n") > 0).alias("counts_positive"),
        (F.count_distinct("violation_type") == F.lit(len(allowed))).alias(
            "all_types_seen"
        ),
    )


QUERIES = {
    "pipeline_derive": pipeline_derive,
    "pipeline_derive_gate": pipeline_derive_gate,
}
def _gate_oracle() -> str:
    from kafka_flink_harshevents_spark.operators.violations import (
        ALLOWED_VIOLATION_TYPES,
    )

    n = len(ALLOWED_VIOLATION_TYPES)
    return f"""
        SELECT CAST({n} AS BIGINT) AS n_types,
               TRUE AS all_types_allowed,
               TRUE AS counts_positive,
               TRUE AS all_types_seen
    """


ORACLES: dict[str, str] = {"pipeline_derive_gate": _gate_oracle()}
