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
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    n = max(int(ROWS_PER_SF * sf), 1000)
    tel = synthetic_telemetry(spark, n, n_devices=97, seed=1234)
    v_wire, s_wire = derive_stage(tel)
    events = as_event_stream(v_wire, VIOLATIONS_TOPIC, 1_000).unionByName(
        as_event_stream(s_wire, DEVICE_STATUS_TOPIC, 1_000)
    )
    return consumer_stage(events)["counters"]


QUERIES = {"pipeline_derive": pipeline_derive}
ORACLES: dict[str, str] = {}
