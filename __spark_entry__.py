"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship query (TPC-H Q1 shape) on sf0.001.
``queries`` — every implemented operator from SURVEY.md §2 plus the
              training-data-pipeline extensions (dedup / similarity /
              text analysis), as (spark, sf_dir) -> DataFrame callables.
``oracle_sql`` — DuckDB-dialect twins; the two keys missing here
              (emb_knn_pq raw rows — iterative k-means training;
              pipeline_derive — generator-based) are designed
              rows-only and PINNED to the catalog tail, permanently
              outside the driver's 50-entry window; their hashable
              contracts live in the oracled gate entries
              (`emb_knn_pq_recall`, `pipeline_derive_gate`).
              `emb_knn_lsh` is fully oracled (deterministic
              hyperplanes inlined).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_flink_harshevents_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kafka_flink_harshevents_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
