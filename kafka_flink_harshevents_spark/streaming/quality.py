"""Streaming document-quality gate + router — the reference's
side-output split (kafkaConsumer.js topic routing / O2, see
`plans/pipeline.py::consumer_stage`) applied to the LLM-data ingest
path: a continuous crawl scores every arriving document with EXACTLY
the batch quality battery (`queries.documents.quality_frame` — one
shared projection, so stream and batch can never drift) and routes it
keep / review / drop.

Scale shape: the scorer is a stateless narrow projection (array ops on
the row's own text — no shuffle, no state store); the split is the
standard multi-consumer filter over ONE scored stream, so the scan and
the scoring work are shared across all three sinks exactly like the
violations/status side-outputs. NULL text is dropped JVM-side before
scoring (the kmv/locf/dedup stream hygiene convention: a NULL would
score NULL and route nowhere, then poison downstream non-null
assumptions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.queries.documents import quality_frame

# bucket → route: the ingest policy the reference's threshold-derivation
# operators (F10) use — promote/hold/discard tiers.
ROUTE_BY_BUCKET = {"high": "keep", "medium": "review", "low": "drop"}


def with_quality(docs: DataFrame) -> DataFrame:
    """Append ``quality_score`` / ``quality_bucket`` / ``route`` to the
    frame IN PLACE (all original columns kept) — the stateless
    projection both the router and composed ingest pipelines build on.
    The score/bucket expressions come from the ONE shared factory
    (`queries.documents.quality_columns`), so drift from the batch
    entry is structurally impossible."""
    from kafka_flink_harshevents_spark.queries.documents import quality_columns

    score, bucket = quality_columns()
    route = (
        F.when(bucket == "high", F.lit("keep"))
        .when(bucket == "medium", F.lit("review"))
        .otherwise(F.lit("drop"))
    )
    return (
        docs.filter(F.col("text").isNotNull())
        .withColumn("quality_score", F.round(score, 4))
        .withColumn("quality_bucket", bucket)
        .withColumn("route", route)
    )


def quality_scored_stream(docs: DataFrame) -> DataFrame:
    """``(doc_id, text, …)`` stream → ``(doc_id, quality_score,
    quality_bucket, route)``: the shared scored stream every route
    consumer filters from."""
    return with_quality(docs).select(
        "doc_id", "quality_score", "quality_bucket", "route"
    )


def quality_route_streams(docs: DataFrame) -> dict[str, DataFrame]:
    """Side-output split: three filtered views over ONE scored stream
    (`consumer_stage` convention — the filter pushes into the shared
    scan, so scoring happens once however many sinks attach)."""
    scored = quality_scored_stream(docs)
    return {
        route: scored.filter(F.col("route") == route)
        for route in ("keep", "review", "drop")
    }
