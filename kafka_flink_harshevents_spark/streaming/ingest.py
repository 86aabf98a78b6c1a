"""Streaming document ingest with online dedup — the streaming twin of
the batch ``doc_incremental_dedup`` query: a live feed of crawled
documents is deduplicated (a) against the HISTORICAL corpus and (b)
within the stream itself, before reaching the training-data sink.

Shapes that survive 100 TB/day:
- history is joined as a STATIC keys-only frame (md5 text hashes, and
  optionally distinct spans) — Spark re-plans the static side per
  micro-batch and broadcasts it when small; at real scale this is the
  bucketed-parquet hash manifest written by the batch pipeline, not the
  corpus;
- within-stream dedup uses ``dropDuplicatesWithinWatermark`` keyed on
  the text hash, so state expires with the watermark instead of growing
  for the stream's lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_ingest_stream(
    docs: DataFrame,
    history_hashes: DataFrame,
    *,
    ts_col: str = "ingest_ts",
    delay: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` is a STREAMING frame with at least (``text_col``,
    ``ts_col``); ``history_hashes`` is a static frame with one column
    ``text_hash`` (md5 hex of historical texts).

    Returns the surviving stream: history replays dropped by a
    LEFT-ANTI stream-static join on the hash, then within-stream
    duplicates dropped by watermark-bounded state. Column ``text_hash``
    is kept for downstream manifests.
    """
    hashed = docs.withColumn("text_hash", F.md5(F.col(text_col)))
    fresh = hashed.join(
        F.broadcast(history_hashes.select("text_hash").distinct()),
        "text_hash",
        "left_anti",
    )
    return fresh.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )


def clean_ingest_stream(
    docs: DataFrame,
    history_hashes: DataFrame,
    *,
    ts_col: str = "ingest_ts",
    delay: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """The full continuous-crawl ingest gate in one stream: quality
    score + keep-route (`streaming.quality.quality_scored_stream` —
    the SAME projection as the batch `doc_quality_score`), then online
    dedup against history and within-stream
    (:func:`dedup_ingest_stream`). Order matters and is deliberate:
    scoring is a stateless projection (cheap, drops low-quality rows
    BEFORE they touch dedup state), dedup is the only stateful stage —
    so state size tracks the KEPT stream, not the raw crawl.

    Emits survivors with (doc_id, text_hash, quality_score,
    quality_bucket) — the manifest row a training-data sink appends.
    """
    from kafka_flink_harshevents_spark.streaming.quality import with_quality

    kept = with_quality(docs).filter(F.col("route") == "keep")
    survivors = dedup_ingest_stream(
        kept, history_hashes, ts_col=ts_col, delay=delay, text_col=text_col
    )
    return survivors.select(
        "doc_id", "text_hash", "quality_score", "quality_bucket"
    )
