"""Multimodal catalog queries: binary media column plumbing, decode
feature extraction, frame sampling — over media manufactured
deterministically from the ``documents`` table (no real media ships in
the container; the bytes are real binary columns either way).

Oracle strategy: everything JVM-side (construction, lengths, hex) is
SQL-checkable in DuckDB; the mapInPandas decode path is checked through
byte-math oracles (documents text is pure ASCII, so ``ord(char) ==
payload byte`` lets DuckDB recompute the fake decoder's output exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.multimodal.media import (
    FRAME_SIZE,
    decode_media,
    media_from_documents,
    sample_frames,
)
from kafka_flink_harshevents_spark.queries._util import load


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_from_documents(load(spark, sf_dir, "documents"))


def mm_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column construction + JVM-side inspection: format routing,
    byte length, hex prefix. All pushdown-friendly column ops."""
    m = _media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.substring(F.hex("media"), 1, 16).alias("hex_prefix"),
    )


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched fake-decode stage; byte stats recomputed by the
    oracle via per-character ord() over the ASCII payload."""
    d = decode_media(_media(spark, sf_dir))
    return d.select(
        "doc_id",
        "format",
        "n_pixels",
        F.round("mean_intensity", 3).alias("mean_intensity"),
        "min_byte",
        "max_byte",
    )


def mm_frame_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1 row → N frames, every 3rd of 64-byte frames),
    aggregated per doc so the oracle is pure arithmetic."""
    frames = sample_frames(_media(spark, sf_dir), every_k=3)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.octet_length("frame_bytes")).alias("total_frame_bytes"),
    )


QUERIES = {
    "mm_media_stats": mm_media_stats,
    "mm_decode_features": mm_decode_features,
    "mm_frame_sample_counts": mm_frame_sample_counts,
}

# magic header lengths: png 4, jpeg 4, wav 4 (see multimodal.media._MAGIC)
_MEDIA_SQL = """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
           CASE doc_id % 3
                WHEN 0 THEN '\\x89\\x50\\x4E\\x47'::BLOB
                WHEN 1 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB
                ELSE 'RIFF'::BLOB END || encode(text) AS media,
           encode(text) AS payload,
           text
    FROM documents
"""

ORACLES = {
    "mm_media_stats": f"""
        WITH m AS ({_MEDIA_SQL})
        SELECT doc_id, format,
               octet_length(media) AS n_bytes,
               substr(hex(media), 1, 16) AS hex_prefix
        FROM m
    """,
    "mm_decode_features": f"""
        WITH m AS ({_MEDIA_SQL}),
        b AS (
            SELECT doc_id, format,
                   list_transform(range(1, length(text) + 1),
                                  i -> ord(substr(text, i, 1))) AS bytes
            FROM m
        )
        SELECT doc_id, format,
               CAST(len(bytes) AS BIGINT) AS n_pixels,
               round(list_avg(bytes), 3) AS mean_intensity,
               CAST(list_min(bytes) AS INTEGER) AS min_byte,
               CAST(list_max(bytes) AS INTEGER) AS max_byte
        FROM b
    """,
    "mm_frame_sample_counts": f"""
        WITH m AS ({_MEDIA_SQL}),
        f AS (
            SELECT doc_id,
                   CAST(floor(octet_length(payload) / {FRAME_SIZE}) AS BIGINT) AS n_frames
            FROM m
        )
        SELECT doc_id,
               CAST(ceil(n_frames / 3.0) AS BIGINT) AS n_sampled,
               CAST(ceil(n_frames / 3.0) AS BIGINT) * {FRAME_SIZE} AS total_frame_bytes
        FROM f
        WHERE n_frames > 0
    """,
}
