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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.multimodal.media import (
    AHASH_BITS,
    FRAME_SIZE,
    ahash_media,
    decode_media,
    media_from_documents,
    resize_media,
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


RESIZE_W = 64
RESIZE_H = 64


def mm_resize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize stage as a catalog entry: Arrow-batched
    ``mapInPandas`` over the binary column (`multimodal.media
    .resize_media` — fake resampler in this container, real codec
    drop-in on a cluster with the libs), emitting the exact output
    geometry and byte budget per item. Narrow stage, no shuffle; the
    oracle recomputes the byte math (w·h·channels) per doc."""
    r = resize_media(_media(spark, sf_dir), RESIZE_W, RESIZE_H)
    return r.select("doc_id", "width", "height", "n_bytes_out")


MM_SHARD_BYTES = 4096
MM_PACK_LANES = 8


def mm_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export shard packing for media: concatenate each
    (format, lane) stream of media blobs in doc_id order and cut it into
    ~4 KB shards — the WebDataset-style layout step before writing tar
    shards. The multimodal twin of `doc_pack_sequences`: lanes
    (`doc_id % 8`) keep the cumulative sum shard-parallel, so adding
    executors scales packing throughput; within a lane the window is the
    standard ordered prefix sum, never a global sort.
    """
    m = _media(spark, sf_dir).select(
        "doc_id",
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.pmod("doc_id", F.lit(MM_PACK_LANES)).cast("long").alias("lane"),
    )
    w = (
        Window.partitionBy("format", "lane")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_bytes").over(w)
    return m.select(
        "doc_id",
        "format",
        "lane",
        "n_bytes",
        (cum - F.col("n_bytes")).alias("start_offset"),
        F.floor((cum - F.col("n_bytes")) / MM_SHARD_BYTES).cast("long").alias(
            "shard_idx"
        ),
    )


PHASH_BLOCKS = 4  # pigeonhole: Hamming <= 3 => >= 1 identical 15-bit block
PHASH_MAX_HAMMING = 3
# Sentinel twin id offset: far above any real doc_id, so the seeded
# near-dup row can never collide with corpus ids at any SF.
PHASH_SENTINEL_OFFSET = 1_000_000_000


def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate media pairs — the multimodal twin
    of `doc_simhash_pairs`, closing the dedup family over the binary
    column: aHash fingerprints from the Arrow decode stage
    (`multimodal.media.ahash_media`), then Manku-style pigeonhole
    blocking — 60 bits split into 4 disjoint 15-bit blocks, so every
    pair within Hamming distance 3 shares a block (EXACT recall) and
    candidate generation is an equi-join on (block_idx, block_value)
    with one xor-popcount verify per candidate.

    Scale shape: the fingerprint stream is one narrow decode pass;
    shuffle is keyed by (block, value) — colliding media only, never
    all pairs; the per-bucket pair expansion is array-local (no
    self-join re-evaluating the decode).

    A deterministic SENTINEL TWIN is unioned in — one copy of the first
    hash-eligible doc, re-id'd far outside the corpus id range — so the
    query emits ≥1 verified pair (hamming 0) at EVERY scale factor: at
    sf0.01 the organic corpus has no near-dup media, and without the
    sentinel both engines agree on an empty result, which a correctness
    row would confirm vacuously (VERDICT r03 item 6)."""
    from kafka_flink_harshevents_spark.operators.pigeonhole import pigeonhole_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sentinel = (
        docs.filter(F.length("text") >= AHASH_BITS)
        .orderBy("doc_id")
        .limit(1)
        .select(
            (F.col("doc_id") + F.lit(PHASH_SENTINEL_OFFSET)).alias("doc_id"),
            "text",
        )
    )
    fps = ahash_media(media_from_documents(docs.unionByName(sentinel)))
    return pigeonhole_pairs(
        fps,
        id_col="doc_id",
        fp_col="phash",
        bits=AHASH_BITS,
        n_blocks=PHASH_BLOCKS,
        max_hamming=PHASH_MAX_HAMMING,
    )


QUERIES = {
    "mm_media_stats": mm_media_stats,
    "mm_phash_pairs": mm_phash_pairs,
    "mm_decode_features": mm_decode_features,
    "mm_frame_sample_counts": mm_frame_sample_counts,
    "mm_pack_shards": mm_pack_shards,
    "mm_resize_batch": mm_resize_batch,
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
    "mm_phash_pairs": f"""
        WITH m AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + {PHASH_SENTINEL_OFFSET} AS doc_id, text
            FROM (SELECT doc_id, text FROM documents
                  WHERE length(text) >= {AHASH_BITS}
                  ORDER BY doc_id LIMIT 1)
        ),
        b AS (
            SELECT doc_id,
                   list_transform(range(1, length(text) + 1),
                                  i -> ord(substr(text, i, 1))) AS px
            FROM m
        ),
        s AS (
            SELECT doc_id, px, len(px) AS n,
                   list_sum(px) AS total
            FROM b WHERE len(px) >= {AHASH_BITS}
        ),
        fp AS (
            SELECT doc_id,
                   CAST(list_sum(list_transform(range(0, {AHASH_BITS}), i ->
                       CASE WHEN list_sum(px[(i * n) // {AHASH_BITS} + 1 :
                                             ((i + 1) * n) // {AHASH_BITS}]) * n
                                 > total * (((i + 1) * n) // {AHASH_BITS}
                                            - (i * n) // {AHASH_BITS})
                            THEN (CAST(1 AS BIGINT) << ({AHASH_BITS} - 1 - i))
                            ELSE 0 END)) AS BIGINT) AS phash
            FROM s
        ),
        blocks AS (
            SELECT doc_id, phash, i AS bi,
                   (phash >> CAST((({PHASH_BLOCKS} - 1 - i) * {AHASH_BITS // PHASH_BLOCKS}) AS BIGINT))
                       & {(1 << (AHASH_BITS // PHASH_BLOCKS)) - 1} AS bv
            FROM fp CROSS JOIN range(0, {PHASH_BLOCKS}) t(i)
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
                   a.phash AS pa, b.phash AS pb
            FROM blocks a
            JOIN blocks b ON a.bi = b.bi AND a.bv = b.bv
                         AND a.doc_id < b.doc_id
        )
        SELECT da, db, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(pa, pb)) <= {PHASH_MAX_HAMMING}
    """,
    "mm_pack_shards": f"""
        WITH m AS ({_MEDIA_SQL}),
        s AS (
            SELECT doc_id, format,
                   CAST(octet_length(media) AS BIGINT) AS n_bytes,
                   CAST(doc_id % {MM_PACK_LANES} AS BIGINT) AS lane
            FROM m
        ),
        c AS (
            SELECT doc_id, format, lane, n_bytes,
                   sum(n_bytes) OVER (
                       PARTITION BY format, lane ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum
            FROM s
        )
        SELECT doc_id, format, lane, n_bytes,
               CAST(cum - n_bytes AS BIGINT) AS start_offset,
               CAST(floor((cum - n_bytes) / {MM_SHARD_BYTES}.0) AS BIGINT) AS shard_idx
        FROM c
    """,
    "mm_resize_batch": f"""
        SELECT doc_id,
               CAST({RESIZE_W} AS INTEGER) AS width,
               CAST({RESIZE_H} AS INTEGER) AS height,
               CAST(3 * {RESIZE_W} * {RESIZE_H} AS BIGINT) AS n_bytes_out
        FROM documents
    """,
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
