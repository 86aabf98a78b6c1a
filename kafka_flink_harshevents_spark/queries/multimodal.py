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

    fps = ahash_media(media_from_documents(_media_universe(spark, sf_dir)))
    return pigeonhole_pairs(
        fps,
        id_col="doc_id",
        fp_col="phash",
        bits=AHASH_BITS,
        n_blocks=PHASH_BLOCKS,
        max_hamming=PHASH_MAX_HAMMING,
    )


def _media_universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ the pHash sentinel twin — the id universe every
    dedup-closure entry (pairs / clusters / report) is defined over,
    so the three stay mutually consistent at every scale factor.

    The twin is materialized with ONE bounded TakeOrdered collect and
    unioned back as a LITERAL row (the `_ingest_frames` convention):
    the declarative spelling embedded the global orderBy/limit subtree
    in the union, and every downstream action of every consumer
    (`mm_dedup_report` evaluates the universe from several aggregation
    branches) re-ran a full scan + sort just to rebuild this one row."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    seed = (
        docs.filter(F.length("text") >= AHASH_BITS)
        .orderBy("doc_id")
        .limit(1)
        .collect()
    )
    sentinel = spark.createDataFrame(
        [
            (int(r["doc_id"]) + PHASH_SENTINEL_OFFSET, r["text"])
            for r in seed
        ],
        "doc_id long, text string",
    )
    return docs.unionByName(sentinel)


def mm_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the pHash near-dup media pair graph —
    the canonical-cluster END state the document dedup path has
    (``doc_neardup_clusters``), closed over the binary media column:
    every media item mapped to its cluster's canonical id (min doc_id
    in the component; singletons map to themselves).

    Reuses ``operators/graph.py::min_label_components`` (three
    size-guarded paths, pointer jumping), so every loop table is ∝ the
    near-dup pair graph, not the corpus — the media-universe table is
    touched exactly once, at the final left join. The sentinel twin
    guarantees ≥1 non-trivial cluster at every SF (the vacuous-empty
    rule mm_phash_pairs documents)."""
    from kafka_flink_harshevents_spark.operators.graph import (
        min_label_components,
    )

    pairs = mm_phash_pairs(spark, sf_dir).select("da", "db")
    labels = min_label_components(pairs, "da", "db").select(
        F.col("node").alias("nid"), F.col("component").alias("cid")
    )
    return (
        _media_universe(spark, sf_dir)
        .select("doc_id")
        # no broadcast hint: labels ∝ media-with-near-dups, unbounded
        # at corpus scale — AQE converts to broadcast when small
        .join(labels, F.col("doc_id") == F.col("nid"), "left")
        .select(
            "doc_id",
            F.coalesce("cid", F.col("doc_id")).alias("cluster_id"),
        )
    )


def mm_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-dedup observability: the one-row summary a multimodal
    corpus run publishes — total items, byte-distinct items, exact-dup
    items, pHash near-dup pairs/members/clusters, clean survivors
    (exact-canonical ∧ cluster-canonical) and the retention ratio —
    the same END state ``doc_dedup_report`` gives the text path.

    The exact-dup identity is ``md5(format || '|' || payload)`` —
    format + payload determine the media bytes 1:1 by construction
    (``multimodal.media.media_from_documents``), and the string form
    keeps the oracle exact (DuckDB's md5 is VARCHAR-only). One
    evaluation of the pair graph feeds both the pair count and the
    labeling (localCheckpoint, the doc report's convention); all
    per-item counts come from ONE enriched corpus pass, plus a 1-row
    broadcast join for the pair count — constant combine work."""
    from kafka_flink_harshevents_spark.operators.graph import (
        min_label_components,
    )

    from kafka_flink_harshevents_spark.multimodal.media import (
        media_format_col,
    )

    uni = _media_universe(spark, sf_dir)
    d = uni.select(
        "doc_id",
        F.md5(F.concat_ws("|", media_format_col(), "text")).alias("h"),
    )
    pairs = (
        mm_phash_pairs(spark, sf_dir).select("da", "db").localCheckpoint()
    )
    labels = min_label_components(pairs, "da", "db").select(
        F.col("node").alias("nid"), F.col("component").alias("cid")
    )
    # ONE enriched corpus pass (guide §1.2/§2.4): the exact-dup
    # canonical rides a window over h (the same exchange the old
    # groupBy+join-back pair paid twice), the cluster id rides the
    # label join (∝ near-dup graph; AQE broadcasts it when small), and
    # every per-item report count folds into a single aggregate —
    # replacing four aggregation branches (tot / mem_stats / n_clean /
    # the clean join chain) that each re-derived d from a fresh scan.
    member = F.col("doc_id") != F.col("cluster_id")
    clean = (F.col("doc_id") == F.col("canon")) & ~member
    stats = (
        d.withColumn("canon", F.min("doc_id").over(Window.partitionBy("h")))
        .join(labels, F.col("doc_id") == F.col("nid"), "left")
        .select(
            "doc_id",
            "h",
            "canon",
            F.coalesce("cid", "doc_id").alias("cluster_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.count_distinct("h").cast("long").alias("n_unique_media"),
            F.count(F.when(member, True)).cast("long").alias(
                "n_neardup_member_items"
            ),
            F.count_distinct(F.when(member, F.col("cluster_id")))
            .cast("long")
            .alias("n_neardup_clusters"),
            F.count(F.when(clean, True)).cast("long").alias(
                "n_clean_media"
            ),
        )
    )
    n_pairs = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_neardup_pairs")
    )
    return (
        stats.join(F.broadcast(n_pairs))
        .select(
            "n_media",
            "n_unique_media",
            (F.col("n_media") - F.col("n_unique_media")).alias(
                "n_exact_dup_media"
            ),
            "n_neardup_pairs",
            "n_neardup_member_items",
            "n_neardup_clusters",
            "n_clean_media",
            F.when(
                F.col("n_media") > 0,
                F.round(F.col("n_clean_media") / F.col("n_media"), 4),
            ).alias("retention"),
        )
    )


QUERIES = {
    "mm_media_stats": mm_media_stats,
    "mm_phash_pairs": mm_phash_pairs,
    "mm_neardup_clusters": mm_neardup_clusters,
    "mm_dedup_report": mm_dedup_report,
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

# Shared pHash CTE chain: muni (the docs ∪ sentinel universe) → pairs
# (da, db, hamming) — reused verbatim by the pairs / clusters / report
# oracles so the three stay definitionally consistent.
_PHASH_CTES = f"""
        muni AS (
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
            FROM muni
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
        ),
        pairs AS (
            SELECT da, db,
                   CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
            FROM cand WHERE bit_count(xor(pa, pb)) <= {PHASH_MAX_HAMMING}
        )
"""

# Recursive closure over the pair graph (the doc-path oracle shape):
# reach seeded from the full universe so singletons label themselves.
_PHASH_CLUSTER_CTES = f"""{_PHASH_CTES},
        edges AS (
            SELECT da AS s, db AS d FROM pairs
            UNION
            SELECT db AS s, da AS d FROM pairs
        ),
        reach(s, d) AS (
            SELECT doc_id AS s, doc_id AS d FROM muni
            UNION
            SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        ),
        clusters AS (
            SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s
        )
"""

ORACLES = {
    "mm_phash_pairs": f"""
        WITH {_PHASH_CTES}
        SELECT da, db, hamming FROM pairs
    """,
    "mm_neardup_clusters": f"""
        WITH RECURSIVE {_PHASH_CLUSTER_CTES}
        SELECT doc_id, cluster_id FROM clusters
    """,
    "mm_dedup_report": f"""
        WITH RECURSIVE {_PHASH_CLUSTER_CTES},
        d AS (
            SELECT doc_id,
                   md5(concat(
                       CASE doc_id % 3 WHEN 0 THEN 'png'
                            WHEN 1 THEN 'jpeg' ELSE 'wav' END,
                       '|', text)) AS h
            FROM muni
        ),
        ex AS (SELECT h, min(doc_id) AS canon FROM d GROUP BY 1),
        members AS (SELECT doc_id, cluster_id FROM clusters
                    WHERE doc_id <> cluster_id),
        clean AS (
            SELECT d.doc_id
            FROM d
            JOIN ex USING (h)
            JOIN clusters c ON d.doc_id = c.doc_id
            WHERE d.doc_id = ex.canon AND d.doc_id = c.cluster_id
        )
        SELECT (SELECT count(*) FROM d) AS n_media,
               (SELECT count(DISTINCT h) FROM d) AS n_unique_media,
               (SELECT count(*) FROM d)
                 - (SELECT count(DISTINCT h) FROM d) AS n_exact_dup_media,
               (SELECT count(*) FROM pairs) AS n_neardup_pairs,
               (SELECT count(*) FROM members) AS n_neardup_member_items,
               (SELECT count(DISTINCT cluster_id) FROM members)
                   AS n_neardup_clusters,
               (SELECT count(*) FROM clean) AS n_clean_media,
               CASE WHEN (SELECT count(*) FROM d) > 0
                    THEN round((SELECT count(*) FROM clean) * 1.0
                               / (SELECT count(*) FROM d), 4)
               END AS retention
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
