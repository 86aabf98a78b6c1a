"""Binary media columns + decode/feature/resize/frame-sample operators.

Design for 100 TB: media bytes never leave the executor JVM except
through Arrow batches into the pandas stages; all *selective* work
(format routing, size filters) is plain column predicates that push down
to the parquet scan, so only the matching blobs are ever shipped to
Python. Each ``mapInPandas`` stage is narrow (no shuffle) and preserves
the input partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic prefixes for the three fake formats
_MAGIC = {"png": b"\x89PNG", "jpeg": b"\xff\xd8\xff\xe0", "wav": b"RIFF"}

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def media_format_col():
    """The format-routing expression (``doc_id % 3`` → png/jpeg/wav) —
    the ONE definition of which lane a doc's media lands in, shared by
    the construction below and every consumer that needs the format
    without carrying the binary column (e.g. ``mm_dedup_report``'s
    byte-identity key)."""
    return (
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "jpeg")
        .otherwise("wav")
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Manufacture a deterministic binary media column from the
    ``documents`` table (the container has no real media), JVM-side:
    magic header by ``doc_id % 3`` + the UTF-8 payload of ``text``.
    Metadata dims derive from payload length so they're SQL-checkable."""
    fmt = media_format_col()
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_MAGIC["png"]))
        .when(F.col("doc_id") % 3 == 1, F.lit(_MAGIC["jpeg"]))
        .otherwise(F.lit(_MAGIC["wav"]))
    )
    payload = F.encode(F.col("text"), "UTF-8")
    media = F.concat(magic, payload)
    n_bytes = F.octet_length(media).cast("long")
    width = (F.pmod(F.col("doc_id") * 37 + 64, F.lit(960)) + 64).cast("int")
    height = (F.pmod(F.col("doc_id") * 53 + 64, F.lit(540)) + 64).cast("int")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            fmt.alias("format"),
            n_bytes.alias("n_bytes"),
            width.alias("width"),
            height.alias("height"),
            F.lit(3).cast("int").alias("channels"),
        ).alias("media_meta"),
    )


def _try_real_decoder():
    """Hook for a real codec. PIL/cv2/soundfile are not in this
    container, so this returns None and operators fall back to the
    deterministic fake; on a cluster with the libs installed the import
    succeeds and the same plumbing carries real pixels."""
    try:  # pragma: no cover - not installed here
        import PIL.Image  # noqa: F401

        return PIL.Image
    except Exception:
        return None


def _fake_pixels(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: interpret payload bytes as pixels."""
    return np.frombuffer(payload, dtype=np.uint8)


def _decode_pixels(decoder, blob: bytes, magic_len: int) -> np.ndarray:
    """ONE decode policy for every pixel consumer (features, aHash):
    real codec where importable, per-payload fallback to the
    deterministic byte decode otherwise — keeping the fingerprint path
    and the feature path reading the SAME pixels."""
    if decoder is not None:  # pragma: no cover — codec not in container
        import io

        try:
            img = decoder.open(io.BytesIO(blob)).convert("L")
            return np.asarray(img, dtype=np.uint8).ravel()
        except Exception:
            pass  # undecodable payload → deterministic fallback
    return _fake_pixels(blob[magic_len:])


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode + per-item feature extraction as one Arrow-batched
    ``mapInPandas`` stage (narrow; batch shape = Arrow record batches of
    whole rows). When a real codec is importable (``_try_real_decoder``)
    each blob is decoded to grayscale pixels; payloads the codec rejects
    — and every payload when no codec exists, as in this container —
    fall back to the deterministic byte-decode so the operator is total
    (the reference pipeline's drop-nothing leniency applied to media)."""
    decoder = _try_real_decoder()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "format": pdf["media_meta"].map(lambda m: m["format"]),
            }
            n, mean, std, lo, hi = [], [], [], [], []
            for blob, meta in zip(pdf["media"], pdf["media_meta"]):
                magic_len = len(_MAGIC[meta["format"]])
                px = _decode_pixels(decoder, bytes(blob), magic_len)
                n.append(len(px))
                mean.append(float(px.mean()) if len(px) else 0.0)
                std.append(float(px.std()) if len(px) else 0.0)
                lo.append(int(px.min()) if len(px) else 0)
                hi.append(int(px.max()) if len(px) else 0)
            out.update(
                n_pixels=pd.Series(n, dtype="int64"),
                mean_intensity=mean,
                std_intensity=std,
                min_byte=pd.Series(lo, dtype="int32"),
                max_byte=pd.Series(hi, dtype="int32"),
            )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes_out", T.LongType()),
    ]
)


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stub: real resampling needs a codec; the fake computes the
    exact output byte size (w*h*channels) and keeps the full pandas-UDF
    plumbing, so swapping in a real resizer changes one inner function."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            channels = pdf["media_meta"].map(lambda m: int(m["channels"]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": np.int32(target_w),
                    "height": np.int32(target_h),
                    "n_bytes_out": (channels * target_w * target_h).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


AHASH_BITS = 60  # stays inside a signed long (same budget as SimHash pairs)


def ahash_media(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash, the block-mean member of the
    pHash family) per media item: decode to a pixel stream, split it
    into AHASH_BITS equal blocks, bit i = 1 iff block i's mean exceeds
    the global mean. The comparison is integer cross-multiplication
    (``block_sum · n > total · block_len``) so no float enters the
    fingerprint — bit-identical across engines and partitionings.

    Same Arrow ``mapInPandas`` plumbing as `decode_media` (narrow, no
    shuffle); items with fewer than AHASH_BITS pixels are dropped (a
    hash over near-empty media is all ties, not a fingerprint).
    """
    decoder = _try_real_decoder()
    bit_weights = 1 << np.arange(AHASH_BITS - 1, -1, -1, dtype=object)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["media_meta"]
            ):
                px = _decode_pixels(decoder, bytes(blob), len(_MAGIC[meta["format"]]))
                n = len(px)
                if n < AHASH_BITS:
                    continue
                # all block sums in ONE vectorized reduction (reduceat
                # over the block boundaries), not 60 slice-sums
                bounds = (np.arange(AHASH_BITS, dtype=np.int64) * n) // AHASH_BITS
                sums = np.add.reduceat(px.astype(np.int64), bounds)
                lens = np.diff(np.append(bounds, n))
                total = int(px.sum())
                bits = sums * n > total * lens
                h = int((bit_weights[bits]).sum())
                ids.append(int(doc_id))
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, schema="doc_id long, phash long")


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)

FRAME_SIZE = 64  # fake codec: fixed 64-byte frames


def sample_frames(media: DataFrame, every_k: int) -> DataFrame:
    """1 row in → N frame rows out (video frame sampling): the payload is
    chunked into fixed 64-byte frames and every k-th frame is emitted.
    mapInPandas doubles as a flatMap here — output batches may have more
    rows than input batches, no shuffle involved."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["media_meta"]
            ):
                payload = bytes(blob)[len(_MAGIC[meta["format"]]) :]
                n_frames = len(payload) // FRAME_SIZE
                for i in range(0, n_frames, every_k):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(payload[i * FRAME_SIZE : (i + 1) * FRAME_SIZE])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": frames,
                }
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
