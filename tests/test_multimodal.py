"""Multimodal plumbing: binary construction, Arrow-batched decode,
resize stub, frame sampling (flatMap shape), and oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.multimodal.media import (
    FRAME_SIZE,
    decode_media,
    media_from_documents,
    resize_media,
    sample_frames,
)
from kafka_flink_harshevents_spark.queries._util import load

from tests.conftest import SF_DIR


def test_media_construction(spark):
    m = media_from_documents(load(spark, SF_DIR, "documents"))
    row = m.filter(F.col("doc_id") == 0).first()
    assert bytes(row["media"])[:4] == b"\x89PNG"  # doc 0 -> png
    assert row["media_meta"]["format"] == "png"
    assert row["media_meta"]["n_bytes"] == len(bytes(row["media"]))
    assert m.schema["media"].dataType.typeName() == "binary"


def test_decode_matches_python(spark):
    """The mapInPandas decode equals a driver-side recompute on a sample."""
    m = media_from_documents(load(spark, SF_DIR, "documents")).limit(20)
    decoded = {r["doc_id"]: r for r in decode_media(m).collect()}
    import numpy as np

    for r in m.collect():
        meta = r["media_meta"]
        magic_len = 4
        px = np.frombuffer(bytes(r["media"])[magic_len:], dtype=np.uint8)
        d = decoded[r["doc_id"]]
        assert d["n_pixels"] == len(px)
        assert d["mean_intensity"] == float(px.mean())
        assert (d["min_byte"], d["max_byte"]) == (int(px.min()), int(px.max()))


def test_resize_stub(spark):
    m = media_from_documents(load(spark, SF_DIR, "documents")).limit(5)
    out = resize_media(m, 32, 16).collect()
    assert all(r["n_bytes_out"] == 32 * 16 * 3 for r in out)
    assert len(out) == 5


def test_frame_sampling_flatmap(spark):
    """1 row -> N rows; every 3rd 64-byte frame; all frames full-size."""
    m = media_from_documents(load(spark, SF_DIR, "documents"))
    frames = sample_frames(m, every_k=3)
    agg = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.octet_length("frame_bytes")).alias("minlen"),
        F.max("frame_idx").alias("maxidx"),
    )
    joined = agg.join(
        m.select("doc_id", F.col("media_meta.n_bytes").alias("n_bytes")), "doc_id"
    )
    for r in joined.collect():
        n_frames = (r["n_bytes"] - 4) // FRAME_SIZE
        expect = (n_frames + 2) // 3
        assert r["n"] == expect, r
        assert r["minlen"] == FRAME_SIZE
        assert r["maxidx"] % 3 == 0


def test_decode_media_uses_real_codec_when_present(spark, monkeypatch):
    """With a codec importable, decode_media must USE it (not raise).
    Inject a fake codec module and assert the features come from its
    pixels, not the byte-fallback. Classes are local so cloudpickle
    ships them by value to the workers."""
    from kafka_flink_harshevents_spark.multimodal import media as media_mod

    class _FakeImg:
        def convert(self, mode):
            return self

        def __array__(self, dtype=None):
            import numpy as np

            return np.arange(16, dtype=np.uint8).reshape(4, 4)

    class _FakeCodec:
        """Stands in for PIL.Image: open() -> image -> convert('L') -> array."""

        @staticmethod
        def open(bio):
            return _FakeImg()

    monkeypatch.setattr(media_mod, "_try_real_decoder", lambda: _FakeCodec)
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    m = media_mod.media_from_documents(docs)
    row = media_mod.decode_media(m).collect()[0]
    # pixels 0..15: n=16, mean=7.5, min=0, max=15
    assert (row["n_pixels"], row["mean_intensity"], row["min_byte"], row["max_byte"]) == (
        16,
        7.5,
        0,
        15,
    )


def test_phash_pairs_near_identical_media(spark, tmp_path):
    """The aHash pigeonhole guarantee on hand-built media: an exact
    byte-duplicate pairs at Hamming 0, a one-character edit stays
    within the <=3 threshold (one byte moves one block sum), and a
    fully different payload pairs with neither. The synthetic corpus
    has no organic near-identical media (min pairwise Hamming 8) — the
    catalog entry seeds a sentinel twin so its driver row is never
    vacuous; this test pins the operator's behavior where real
    near-identical media exist."""
    from kafka_flink_harshevents_spark.queries.multimodal import mm_phash_pairs

    base = ("the quick brown fox jumps over the lazy dog again and again " * 10).strip()
    edited = "T" + base[1:]  # one byte changed
    rows = [
        (3, base),
        (6, base),  # exact duplicate payload (same format lane: 3%3 == 6%3)
        (9, edited),
        (12, "Z" * len(base)),  # uniform payload — all ties, phash 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    pairs = {
        (r["da"], r["db"]): r["hamming"]
        for r in mm_phash_pairs(spark, str(tmp_path)).collect()
    }
    assert pairs.get((3, 6)) == 0, f"exact duplicate must pair at Hamming 0: {pairs}"
    assert (3, 9) in pairs and pairs[(3, 9)] <= 3, f"1-char edit must pair: {pairs}"
    # the sentinel twin duplicates the first hash-eligible doc (id 3)
    from kafka_flink_harshevents_spark.queries.multimodal import PHASH_SENTINEL_OFFSET

    assert pairs.get((3, 3 + PHASH_SENTINEL_OFFSET)) == 0
    assert not any(
        12 in p for p in pairs
    ), f"unrelated media must not pair: {pairs}"


def test_phash_pairs_nonvacuous_on_corpus(spark):
    """The catalog entry must emit >=1 verified pair at every SF — the
    sentinel twin guarantees it even where the organic corpus has no
    near-dup media, so a driver correctness row is never vacuously
    green on an empty result."""
    from kafka_flink_harshevents_spark.queries.multimodal import (
        PHASH_SENTINEL_OFFSET,
        mm_phash_pairs,
    )
    from tests.conftest import SF_DIR

    rows = mm_phash_pairs(spark, SF_DIR).collect()
    assert rows, "sentinel twin missing — phash pairs vacuously empty"
    assert any(r["db"] >= PHASH_SENTINEL_OFFSET and r["hamming"] == 0 for r in rows)


def test_neardup_clusters_and_report_on_handbuilt_media(spark, tmp_path):
    """The cross-modal dedup closure on hand-built media: the exact
    twin + 1-char edit form ONE cluster under the canonical min id,
    unrelated media are singletons, and the one-row report counts all
    of it (members, clusters, exact dups via byte identity, survivors,
    retention)."""
    from kafka_flink_harshevents_spark.queries.multimodal import (
        PHASH_SENTINEL_OFFSET,
        mm_dedup_report,
        mm_neardup_clusters,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        * 10
    ).strip()
    rows = [
        (3, base),
        (6, base),        # exact byte duplicate (same format lane)
        (9, "T" + base[1:]),  # near-dup: 1-char edit
        (12, "Z" * len(base)),  # unrelated
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    cl = {
        r["doc_id"]: r["cluster_id"]
        for r in mm_neardup_clusters(spark, str(tmp_path)).collect()
    }
    sent = 3 + PHASH_SENTINEL_OFFSET
    # universe = 4 docs + sentinel; {3, 6, 9, sentinel} one component
    assert set(cl) == {3, 6, 9, 12, sent}
    assert cl[3] == cl[6] == cl[9] == cl[sent] == 3
    assert cl[12] == 12  # singleton labels itself
    rep = mm_dedup_report(spark, str(tmp_path)).collect()[0]
    assert rep["n_media"] == 5
    # byte identity: 3 and 6 share format+payload; the sentinel is a
    # different format lane, so 1 exact dup
    assert rep["n_exact_dup_media"] == 1
    assert rep["n_neardup_member_items"] == 3   # 6, 9, sentinel
    assert rep["n_neardup_clusters"] == 1
    # survivors: 3 (canonical on both axes) and 12 — 9 and 6 fall to
    # the cluster rule, the sentinel to both
    assert rep["n_clean_media"] == 2
    assert rep["retention"] == 0.4
