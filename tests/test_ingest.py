"""Corpus-ingest recipe (plans/ingest.py) — the dedup-family ∘
lakehouse loop: verdict correctness against hand-built duplicates,
exactly-once crash replay (the fingerprint MERGE must be idempotent and
the txn markers must resume a half-landed batch), and the streaming
sink form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.plans.ingest import (
    corpus_ingest,
    corpus_ingest_sink,
    create_fingerprint_table,
)
from kafka_flink_harshevents_spark.sources.txlog import TxTable


def _tables(spark, tmp_path):
    corpus = TxTable.create(
        spark, str(tmp_path / "corpus"), key_cols=("doc_id",),
        order_col="ver", n_buckets=2,
    )
    fps = create_fingerprint_table(
        spark, str(tmp_path / "fps"), n_buckets=2
    )
    return corpus, fps


_HIST = [
    (1, "the quick brown fox jumps over the lazy dog again and again", 1),
    (2, "completely different historical content with many unique words", 1),
]
_SCHEMA = "doc_id long, text string, ver long"


def test_verdicts_and_store_growth(spark, tmp_path):
    corpus, fps = _tables(spark, tmp_path)
    hist = spark.createDataFrame(_HIST, _SCHEMA)
    r0 = corpus_ingest(corpus, fps, hist)
    assert r0["kept"] == 2 and r0["docs_in"] == 2
    batch = spark.createDataFrame(
        [
            # exact copy of doc 1
            (10, _HIST[0][1], 1),
            # shares doc 1's first 8-word span (span containment)
            (11, "the quick brown fox jumps over the lazy "
                 "entirely novel tail of words here", 1),
            # fresh
            (12, "nothing in common with anything stored before now", 1),
        ],
        _SCHEMA,
    )
    r = corpus_ingest(corpus, fps, batch)
    assert r["docs_in"] == 3
    assert r["exact_dups"] == 1  # doc 10
    assert r["span_dups"] >= 1   # doc 10 (full overlap) + doc 11
    assert r["kept"] == 1        # only doc 12
    got = sorted(r["doc_id"] for r in corpus.read().collect())
    assert got == [1, 2, 12]
    # the accepted doc's fingerprints entered the store: an exact copy
    # of 12 is now caught
    r2 = corpus_ingest(
        corpus, fps,
        spark.createDataFrame([(13, batch.collect()[2]["text"], 1)],
                              _SCHEMA),
    )
    assert r2["exact_dups"] == 1 and r2["kept"] == 0


def test_quality_routing_excludes_fingerprints(spark, tmp_path):
    corpus, fps = _tables(spark, tmp_path)
    low = "a a a a"  # tiny + repetitious → low score
    r = corpus_ingest(
        corpus, fps,
        spark.createDataFrame([(1, low, 1)], _SCHEMA),
        min_quality=0.5,
    )
    assert r["low_quality"] == 1 and r["kept"] == 0
    assert corpus.latest_version() == 1  # nothing committed
    # rejected docs leave NO fingerprints: the same text re-judged
    r2 = corpus_ingest(
        corpus, fps,
        spark.createDataFrame([(2, low, 1)], _SCHEMA),
    )
    assert r2["exact_dups"] == 0 and r2["kept"] == 1


def test_crash_replay_exactly_once(spark, tmp_path):
    """Crash between the corpus append and the fingerprint merge →
    replaying the same txn resumes to the clean-run end state; a full
    replay after success is a no-op; and the fingerprint MERGE itself
    is idempotent (same keys re-merge to the same single row)."""
    corpus, fps = _tables(spark, tmp_path)
    corpus_ingest(
        corpus, fps, spark.createDataFrame(_HIST, _SCHEMA),
        txn={"app_id": "seed", "batch_id": 0},
    )
    batch = spark.createDataFrame(
        [(10, "fresh content number one of the replay test", 1),
         (11, _HIST[0][1], 1)],
        _SCHEMA,
    )
    txn = {"app_id": "ing", "batch_id": 1}

    # simulate the crash: let the corpus append commit, fail the merge
    real_merge = fps.merge_upsert
    def boom(*a, **k):
        raise RuntimeError("crash before fingerprint merge")
    fps.merge_upsert = boom
    with pytest.raises(RuntimeError, match="crash"):
        corpus_ingest(corpus, fps, batch, txn=txn)
    fps.merge_upsert = real_merge
    v_corpus_after_crash = corpus.latest_version()
    assert corpus.last_committed_batch("ing") == 1  # append landed
    assert fps.last_committed_batch("ing") == -1    # merge did not

    # replay the SAME call: corpus skipped, fingerprints merged
    r = corpus_ingest(corpus, fps, batch, txn=txn)
    assert not r["replayed"]
    assert corpus.latest_version() == v_corpus_after_crash
    assert fps.last_committed_batch("ing") == 1
    n_fp = fps.read().count()
    # doc 10's fingerprints are queryable; doc 11 was an exact dup
    got = sorted(r["doc_id"] for r in corpus.read().collect())
    assert got == [1, 2, 10]

    # full replay after success: both tables skip, versions frozen
    r2 = corpus_ingest(corpus, fps, batch, txn=txn)
    assert r2["replayed"]
    assert corpus.latest_version() == v_corpus_after_crash
    assert fps.read().count() == n_fp

    # raw MERGE idempotency: re-merging the same fingerprint keys
    # changes nothing but the version counter
    fp_rows = sorted(
        (r["kind"], r["fp"]) for r in fps.read().collect()
    )
    fps.merge_upsert(
        fps.read().select("kind", "fp",
                          F.lit(1).cast("long").alias("ver"))
    )
    assert sorted(
        (r["kind"], r["fp"]) for r in fps.read().collect()
    ) == fp_rows


def test_streaming_sink_exactly_once(spark, tmp_path):
    corpus, fps = _tables(spark, tmp_path)
    land = str(tmp_path / "landing")
    spark.createDataFrame(_HIST, _SCHEMA).write.parquet(land)
    src = spark.readStream.schema(_SCHEMA).parquet(land)
    q = (
        src.writeStream.foreachBatch(
            corpus_ingest_sink(corpus, fps, "stream-ing")
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert corpus.read().count() == 2
    v = corpus.latest_version()
    # restart over the same checkpoint: no new batch, no new commit
    q2 = (
        spark.readStream.schema(_SCHEMA).parquet(land)
        .writeStream.foreachBatch(
            corpus_ingest_sink(corpus, fps, "stream-ing")
        )
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert corpus.latest_version() == v and corpus.read().count() == 2
