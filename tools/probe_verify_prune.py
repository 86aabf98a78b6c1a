"""Probe: verify-mode stored-text fetch — files opened ∝ candidates.

r10 verdict item 1: `corpus_ingest(near_dup_mode="verify")` used to
read the corpus's FULL text column per batch to feed the candidate
Jaccard join — an O(corpus) term per ingest batch. The fetch is now a
file-pruned `corpus.read(isin={"doc_id": candidates})` (min/max stats
+ per-file blooms), so the stored-text files opened must track the
CANDIDATE count, not the corpus size.

Method: attributed corpus + store seeded in W waves of unique-word
docs plus K collision targets (so the corpus spans many files but a
batch collides with exactly K stored docs); one fixed batch of K
near-dups + fresh filler is ingested at corpus sizes N and 8N. For
each run: files_total / files_read from `prune_report(isin=
{candidates})` and the min-of-3 `corpus_ingest` wall. Flat files_read
(and a wall ratio far below the corpus ratio) is the pass signal.

Usage: python tools/probe_verify_prune.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_flink_harshevents_spark.plans.ingest import (  # noqa: E402
    corpus_ingest,
    create_fingerprint_table,
)
from kafka_flink_harshevents_spark.session import get_spark  # noqa: E402
from kafka_flink_harshevents_spark.sources.txlog import TxTable  # noqa: E402
from kafka_flink_harshevents_spark.streaming.dedup import (  # noqa: E402
    doc_fingerprints,
)

K_TARGETS = 8      # stored docs the batch collides with
WAVES = 16         # append waves → files_total ≥ WAVES
BATCH_FRESH = 992  # fresh filler docs per batch


def _target_text(i: int) -> str:
    return " ".join(f"tgt{i}word{j}" for j in range(24))


def _filler(base: int, n: int, tag: str):
    return [
        (base + i, " ".join(f"{tag}d{i}w{j}" for j in range(16)), 1)
        for i in range(n)
    ]


def run(spark, n_corpus: int) -> dict:
    corpus = TxTable.create(
        spark, tempfile.mkdtemp(prefix="vp-c-"), key_cols=("doc_id",),
        order_col="ver", n_buckets=4, bloom_cols=("doc_id",),
    )
    fps = create_fingerprint_table(
        spark, tempfile.mkdtemp(prefix="vp-f-"), n_buckets=4,
        attributed=True,
    )
    per_wave = max(1, n_corpus // WAVES)
    next_id = 0
    for w in range(WAVES):
        rows = _filler(next_id, per_wave, f"w{w}")
        next_id += per_wave
        if w == 0:  # collision targets live in the first wave
            rows += [
                (10_000_000 + i, _target_text(i), 1)
                for i in range(K_TARGETS)
            ]
        df = spark.createDataFrame(rows, "doc_id long, text string, ver long")
        corpus.append(df)
        fps.append(
            doc_fingerprints(
                df.select("doc_id", "text").withColumn("is_seed", F.lit(0))
            )
            .select("kind", "fp", F.col("doc_id").alias("doc"))
            .distinct()
            .withColumn("ver", F.lit(1).cast("long"))
        )
    batch = spark.createDataFrame(
        [(20_000_000 + i, "zzz " + _target_text(i), 1) for i in range(K_TARGETS)]
        + _filler(30_000_000, BATCH_FRESH, "fresh"),
        "doc_id long, text string, ver long",
    ).localCheckpoint(eager=True)
    cands = [10_000_000 + i for i in range(K_TARGETS)]
    rep = corpus.prune_report({}, isin={"doc_id": cands})
    walls = []
    for trial in range(3):
        t0 = time.perf_counter()
        # fresh batch_id per trial: trial 1 keeps the filler, later
        # trials re-judge the SAME batch against the grown store
        # (filler → exact dups, near-dups re-verified) — identical
        # join/verify work, stable corpus size, min-of-3 comparable
        r = corpus_ingest(
            corpus, fps, batch, near_dup_mode="verify",
            txn={"app_id": "probe", "batch_id": trial + 1},
        )
        walls.append(time.perf_counter() - t0)
        assert r["near_dups_verified"] == K_TARGETS, r
    return {
        "corpus_docs": next_id + K_TARGETS,
        "candidates": K_TARGETS,
        "files_total": rep["files_total"],
        "files_read": rep["files_read"],
        "ingest_wall_s": round(min(walls), 3),
    }


if __name__ == "__main__":
    spark = get_spark(app_name="probe-verify-prune")
    for n in (2_000, 16_000):
        print(json.dumps(run(spark, n)))
