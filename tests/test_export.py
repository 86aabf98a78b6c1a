"""Sharded training-data export writer: layout, determinism, and
row conservation (`sources/export.py`)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.queries._util import load
from kafka_flink_harshevents_spark.sources.export import with_shard, write_training_shards

SF_DIR = "/root/testdata/sf0.001"
N_SHARDS = 4


def test_export_layout_and_conservation(spark, tmp_path: Path):
    d = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "corpus")
    write_training_shards(d, out, key="doc_id", n_shards=N_SHARDS, partition_cols=("lang",))

    langs = [r["lang"] for r in d.select("lang").distinct().collect()]
    shard_dirs = sorted(p for p in Path(out).glob("lang=*/shard=*") if p.is_dir())
    assert len(shard_dirs) <= len(langs) * N_SHARDS
    # exactly one data file per (lang, shard) directory — the
    # repartition-by-write-keys contract
    for sd in shard_dirs:
        files = [f for f in sd.iterdir() if f.name.endswith(".parquet")]
        assert len(files) == 1, f"{sd} has {len(files)} files"

    back = spark.read.parquet(out)
    assert back.count() == d.count()
    assert set(back.columns) == set(d.columns) | {"shard"}
    # partition pruning works on the layout: one lang reads one subtree
    one = back.filter(F.col("lang") == langs[0]).select("doc_id").count()
    want = d.filter(F.col("lang") == langs[0]).count()
    assert one == want


def test_shard_assignment_deterministic(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id")
    a = {r["doc_id"]: r["shard"] for r in with_shard(d, "doc_id", N_SHARDS).collect()}
    b = {
        r["doc_id"]: r["shard"]
        for r in with_shard(d.repartition(7), "doc_id", N_SHARDS).collect()
    }
    assert a == b  # stable under re-partitioning/retries
    assert set(a.values()) == set(range(N_SHARDS))  # all shards populated
