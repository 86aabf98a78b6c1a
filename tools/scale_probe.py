"""8× replication scale-up probe (the round-3/4 SCALING.md method,
packaged): replicate the fact tables with key offsets into a temp sf
dir (dims copied as-is; replica document texts word-salted so the
near-dup RATE stays constant), then time selected catalog entries at
1× and 8× and print the ratio table.

Usage: python tools/scale_probe.py [entry ...]
       (defaults to the round-5 touched entries)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kafka_flink_harshevents_spark.queries import all_queries  # noqa: E402
from kafka_flink_harshevents_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = 8
FACTS = {"events", "orders", "lineitem", "documents", "embeddings"}
DIMS = {"region", "nation", "customer", "supplier", "part"}
KEY_OFFSETS = {
    # table -> columns to offset by i * (1 + max over base)
    "events": ("event_id",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def build_8x(spark, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in sorted(FACTS | DIMS):
        src = spark.read.parquet(f"{BASE}/{t}.parquet")
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        if t in DIMS:
            src.write.mode("overwrite").parquet(dst)
            continue
        offs = {
            c: src.agg(F.max(c)).collect()[0][0] + 1
            for c in KEY_OFFSETS[t]
        }
        parts = []
        for i in range(REPL):
            r = src
            for c, m in offs.items():
                r = r.withColumn(c, F.col(c) + F.lit(i * m))
            if t == "documents" and i > 0:
                # word-salt replica texts: every word gets a replica
                # tag, so shingles/signatures never match ACROSS
                # replicas and the near-dup rate stays ∝ corpus
                r = r.withColumn(
                    "text",
                    F.regexp_replace("text", r"(\S+)", f"$1~{i}"),
                )
            parts.append(r)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(dst)


def best_of(fn, spark, sf, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn(spark, sf).collect()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    names = sys.argv[1:] or [
        "ev_rfm_segments",
        "doc_kn_logprob",
        "doc_bigram_logprob",
        "doc_source_kl_divergence",
        "doc_bm25_topk",
        "q_txlog_zorder_gate",
    ]
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    out = "/tmp/spark_graft_sf8x"
    build_8x(spark, out)
    qs = all_queries()
    print(f"{'entry':32s} {'1x':>7s} {'8x':>7s} {'ratio':>6s}")
    for n in names:
        w1 = best_of(qs[n], spark, BASE)
        w8 = best_of(qs[n], spark, out)
        print(f"{n:32s} {w1:7.2f} {w8:7.2f} {w8 / w1:6.2f}")


if __name__ == "__main__":
    main()
