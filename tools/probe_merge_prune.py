"""Probe: merge write amplification ∝ files with matches, not table.

File-level merge pruning (`TxTable._merge_candidate_files`): within
the touched buckets, only files whose commit-log key [min, max] (and
bloom, when indexed) admit a source key are rewritten. The rewrite
count must therefore track the SOURCE's key locality — merging k keys
drawn from one append wave's range rewrites that wave's files — and
stay flat as the table grows by more waves.

Method: a table appended in W disjoint-key-range waves (n_buckets=4 →
4 files per wave); a fixed 8-key merge source drawn from wave 0's
range, applied at W and 8W waves. For each run: live files before,
files rewritten (= removed by the merge commit), and the min-of-3
`merge_into` wall. Flat rewrites (and a wall ratio far below the
table ratio) is the pass signal.

Usage: python tools/probe_merge_prune.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_flink_harshevents_spark.session import get_spark  # noqa: E402
from kafka_flink_harshevents_spark.sources.txlog import TxTable  # noqa: E402

WAVE_ROWS = 1000
N_BUCKETS = 4
K_SOURCE = 8


def run(spark, waves: int) -> dict:
    t = TxTable.create(
        spark,
        tempfile.mkdtemp(prefix="mergeprobe-"),
        key_cols=("k",),
        order_col="ver",
        n_buckets=N_BUCKETS,
    )
    for w in range(waves):
        base = w * WAVE_ROWS
        t.append(spark.createDataFrame(
            [(base + i, base + i, 1) for i in range(WAVE_ROWS)],
            "k long, v long, ver long",
        ))
    src = spark.createDataFrame(
        [(i * 100 + 3, -1, 2) for i in range(K_SOURCE)],
        "k long, v long, ver long",
    )  # 8 keys inside wave 0's [0, 1000) range
    walls, rewritten = [], None
    for _ in range(3):
        _, live_before, _ = t._snapshot()
        t0 = time.time()
        t.merge_into(src, when_matched="update", when_not_matched=None)
        walls.append(time.time() - t0)
        _, live_after, _ = t._snapshot()
        rewritten = len(
            {e["path"] for e in live_before}
            - {e["path"] for e in live_after}
        )
    return {
        "waves": waves,
        "files_live": len(live_before),
        "files_rewritten": rewritten,
        "merge_wall_s": round(min(walls), 3),
    }


def main() -> None:
    spark = get_spark(app_name="probe-merge-prune")
    for waves in (16, 128):
        print(json.dumps(run(spark, waves)))


if __name__ == "__main__":
    main()
