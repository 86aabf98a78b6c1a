"""Read-amplification probe for size-aware compaction (VERDICT r06
item 2 'done' criterion): build a many-small-files table, measure a
point-lookup/scan before and after ``compact(target_bytes=...)``, and
report file counts + read walls.

The interesting numbers are (a) live file count (every snapshot read
plans one InputPartition / scan split per file — at 100 TB the
many-small-files tax is planning AND open/footer overhead), and (b)
the wall of a full-table read before vs after.

Usage: python tools/probe_compact_binpack.py [n_appends] [rows_per]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from kafka_flink_harshevents_spark.session import get_spark  # noqa: E402
from kafka_flink_harshevents_spark.sources.txlog import TxTable  # noqa: E402


def main() -> None:
    n_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark(app_name="probe-binpack")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm

    t = TxTable.create(
        spark, tempfile.mkdtemp(prefix="binpack-"),
        key_cols=("k",), order_col="ver", n_buckets=4,
    )
    for i in range(n_appends):
        t.append(
            spark.range(i * rows_per, (i + 1) * rows_per)
            .selectExpr("id AS k", "id * 3 AS v", "CAST(1 AS LONG) AS ver")
        )

    def read_wall() -> float:
        t0 = time.perf_counter()
        t.read().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    _, live, _ = t._snapshot()
    files_before = len(live)
    # min-of-3: host stall windows inflate single runs
    before = min(read_wall() for _ in range(3))

    sizes = [int(e["bytes"]) for e in live]
    target = 16 * max(sizes) + 1  # pack ~16 fragments per bin
    t0 = time.perf_counter()
    t.compact(target_bytes=target)
    compact_wall = round(time.perf_counter() - t0, 3)

    _, live_after, _ = t._snapshot()
    after = min(read_wall() for _ in range(3))

    print(json.dumps({
        "n_appends": n_appends,
        "rows_per_append": rows_per,
        "files_before": files_before,
        "files_after": len(live_after),
        "read_wall_before_s": before,
        "read_wall_after_s": after,
        "compact_wall_s": compact_wall,
        "target_bytes": target,
    }))


if __name__ == "__main__":
    main()
