"""Identity/row-tracking write-overhead probe: append the same frame to
three otherwise-identical txlog tables — plain, identity (1 col), and
row_tracking + identity (2 managed cols) — and report the append wall.

The allocation design adds, per write: one localCheckpoint of the
bucketed frame, ONE per-bucket count job (≤ n_buckets rows collected),
and a bucket-partitioned row_number window per managed column (same
partitioning the stage repartitions by). This probe pins that the
overhead is a small constant factor on the write path, not a scan- or
table-size term.

Usage: python tools/probe_identity_overhead.py [n_rows]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kafka_flink_harshevents_spark.session import get_spark  # noqa: E402
from kafka_flink_harshevents_spark.sources.txlog import TxTable  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="identity-overhead-probe")
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 7 % 1000).alias("v"),
            F.lit(1).cast("long").alias("ver"),
        )
        .localCheckpoint()  # pin the input so all three appends pay
        # identical generation cost
    )
    variants = {
        "plain": {},
        "identity": {"identity_cols": {"rid": {}}},
        "row_tracking+identity": {
            "identity_cols": {"rid": {}}, "row_tracking": True
        },
    }
    results = {}
    for name, kw in variants.items():
        d = tempfile.mkdtemp(prefix=f"idprobe-{name.split('+')[0]}-")
        t = TxTable.create(
            spark, d, key_cols=("k",), order_col="ver", n_buckets=16,
            **kw,
        )
        best = float("inf")
        for _ in range(3):
            shutil.rmtree(d)
            t = TxTable.create(
                spark, d, key_cols=("k",), order_col="ver",
                n_buckets=16, **kw,
            )
            t0 = time.perf_counter()
            t.append(df)
            best = min(best, time.perf_counter() - t0)
        results[name] = best
        shutil.rmtree(d, ignore_errors=True)
    base = results["plain"]
    print(f"{'variant':<24}{'append_s':>10}{'ratio':>8}   ({n} rows, min of 3)")
    for name, s in results.items():
        print(f"{name:<24}{s:>10.2f}{s / base:>8.2f}")


if __name__ == "__main__":
    main()
