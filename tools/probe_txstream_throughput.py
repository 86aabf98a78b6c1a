"""A/B throughput probe for the ``format("txlog")`` DataSource paths
(VERDICT r05 wrong-#3): the shipped Arrow-native read / vectorized
write against the retired per-row-Python implementations, on a ~1M-row
table. The old paths are reproduced VERBATIM inside this script (they
no longer exist in the library) and monkey-patched in, so both runs go
through the identical planning and Spark conversion machinery — the
delta is purely the per-row interpreter work this round removed.

Usage: python tools/probe_txstream_throughput.py [n_rows]
Prints one JSON line with read/write wall times for both variants.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kafka_flink_harshevents_spark.session import get_spark  # noqa: E402
from kafka_flink_harshevents_spark.sources import txstream  # noqa: E402
from kafka_flink_harshevents_spark.sources.txlog import (  # noqa: E402
    TxTable,
    bucket_of,
)


def _old_batch_read(self, partition):
    """The r05 per-row batch read (txstream.py:551-578 at d6ea743)."""
    import pyarrow.parquet as pq

    if partition is None:
        return iter(())
    table = pq.read_table(partition.path)
    if partition.dv:
        drop = set(partition.dv)
        table = table.take(
            [i for i in range(table.num_rows) if i not in drop]
        )
    names = set(table.column_names)
    n = table.num_rows
    cols = []
    for c in partition.columns:
        if c in names:
            cols.append(table.column(c).to_pylist())
        else:
            cols.append([None] * n)
    if partition.ctype is not None:
        if partition.ctype == txstream._CTYPE_FROM_FILE:
            cols.append(table.column(txstream.CHANGE_COL).to_pylist())
        else:
            cols.append([partition.ctype] * n)
    ver = [partition.version] * n
    return iter(zip(*cols, ver))


def _old_writer_bucketing(self, iterator):
    """The r05 per-row write bucketing (txstream.py:675-717 at d6ea743)."""
    import uuid
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_flink_harshevents_spark.sources.txlog import (
        _bloom_build,
        _file_stats,
    )

    batches = list(iterator)
    if not batches:
        return txstream._TxWriteMessage([])
    table = pa.Table.from_batches(batches)
    if "_bucket" in table.column_names:
        table = table.drop_columns(["_bucket"])
    if self.constraints:
        self._check_constraints_arrow(table)
    keys = [table.column(c).to_pylist() for c in self.key_cols]
    buckets = [bucket_of(vals, self.n_buckets) for vals in zip(*keys)]
    table = table.append_column("_bucket", pa.array(buckets, pa.int64()))
    entries = []
    for b in sorted(set(buckets)):
        idx = [i for i, x in enumerate(buckets) if x == b]
        sub = table.take(idx).sort_by(
            [(c, "ascending") for c in self.key_cols]
        )
        d = os.path.join(self.table_dir, self.staged, f"_pb={b}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(sub, path)
        rel = os.path.relpath(path, self.table_dir)
        entry = {"path": rel, "bucket": b, "stats": _file_stats(path)}
        blooms = {}
        for c in self.bloom_cols:
            if c in sub.column_names:
                bl = _bloom_build(sub.column(c).to_pylist())
                if bl is not None:
                    blooms[c] = bl
        if blooms:
            entry["bloom"] = blooms
        entries.append(entry)
    return txstream._TxWriteMessage(entries)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="txstream-probe")
    spark.dataSource.register(txstream.TxLogStreamSource)

    # 4 write tasks × 16 buckets → 64 files (~15k rows each): per-file
    # scheduling overhead stays small relative to per-row work, which
    # is what this probe isolates
    base = spark.range(0, n_rows).repartition(4).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).cast("int").alias("grp"),
        F.concat(F.lit("row-"), F.col("id").cast("string")).alias("tag"),
        (F.col("id") * 3).alias("v"),
        F.lit(1).cast("long").alias("ver"),
    ).cache()
    base.count()

    new_read = txstream.TxLogBatchReader.read
    new_write = txstream.TxLogBatchWriter.write

    def make_table(tag: str) -> TxTable:
        return TxTable.create(
            spark,
            tempfile.mkdtemp(prefix=f"probe-{tag}-"),
            key_cols=("k",),
            order_col="ver",
            n_buckets=16,
        )

    def timed_write() -> tuple[float, TxTable]:
        t = make_table("w")
        t0 = time.monotonic()
        (
            base.write.format("txlog")
            .option("tabledir", t.table_dir)
            .mode("append")
            .save()
        )
        return time.monotonic() - t0, t

    def timed_read(t: TxTable) -> float:
        t0 = time.monotonic()
        got = (
            spark.read.format("txlog")
            .option("tabledir", t.table_dir)
            .load()
            .agg(
                F.count("*").alias("n"),
                F.sum("v").alias("sv"),
                F.sum(F.length("tag")).alias("st"),
            )
            .collect()[0]
        )
        assert got["n"] == n_rows, got
        return time.monotonic() - t0

    def measure(tag: str) -> dict:
        # warm-up write+read (Python worker fork, Arrow init, plan
        # caches) before the min-of-3 measurements
        _, warm = timed_write()
        timed_read(warm)
        writes, tables = [], []
        for _ in range(3):
            s, t = timed_write()
            writes.append(s)
            tables.append(t)
        reads = [timed_read(tables[0]) for _ in range(3)]
        for t in [warm] + tables:
            shutil.rmtree(t.table_dir, ignore_errors=True)
        return {
            f"write_{tag}_s": min(writes),
            f"read_{tag}_s": min(reads),
        }

    out: dict = {"n_rows": n_rows, "files": 64}
    out.update(measure("new"))

    txstream.TxLogBatchReader.read = _old_batch_read
    txstream.TxLogBatchWriter.write = _old_writer_bucketing
    out.update(measure("old"))
    txstream.TxLogBatchReader.read = new_read
    txstream.TxLogBatchWriter.write = new_write

    out["read_speedup"] = round(out["read_old_s"] / out["read_new_s"], 2)
    out["write_speedup"] = round(
        out["write_old_s"] / out["write_new_s"], 2
    )

    # ---- single-thread kernel A/B -----------------------------------
    # local[32] wall time hides per-row interpreter cost behind
    # parallelism; at cluster scale the per-CORE cost is the bill. Time
    # exactly the task-side kernels that changed, one thread, one ~1M-
    # row file: bucket assignment (write side) and file→rows conversion
    # (read side, including the tuple→Arrow conversion the old path
    # forced on the Spark worker, reproduced here by rebuilding a
    # RecordBatch from the yielded tuples).
    import pyarrow as pa

    from kafka_flink_harshevents_spark.sources.txlog import bucket_batch

    tbl = base.coalesce(1).toArrow()
    t0 = time.monotonic()
    bucket_batch(tbl, ("k",), 16)
    out["kern_bucket_vec_s"] = time.monotonic() - t0
    t0 = time.monotonic()
    keys = [tbl.column("k").to_pylist()]
    [bucket_of(vals, 16) for vals in zip(*keys)]
    out["kern_bucket_row_s"] = time.monotonic() - t0

    t_k = make_table("kern")
    (
        base.coalesce(1).write.format("txlog")
        .option("tabledir", t_k.table_dir)
        .mode("append")
        .save()
    )
    import glob
    import os

    path = glob.glob(
        os.path.join(t_k.table_dir, "_staged-*", "*", "*.parquet")
    )[0]
    schema = txstream._table_schema(t_k.table_dir)
    cols = tuple(
        f.name for f in schema.fields if f.name != txstream.VERSION_COL
    )
    part = txstream._FilePartition(path, 2, cols)
    rd = txstream.TxLogBatchReader({"tabledir": t_k.table_dir}, schema)
    t0 = time.monotonic()
    n = sum(b.num_rows for b in new_read(rd, part))
    out["kern_read_vec_s"] = time.monotonic() - t0
    t0 = time.monotonic()
    rows = list(_old_batch_read(rd, part))
    pa.RecordBatch.from_arrays(  # the worker-side tuple→Arrow step
        [pa.array(list(c)) for c in zip(*rows)],
        names=list(cols) + [txstream.VERSION_COL],
    )
    out["kern_read_row_s"] = time.monotonic() - t0
    shutil.rmtree(t_k.table_dir, ignore_errors=True)
    # ratios from the RAW times (rounded wall values can be 0.0 at
    # small n_rows and would divide-by-zero), then round for display
    out["kern_bucket_speedup"] = round(
        out["kern_bucket_row_s"] / out["kern_bucket_vec_s"], 1
    )
    out["kern_read_speedup"] = round(
        out["kern_read_row_s"] / out["kern_read_vec_s"], 1
    )
    for k in list(out):
        if k.endswith("_s"):
            out[k] = round(out[k], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
